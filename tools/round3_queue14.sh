#!/bin/bash
# Round-3 queue 14: break-error-weighted line CE, Montserrat.
#
# Queues 12-13 measured out SAMPLING-side boundary emphasis on the
# proportional font (any oversampling trades average-case line accuracy
# for boundary emphasis and loses, RESULTS.md). This is the loss-side
# form: per-slot CE weight 1+8 on slots whose own wrap decision was
# within 8 px of flipping. Calibration measured on the trained uniform
# baseline (commit "Break-error-weighted line CE"): those slots are
# 5.7% of contributing slots but carry 47% of all line errors (15x
# error-rate lift); at boost 8 they receive ~35% of the CE mass.
# Uniform sampling, 150 epochs — byte-identical budget and data
# distribution to the struct_det baseline; the loss weights are the
# only variable.
set -e
cd "$(dirname "$0")/.."

python tools/train_placement.py --font montserrat --samples 100000 \
  --epochs 150 --schedule cosine --line-head 5 --structured \
  --detach-structure --break-ce-boost 8 --boundary-margin 8 \
  --out extended_runs/placement_montserrat_struct_det_cew \
  > extended_runs/placement_montserrat_struct_det_cew.log 2>&1

python tools/eval_decode_modes.py \
  extended_runs/placement_montserrat_struct_det_cew \
  > extended_runs/eval_decode_modes_cew.jsonl 2>/dev/null

python tools/ab_hard_decode.py \
  extended_runs/placement_montserrat_struct_det_cew \
  2>/dev/null | grep '^{' > extended_runs/ab_hard_decode_cew.jsonl

touch extended_runs/round3_queue14_done.marker
