#!/bin/bash
# Round-3 queue 16: learned loss balance (uncertainty weighting), both
# fonts, each on its best head config.
#
# Queues 12-15 measured out break-error EMPHASIS in all four forms and
# located the real constraint: gradient competition among x-MSE /
# line CE / visibility BCE on the shared trunk (RESULTS.md). This run
# tests the canonical fix — Kendall-style homoscedastic uncertainty
# weighting (one learned log-variance per term, sum(exp(-s)L + s),
# s=0 start reproduces the fixed weights). Uniform sampling, protocols
# byte-identical to the struct_det / lines baselines; the learned
# balance is the only variable.
set -e
cd "$(dirname "$0")/.."

python tools/train_placement.py --font montserrat --samples 100000 \
  --epochs 150 --schedule cosine --line-head 5 --structured \
  --detach-structure --uncertainty-weights \
  --out extended_runs/placement_montserrat_struct_det_uw \
  > extended_runs/placement_montserrat_struct_det_uw.log 2>&1

python tools/train_placement.py --font firacode --samples 100000 \
  --epochs 100 --schedule cosine --line-head 5 --uncertainty-weights \
  --out extended_runs/placement_firacode_lines_uw \
  > extended_runs/placement_firacode_lines_uw.log 2>&1

python tools/eval_decode_modes.py \
  extended_runs/placement_montserrat_struct_det_uw \
  extended_runs/placement_firacode_lines_uw \
  > extended_runs/eval_decode_modes_uw.jsonl 2>/dev/null

python tools/ab_hard_decode.py \
  extended_runs/placement_montserrat_struct_det_uw \
  extended_runs/placement_firacode_lines_uw \
  2>/dev/null | grep '^{' > extended_runs/ab_hard_decode_uw.jsonl

touch extended_runs/round3_queue16_done.marker
