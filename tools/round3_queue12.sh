#!/bin/bash
# Round-3 queue 12: boundary-boost A/B on the detached structured head.
#
# Hypothesis (RESULTS.md "Monotone (Viterbi) break decode"): the residual
# ~2% break errors — the pinned val-worst — live in near-boundary wrap
# decisions. --boundary-boost 3 --boundary-margin 6 oversamples strings
# with a line extent within 6 px of the usable width (~18-21% of the
# corpus, so the epoch grows ~1.4x); epochs are scaled DOWN (100->71,
# 150->107) so total samples-seen matches the struct_det baselines and
# the sampling distribution is the only variable.
#
# Run serially (one TPU process at a time); poll metrics.jsonl, not stdout.
set -e
cd "$(dirname "$0")/.."

python tools/train_placement.py --font firacode --samples 100000 \
  --epochs 71 --schedule cosine --line-head 5 --structured \
  --detach-structure --boundary-boost 3 --boundary-margin 6 \
  --out extended_runs/placement_firacode_struct_det_bb \
  > extended_runs/placement_firacode_struct_det_bb.log 2>&1

python tools/train_placement.py --font montserrat --samples 100000 \
  --epochs 107 --schedule cosine --line-head 5 --structured \
  --detach-structure --boundary-boost 3 --boundary-margin 6 \
  --out extended_runs/placement_montserrat_struct_det_bb \
  > extended_runs/placement_montserrat_struct_det_bb.log 2>&1

python tools/eval_decode_modes.py \
  extended_runs/placement_firacode_struct_det_bb \
  extended_runs/placement_montserrat_struct_det_bb \
  > extended_runs/eval_decode_modes_bb.jsonl 2>/dev/null

python tools/ab_hard_decode.py \
  extended_runs/placement_firacode_struct_det_bb \
  extended_runs/placement_montserrat_struct_det_bb \
  2>/dev/null | grep '^{' > extended_runs/ab_hard_decode_bb.jsonl

touch extended_runs/round3_queue12_done.marker
