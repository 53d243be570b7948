#!/bin/bash
# Round-3 queue 17: scale the pixel objective (RESULTS.md queue-16
# conclusion: the supervised objective family is pixel-saturated; the
# fine-tune is the only stage optimizing what the metric measures, and
# it ran at toy scale — 200 steps over 256 sheets).
#
# Pure fine-tune A/B from the STANDING-BEST supervised checkpoints
# (--init-from + --epochs 0, so the supervised phase is byte-identical
# to the baselines by construction): 15x the steps (3000), 32x the
# corpus (8192 train sheets). Baselines to beat: Montserrat 0.02901,
# FiraCode 0.02415 (e2e render MSE, best decode).
set -e
cd "$(dirname "$0")/.."

python tools/train_placement.py --font montserrat --samples 100000 \
  --epochs 0 --line-head 5 --structured --detach-structure \
  --init-from extended_runs/placement_montserrat_struct_det/placement.npz \
  --finetune-steps 3000 --finetune-samples 8192 \
  --out extended_runs/placement_montserrat_struct_det_ftx \
  > extended_runs/placement_montserrat_struct_det_ftx.log 2>&1

python tools/train_placement.py --font firacode --samples 100000 \
  --epochs 0 --line-head 5 \
  --init-from extended_runs/placement_firacode_lines/placement.npz \
  --finetune-steps 3000 --finetune-samples 8192 \
  --out extended_runs/placement_firacode_lines_ftx \
  > extended_runs/placement_firacode_lines_ftx.log 2>&1

python tools/ab_hard_decode.py \
  extended_runs/placement_montserrat_struct_det_ftx \
  extended_runs/placement_firacode_lines_ftx \
  2>/dev/null | grep '^{' > extended_runs/ab_hard_decode_ftx.jsonl

touch extended_runs/round3_queue17_done.marker
