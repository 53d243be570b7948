#!/bin/bash
# Round-3 queue 18: continue the pixel fine-tune past queue 17.
#
# Queue 17's FiraCode fine-tune loss was still descending at step 3000
# (0.0414 -> 0.0285) when it set the new best (0.02022 e2e). Continue
# BOTH fonts from the queue-17 fine-tuned checkpoints with 6000 more
# steps over a 2x corpus (16384 sheets) — budget is the hypothesis,
# Adam state restarts (the one uncontrolled variable, noted in the
# writeup). Bests to beat: FiraCode 0.02022, Montserrat 0.02681.
set -e
cd "$(dirname "$0")/.."

python tools/train_placement.py --font firacode --samples 100000 \
  --epochs 0 --line-head 5 \
  --init-from extended_runs/placement_firacode_lines_ftx/placement_finetuned.npz \
  --finetune-steps 6000 --finetune-samples 16384 \
  --out extended_runs/placement_firacode_lines_ftx2 \
  > extended_runs/placement_firacode_lines_ftx2.log 2>&1

python tools/train_placement.py --font montserrat --samples 100000 \
  --epochs 0 --line-head 5 --structured --detach-structure \
  --init-from extended_runs/placement_montserrat_struct_det_ftx/placement_finetuned.npz \
  --finetune-steps 6000 --finetune-samples 16384 \
  --out extended_runs/placement_montserrat_struct_det_ftx2 \
  > extended_runs/placement_montserrat_struct_det_ftx2.log 2>&1

python tools/ab_hard_decode.py \
  extended_runs/placement_firacode_lines_ftx2 \
  extended_runs/placement_montserrat_struct_det_ftx2 \
  2>/dev/null | grep '^{' > extended_runs/ab_hard_decode_ftx2.jsonl

touch extended_runs/round3_queue18_done.marker
