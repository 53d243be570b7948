#!/bin/bash
# Round-3 queue 19: third pixel fine-tune continuation, annealed.
#
# Queues 17/18 cut e2e render MSE 38%/30% and both trajectories were
# still descending at step 9000 at constant LR. Continue from the
# queue-18 checkpoints with 12000 steps over a 2x corpus (32768
# sheets) and a cosine anneal to 0 so the final checkpoint is a
# converged point, not a bounce. Bests to beat: FiraCode 0.01500,
# Montserrat 0.02018.
set -e
cd "$(dirname "$0")/.."

python tools/train_placement.py --font firacode --samples 100000 \
  --epochs 0 --line-head 5 \
  --init-from extended_runs/placement_firacode_lines_ftx2/placement_finetuned.npz \
  --finetune-steps 12000 --finetune-samples 32768 --finetune-schedule cosine \
  --out extended_runs/placement_firacode_lines_ftx3 \
  > extended_runs/placement_firacode_lines_ftx3.log 2>&1

python tools/train_placement.py --font montserrat --samples 100000 \
  --epochs 0 --line-head 5 --structured --detach-structure \
  --init-from extended_runs/placement_montserrat_struct_det_ftx2/placement_finetuned.npz \
  --finetune-steps 12000 --finetune-samples 32768 --finetune-schedule cosine \
  --out extended_runs/placement_montserrat_struct_det_ftx3 \
  > extended_runs/placement_montserrat_struct_det_ftx3.log 2>&1

touch extended_runs/round3_queue19_done.marker
