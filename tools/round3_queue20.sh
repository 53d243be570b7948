#!/bin/bash
# Round-3 queue 20: rebuild the pixel fine-tune campaign from scratch.
#
# The machine restart wiped every npz checkpoint (extended_runs/**/*.npz
# is gitignored), so queue 19's --init-from chain can't run as written.
# Rebuild each font in ONE invocation: the standing-best supervised
# protocol (queue 8 / queue 11 flags, byte-identical corpus + seeds)
# followed immediately by a single annealed pixel fine-tune at the full
# cumulative budget of queues 17+18+19 — 21000 steps over 32768 sheets,
# cosine 1e-4 -> 0 — instead of replaying the 3000/6000/12000 constant-LR
# chain. Bests to beat (queue-18 measured): FiraCode 0.01500,
# Montserrat 0.02018 e2e render MSE.
set -e
cd "$(dirname "$0")/.."

python tools/train_placement.py --font firacode --samples 100000 \
  --epochs 100 --schedule cosine --line-head 5 \
  --finetune-steps 21000 --finetune-samples 32768 --finetune-schedule cosine \
  --out extended_runs/placement_firacode_lines_r3b \
  > extended_runs/placement_firacode_lines_r3b.log 2>&1

python tools/train_placement.py --font montserrat --samples 100000 \
  --epochs 150 --schedule cosine --line-head 5 --structured --detach-structure \
  --finetune-steps 21000 --finetune-samples 32768 --finetune-schedule cosine \
  --out extended_runs/placement_montserrat_struct_det_r3b \
  > extended_runs/placement_montserrat_struct_det_r3b.log 2>&1

touch extended_runs/round3_queue20_done.marker
