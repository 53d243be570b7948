#!/bin/bash
# Round-3 queue 23: FiraCode joint fine-tune warm-restart continuation.
#
# Queue 21's joint run plateaued under its 1e-4 cosine anneal at e2e
# 0.00845, but FiraCode's engine-layout oracle is 0.00334 — placement
# (and now the co-adapting bank) still owns a 0.005 residual, so the
# budget question deserves one more measured point. Warm restart from
# the queue-21 joint endpoints at HALF peak (5e-5 cosine -> 0,
# --finetune-lr): a full-height restart would re-inject the noise the
# first anneal removed. Montserrat is skipped: its joint run already
# beats its oracle, so no headroom argument exists.
set -e
cd "$(dirname "$0")/.."

FC=extended_runs/placement_firacode_joint21
python tools/train_placement.py --font firacode --samples 100000 \
  --epochs 0 --line-head 5 \
  --init-from $FC/placement_finetuned.npz --siren-from $FC/siren_finetuned.npz \
  --finetune-joint \
  --finetune-steps 12000 --finetune-samples 32768 \
  --finetune-schedule cosine --finetune-lr 5e-5 \
  --out extended_runs/placement_firacode_joint23 \
  > extended_runs/placement_firacode_joint23.log 2>&1

touch extended_runs/round3_queue23_done.marker
