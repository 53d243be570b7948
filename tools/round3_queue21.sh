#!/bin/bash
# Round-3 queue 21: joint SIREN+placement pixel fine-tune — the last
# ROADMAP item of the placement campaign ("joint SIREN+placement pixel
# training").
#
# Equal-budget A/B from the queue-20 endpoint checkpoints (both arms
# continue placement_finetuned.npz with 12000 cosine-annealed steps over
# 32768 sheets; both arms load the SAME SIREN bank via --siren-from so
# the only difference is whether the bank's params receive pixel
# gradients):
#   control arm: placement-only continuation (the queue-19 protocol)
#   joint arm:   --finetune-joint — sheet MSE differentiates through
#                compose() into the glyph fields too, so glyph shapes can
#                absorb residuals placement cannot (e.g. sub-pixel phase
#                the bank baked in at its own anchoring).
#
# Waits for queue-20's done marker so the chain survives session
# restarts. Bests to beat are queue-20's e2e rows (logged in its
# metrics.jsonl; the queue-18 era bests were FiraCode 0.01500,
# Montserrat 0.02018).
set -e
cd "$(dirname "$0")/.."

while [ ! -f extended_runs/round3_queue20_done.marker ]; do sleep 60; done

FC=extended_runs/placement_firacode_lines_r3b
MS=extended_runs/placement_montserrat_struct_det_r3b

# Tiny TPU smoke of the joint plumbing first (~3 min): exercises
# --finetune-joint + --siren-from end-to-end (tuple tunable, tuned-bank
# save, sp_eval wiring) before committing hours to the full arms.
python tools/train_placement.py --font firacode --samples 2000 \
  --epochs 1 --line-head 5 --e2e-steps 200 \
  --siren-from $FC/siren.npz --finetune-joint \
  --finetune-steps 8 --finetune-samples 128 \
  --out extended_runs/joint_smoke_tpu \
  > extended_runs/joint_smoke_tpu.log 2>&1
test -f extended_runs/joint_smoke_tpu/siren_finetuned.npz

# Control arms first: they reproduce the known protocol, so if anything
# in the new joint path misbehaves the cheap half has already banked.
python tools/train_placement.py --font firacode --samples 100000 \
  --epochs 0 --line-head 5 \
  --init-from $FC/placement_finetuned.npz --siren-from $FC/siren.npz \
  --finetune-steps 12000 --finetune-samples 32768 --finetune-schedule cosine \
  --out extended_runs/placement_firacode_ctl21 \
  > extended_runs/placement_firacode_ctl21.log 2>&1

python tools/train_placement.py --font firacode --samples 100000 \
  --epochs 0 --line-head 5 \
  --init-from $FC/placement_finetuned.npz --siren-from $FC/siren.npz \
  --finetune-joint \
  --finetune-steps 12000 --finetune-samples 32768 --finetune-schedule cosine \
  --out extended_runs/placement_firacode_joint21 \
  > extended_runs/placement_firacode_joint21.log 2>&1

python tools/train_placement.py --font montserrat --samples 100000 \
  --epochs 0 --line-head 5 --structured --detach-structure \
  --init-from $MS/placement_finetuned.npz --siren-from $MS/siren.npz \
  --finetune-steps 12000 --finetune-samples 32768 --finetune-schedule cosine \
  --out extended_runs/placement_montserrat_ctl21 \
  > extended_runs/placement_montserrat_ctl21.log 2>&1

python tools/train_placement.py --font montserrat --samples 100000 \
  --epochs 0 --line-head 5 --structured --detach-structure \
  --init-from $MS/placement_finetuned.npz --siren-from $MS/siren.npz \
  --finetune-joint \
  --finetune-steps 12000 --finetune-samples 32768 --finetune-schedule cosine \
  --out extended_runs/placement_montserrat_joint21 \
  > extended_runs/placement_montserrat_joint21.log 2>&1

touch extended_runs/round3_queue21_done.marker
