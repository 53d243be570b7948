#!/bin/bash
# Round-4 queue 1: FiraCode half-peak warm restart (VERDICT r3 #2, the
# "deeper joint budget" axis) — joint25: +12000 joint SIREN+placement
# steps at half-peak cosine (2.5e-5 -> 0), the queue-23 protocol that
# converted the 1x plateau into -6.8%.
#
# Re-pointed mid-round at the NEW standing best: the 2x-capacity chain
# (queue 2, extended_runs/placement_firacode_cap2x_joint) landed e2e
# 0.006583 — beating both the 1x equal-budget joint (0.00845) and the
# warm-restarted 1x best (0.00787). This restarts from the cap2x joint
# endpoints (embed 64 / hidden 128 / heads 8; dims are embedded in the
# checkpoints, so no capacity flags needed).
set -e
cd "$(dirname "$0")/.."

SRC=extended_runs/placement_firacode_cap2x_joint
python -m ai_font_renderer_tpu.cli train-placement --font firacode \
  --samples 100000 --epochs 0 --line-head 5 \
  --init-from $SRC/placement_finetuned.npz --siren-from $SRC/siren_finetuned.npz \
  --finetune-joint \
  --finetune-steps 12000 --finetune-samples 32768 \
  --finetune-schedule cosine --finetune-lr 2.5e-5 \
  --out extended_runs/placement_firacode_cap2x_joint25 \
  > extended_runs/placement_firacode_cap2x_joint25.log 2>&1

touch extended_runs/round4_queue1_done.marker
