#!/bin/bash
# Round-4 queue 2: FiraCode placement-net capacity, 2x point (VERDICT r3 #2).
#
# Every campaign run so far used the flagship frontend dims (embed 32,
# hidden 64, heads 4); placement capacity is the one untried axis while
# FiraCode's e2e (0.00787) still sits ~2.7x above its engine-layout
# oracle (0.00292). This replays the PROVEN chain end to end at 2x dims
# (embed 64 / hidden 128 / heads 8; 8-dim heads preserved), identical
# budgets/seeds/schedules so the arm is comparable with the 1x lineage:
#   stage A: supervised 100 epochs cosine + 21000-step annealed pixel
#            fine-tune (1e-4 -> 0) over 32768 sheets   (= queue-20 protocol)
#   stage B: +12000 joint SIREN+placement steps (cosine 1e-4 -> 0) from
#            stage A's endpoints                        (= queue-21 protocol)
# The comparable 1x points: stage-A best 0.01413 (queue 20), stage-B
# 0.00845 (queue 21). The 4x point is queue 3 (time-permitting).
#
# TPU smoke of the CLI plumbing (capacity flags + joint chain) passed
# this round: extended_runs/cap_smoke_tpu.log.
set -e
cd "$(dirname "$0")/.."

E=64; H=128; NAME=cap2x
OUT=extended_runs/placement_firacode_${NAME}
# Stage A: supervised + annealed pixel fine-tune (queue-20 protocol).
python -m ai_font_renderer_tpu.cli train-placement --font firacode \
  --samples 100000 \
  --epochs 100 --schedule cosine --line-head 5 \
  --embed-dim $E --hidden-dim $H \
  --finetune-steps 21000 --finetune-samples 32768 \
  --finetune-schedule cosine \
  --out $OUT > ${OUT}.log 2>&1
# Stage B: joint continuation (queue-21 protocol).
python -m ai_font_renderer_tpu.cli train-placement --font firacode \
  --samples 100000 \
  --epochs 0 --line-head 5 \
  --init-from $OUT/placement_finetuned.npz --siren-from $OUT/siren.npz \
  --finetune-joint \
  --finetune-steps 12000 --finetune-samples 32768 \
  --finetune-schedule cosine \
  --out ${OUT}_joint > ${OUT}_joint.log 2>&1

touch extended_runs/round4_queue2_done.marker
