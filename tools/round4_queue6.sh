#!/bin/bash
# Round-4 queue 6: Montserrat placement-net capacity, 2x point.
#
# The capacity finding (queue 2: 2x dims are worse against a frozen
# bank but convert under joint tuning, -22% on FiraCode) is so far
# FiraCode-only. Montserrat's 1x joint best (0.00916, queue 21) already
# beats its ORIGINAL engine-layout oracle (0.01687), but joint tuning
# also improved the bank itself — so the 1x number is not known to be
# a floor. This replays the proven stage-A + stage-B chain at 2x dims
# (embed 64 / hidden 128 / heads 8) on the proportional font, identical
# budgets/seeds/schedules to its 1x lineage (queues 20-21). Montserrat
# uses the detached structured-x head (the measured winner for
# proportional fonts, RESULTS.md "structured-x head").
set -e
cd "$(dirname "$0")/.."

E=64; H=128; NAME=cap2x
OUT=extended_runs/placement_montserrat_${NAME}
# Stage A: supervised 150 epochs cosine + annealed pixel fine-tune
# (queue-20 Montserrat protocol, proportional-font head settings).
python -m ai_font_renderer_tpu.cli train-placement --font montserrat \
  --samples 100000 \
  --epochs 150 --schedule cosine --line-head 5 \
  --structured --detach-structure \
  --embed-dim $E --hidden-dim $H \
  --finetune-steps 21000 --finetune-samples 32768 \
  --finetune-schedule cosine \
  --out $OUT > ${OUT}.log 2>&1
# Stage B: joint continuation (queue-21 protocol).
python -m ai_font_renderer_tpu.cli train-placement --font montserrat \
  --samples 100000 \
  --epochs 0 --line-head 5 \
  --init-from $OUT/placement_finetuned.npz --siren-from $OUT/siren.npz \
  --finetune-joint \
  --finetune-steps 12000 --finetune-samples 32768 \
  --finetune-schedule cosine \
  --out ${OUT}_joint > ${OUT}_joint.log 2>&1

touch extended_runs/round4_queue6_done.marker
