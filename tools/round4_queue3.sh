#!/bin/bash
# Round-4 queue 3: FiraCode placement-net capacity, 4x point (stretch).
# Same protocol as queue 2 (see that header); embed 128 / hidden 256 /
# heads 16. Run only if the round's wall budget allows after queue 2.
set -e
cd "$(dirname "$0")/.."

E=128; H=256; NAME=cap4x
OUT=extended_runs/placement_firacode_${NAME}
python -m ai_font_renderer_tpu.cli train-placement --font firacode \
  --samples 100000 \
  --epochs 100 --schedule cosine --line-head 5 \
  --embed-dim $E --hidden-dim $H \
  --finetune-steps 21000 --finetune-samples 32768 \
  --finetune-schedule cosine \
  --out $OUT > ${OUT}.log 2>&1
python -m ai_font_renderer_tpu.cli train-placement --font firacode \
  --samples 100000 \
  --epochs 0 --line-head 5 \
  --init-from $OUT/placement_finetuned.npz --siren-from $OUT/siren.npz \
  --finetune-joint \
  --finetune-steps 12000 --finetune-samples 32768 \
  --finetune-schedule cosine \
  --out ${OUT}_joint > ${OUT}_joint.log 2>&1

touch extended_runs/round4_queue3_done.marker
