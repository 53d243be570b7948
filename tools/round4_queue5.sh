#!/bin/bash
# Round-4 queue 5: FiraCode half-peak warm restart on the 4x-capacity
# lineage (joint27) — the queue-23/queue-1 protocol applied to the
# queue-3 endpoints. Run ONLY if queue 3's joint stage beat the 2x
# standing best (0.00629); the restart has converted on every lineage
# whose joint stage was still improving at budget end (-6.8% on 1x,
# -4.5% on 2x).
set -e
cd "$(dirname "$0")/.."

SRC=extended_runs/placement_firacode_cap4x_joint
python -m ai_font_renderer_tpu.cli train-placement --font firacode \
  --samples 100000 --epochs 0 --line-head 5 \
  --init-from $SRC/placement_finetuned.npz --siren-from $SRC/siren_finetuned.npz \
  --finetune-joint \
  --finetune-steps 12000 --finetune-samples 32768 \
  --finetune-schedule cosine --finetune-lr 2.5e-5 \
  --out extended_runs/placement_firacode_cap4x_joint27 \
  > extended_runs/placement_firacode_cap4x_joint27.log 2>&1

touch extended_runs/round4_queue5_done.marker
