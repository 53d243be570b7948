#!/bin/bash
# Round-5 queue 9: SECOND half-peak warm restart on FiraCode. Its first
# half-peak bought -4.5% (0.00658 -> 0.00629, round 4 queue 1) and the
# QUARTER-peak follow-up was flat (+0.3%, round 4 queue 4) — but a
# second restart at the SAME half-peak lr was never measured, and
# Montserrat's queue-6b result shows the restart family keeps paying
# where placement owns the residual (FiraCode placement still owns
# ~0.0034 vs its 0.00293 oracle). Inits from the committed artifacts
# (= the round-4 queue-1 endpoint). Chains behind queue 8.
set -e
cd "$(dirname "$0")/.."

while [ ! -f extended_runs/round5_queue8_done.marker ]; do sleep 60; done

SRC=artifacts/firacode
AFR_DUMP_AFTER=10800 \
python -m ai_font_renderer_tpu.cli train-placement --font firacode \
  --samples 100000 --epochs 0 --line-head 5 \
  --init-from $SRC/placement_finetuned.npz \
  --siren-from $SRC/siren_finetuned.npz \
  --finetune-joint \
  --finetune-steps 12000 --finetune-samples 32768 \
  --finetune-schedule cosine --finetune-lr 2.5e-5 \
  --out extended_runs/placement_firacode_joint25b \
  > extended_runs/placement_firacode_joint25b.log 2>&1

touch extended_runs/round5_queue9_done.marker
