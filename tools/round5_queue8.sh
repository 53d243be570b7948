#!/bin/bash
# Round-5 queue 8: SECOND half-peak warm restart on Montserrat. The
# first (queue 6b) bought -12.0% (0.00804 -> 0.00707) — 2.7x FiraCode's
# margin — and the only second-restart point ever measured is FiraCode's
# QUARTER-peak (flat, +0.3%). SGDR-style repeated restarts at the SAME
# peak were never tried on either font; Montserrat's placement-bound
# residual (~0.0048 vs oracle 0.00225) says it has the most to gain.
# Inits from the committed artifacts (= the queue-6b endpoint), so a
# wipe cannot orphan it.
set -e
cd "$(dirname "$0")/.."

SRC=artifacts/montserrat
AFR_DUMP_AFTER=10800 \
python -m ai_font_renderer_tpu.cli train-placement --font montserrat \
  --samples 100000 --epochs 0 --line-head 5 \
  --structured --detach-structure \
  --init-from $SRC/placement_finetuned.npz \
  --siren-from $SRC/siren_finetuned.npz \
  --finetune-joint \
  --finetune-steps 12000 --finetune-samples 32768 \
  --finetune-schedule cosine --finetune-lr 2.5e-5 \
  --out extended_runs/placement_montserrat_cap2x_joint25b \
  > extended_runs/placement_montserrat_cap2x_joint25b.log 2>&1

touch extended_runs/round5_queue8_done.marker
