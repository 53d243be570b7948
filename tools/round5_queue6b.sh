#!/bin/bash
# Round-5 queue 6b: relaunch of queue 6 (Montserrat half-peak warm
# restart) after the fourth machine wipe took the untracked
# placement_montserrat_cap2x_joint npz endpoints mid-run. The committed
# artifacts/montserrat pair IS that joint endpoint (promoted in ff985ac,
# TPU e2e 0.00804 = the run's last metrics row), so the restart inits
# from the artifacts instead — same weights, now wipe-proof.
#
# Protocol: +12k joint steps at half-peak cosine 2.5e-5 -> 0 (the
# round-4 queue-1 step that bought -4.5% on FiraCode's 2x chain).
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
  --out extended_runs/placement_montserrat_cap2x_joint25 \
  > extended_runs/placement_montserrat_cap2x_joint25.log 2>&1

touch extended_runs/round5_queue6_done.marker
