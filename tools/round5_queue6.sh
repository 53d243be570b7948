#!/bin/bash
# Round-5 queue 6: Montserrat half-peak warm restart — the last step of
# the FiraCode-proven capacity protocol (round 4 queue 1: +12k joint
# steps at half-peak cosine 2.5e-5 -> 0 bought -4.5% on top of the 2x
# joint). Restarts from the Montserrat 2x joint endpoints (round-5
# queue 5 stage 3); dims are embedded in the checkpoints.
#
# Waits for queue 5's done marker so only one TPU process runs at a time
# (CLAUDE.md discipline). AFR_DUMP_AFTER is a 3 h wall deadline: if the
# run wedges on a stale device grant past that, dump stacks and die
# instead of hanging silently.
set -e
cd "$(dirname "$0")/.."

while [ ! -f extended_runs/round5_queue5_done.marker ]; do sleep 60; done

SRC=extended_runs/placement_montserrat_cap2x_joint
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
