#!/bin/bash
# Round-4 queue 4: FiraCode quarter-peak warm restart (joint26) — the
# third point in the restart-conversion series on the 2x-capacity
# lineage. Half-peak restarts converted -6.8% (1x, queue 23) then -4.5%
# (2x, queue 1/joint25); this +8000-step quarter-peak (1.25e-5) restart
# from the joint25 endpoints either improves the 0.00629 standing best
# again or, if ~flat, completes the diminishing-returns evidence that
# the 2x chain is at its architecture floor (VERDICT r3 #2's "measured
# negative establishing the floor"). Budget trimmed to 8000 steps so the
# run clears the round's wall budget.
set -e
cd "$(dirname "$0")/.."

SRC=extended_runs/placement_firacode_cap2x_joint25
python -m ai_font_renderer_tpu.cli train-placement --font firacode \
  --samples 100000 --epochs 0 --line-head 5 \
  --init-from $SRC/placement_finetuned.npz --siren-from $SRC/siren_finetuned.npz \
  --finetune-joint \
  --finetune-steps 8000 --finetune-samples 32768 \
  --finetune-schedule cosine --finetune-lr 1.25e-5 \
  --out extended_runs/placement_firacode_cap2x_joint26 \
  > extended_runs/placement_firacode_cap2x_joint26.log 2>&1

touch extended_runs/round4_queue4_done.marker
