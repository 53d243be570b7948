#!/bin/bash
# Round-4 queue 1: second FiraCode joint warm restart, quarter peak.
#
# Queue 23's half-peak restart (5e-5) converted a plateau into -6.8%
# (0.00845 -> 0.00787) and its own tail had annealed to 0 — the same
# argument applies one more time at half the previous peak (2.5e-5
# cosine -> 0, 12000 steps, same joint protocol). This is the cheap
# proven lever; the capacity sweep (VERDICT #2's untried axis) runs
# separately as queue 2.
#
# Init comes from the COMMITTED artifacts (artifacts/firacode/*.npz ==
# the joint23 finetuned pair): the machine restart between rounds wiped
# every untracked npz again, and the committed artifact set is exactly
# the durability mechanism VERDICT r3 #1 asked for. Runs through the
# product surface (afr train-placement), not the tools shim.
set -e
cd "$(dirname "$0")/.."

AF=artifacts/firacode
python -m ai_font_renderer_tpu.cli train-placement --font firacode \
  --samples 100000 --epochs 0 --line-head 5 \
  --init-from $AF/placement_finetuned.npz --siren-from $AF/siren_finetuned.npz \
  --finetune-joint \
  --finetune-steps 12000 --finetune-samples 32768 \
  --finetune-schedule cosine --finetune-lr 2.5e-5 \
  --out extended_runs/placement_firacode_joint24 \
  > extended_runs/placement_firacode_joint24.log 2>&1

touch extended_runs/round4_queue1_done.marker
