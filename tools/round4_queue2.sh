#!/bin/bash
# Round-4 queue 2: FiraCode placement-net capacity sweep (VERDICT r3 #2).
#
# Every campaign run so far used the flagship frontend dims (embed 32,
# hidden 64, heads 4); placement capacity is the one untried axis while
# FiraCode's e2e (0.00787) still sits ~2.7x above its engine-layout
# oracle (0.00292). Two capacity points, each replaying the PROVEN chain
# end to end (queue-20 rebuild + queue-21 joint continuation, identical
# budgets/seeds/schedules so the arms are comparable with the baseline
# lineage):
#   stage A: supervised 100 epochs cosine + 21000-step annealed pixel
#            fine-tune (1e-4 -> 0) over 32768 sheets
#   stage B: +12000 joint SIREN+placement steps (cosine 1e-4 -> 0) from
#            stage A's endpoints
# Points: 2x (embed 64 / hidden 128 / heads 8) and 4x (embed 128 /
# hidden 256 / heads 16); 8-dim heads preserved.
#
# Runs through the NEW product surface (afr train-placement) — the tiny
# TPU smoke up front proves the CLI plumbing (incl. capacity flags +
# joint chain) before committing hours.
set -e
cd "$(dirname "$0")/.."

# Serialize behind queue 1 (one TPU process at a time).
while [ ! -f extended_runs/round4_queue1_done.marker ]; do sleep 60; done

afr() { python -m ai_font_renderer_tpu.cli "$@"; }

# TPU smoke (~3 min): capacity flags + supervised + joint chain.
afr train-placement --font firacode --samples 2000 --epochs 1 \
  --line-head 5 --embed-dim 64 --hidden-dim 128 --e2e-steps 200 \
  --finetune-joint --finetune-steps 8 --finetune-samples 128 \
  --out extended_runs/cap_smoke_tpu \
  > extended_runs/cap_smoke_tpu.log 2>&1
test -f extended_runs/cap_smoke_tpu/siren_finetuned.npz

for CAP in "64 128 cap2x" "128 256 cap4x"; do
  set -- $CAP
  E=$1; H=$2; NAME=$3
  OUT=extended_runs/placement_firacode_${NAME}
  # Stage A: supervised + annealed pixel fine-tune (queue-20 protocol).
  afr train-placement --font firacode --samples 100000 \
    --epochs 100 --schedule cosine --line-head 5 \
    --embed-dim $E --hidden-dim $H \
    --finetune-steps 21000 --finetune-samples 32768 \
    --finetune-schedule cosine \
    --out $OUT > ${OUT}.log 2>&1
  # Stage B: joint continuation (queue-21 protocol).
  afr train-placement --font firacode --samples 100000 \
    --epochs 0 --line-head 5 \
    --init-from $OUT/placement_finetuned.npz --siren-from $OUT/siren.npz \
    --finetune-joint \
    --finetune-steps 12000 --finetune-samples 32768 \
    --finetune-schedule cosine \
    --out ${OUT}_joint > ${OUT}_joint.log 2>&1
done

touch extended_runs/round4_queue2_done.marker
