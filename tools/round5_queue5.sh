#!/bin/bash
# Round-5 queue 5: clean relaunch after the machine wipe at ~02:14 killed
# the single-flighted leader (queue 4's chain). All npz checkpoints in the
# run dirs were lost (gitignored); extended_runs/placement_montserrat_cap2x
# had only metrics.jsonl (pre-wipe supervised+ft progress followed by a
# relaunched stage-A that died at epoch 24). That file is preserved as
# placement_montserrat_cap2x.prewipe.metrics.jsonl before the fresh start.
#
# Stages (bodies identical to round5_queue3.sh):
#   2. Montserrat 2x stage A (supervised + pixel ft)  — VERDICT r4 #1
#   3. Montserrat 2x stage B (+12k joint)
#   4. FiraCode depth-2 stage A (--blocks 2, sup + ft) — VERDICT r4 #3
#   5. FiraCode depth-2 stage B (+12k joint)
#
# One TPU process at a time (CLAUDE.md discipline). PID of this wrapper in
# /tmp/round5_queue5.pid; each python child runs in the foreground of this
# wrapper so killing the wrapper's current child by explicit PID is enough.
set -e
cd "$(dirname "$0")/.."

E=64; H=128
OUT=extended_runs/placement_montserrat_cap2x

if [ -f $OUT/metrics.jsonl ] && [ ! -f ${OUT}.prewipe.metrics.jsonl ]; then
  mv $OUT/metrics.jsonl ${OUT}.prewipe.metrics.jsonl
fi

# ---- Stage 2: Montserrat 2x stage A (supervised + pixel ft) ----
python -m ai_font_renderer_tpu.cli train-placement --font montserrat \
  --samples 100000 \
  --epochs 150 --schedule cosine --line-head 5 \
  --structured --detach-structure \
  --embed-dim $E --hidden-dim $H \
  --finetune-steps 21000 --finetune-samples 32768 \
  --finetune-schedule cosine \
  --ft-checkpoint-every 3000 \
  --out $OUT > ${OUT}.log 2>&1
touch extended_runs/round5_stage2_done.marker

# ---- Stage 3: Montserrat 2x stage B (+12k joint) ----
python -m ai_font_renderer_tpu.cli train-placement --font montserrat \
  --samples 100000 \
  --epochs 0 --line-head 5 \
  --structured --detach-structure \
  --init-from $OUT/placement_finetuned.npz --siren-from $OUT/siren.npz \
  --finetune-joint \
  --finetune-steps 12000 --finetune-samples 32768 \
  --finetune-schedule cosine \
  --ft-checkpoint-every 3000 \
  --out ${OUT}_joint > ${OUT}_joint.log 2>&1
touch extended_runs/round5_stage3_done.marker

# ---- Stage 4: FiraCode depth-2 stage A (queue-2 protocol + --blocks 2) ----
DOUT=extended_runs/placement_firacode_depth2
python -m ai_font_renderer_tpu.cli train-placement --font firacode \
  --samples 100000 \
  --epochs 100 --schedule cosine --line-head 5 \
  --embed-dim $E --hidden-dim $H --blocks 2 \
  --finetune-steps 21000 --finetune-samples 32768 \
  --finetune-schedule cosine \
  --ft-checkpoint-every 3000 \
  --out $DOUT > ${DOUT}.log 2>&1
touch extended_runs/round5_stage4_done.marker

# ---- Stage 5: FiraCode depth-2 stage B (+12k joint) ----
python -m ai_font_renderer_tpu.cli train-placement --font firacode \
  --samples 100000 \
  --epochs 0 --line-head 5 \
  --init-from $DOUT/placement_finetuned.npz --siren-from $DOUT/siren.npz \
  --finetune-joint \
  --finetune-steps 12000 --finetune-samples 32768 \
  --finetune-schedule cosine \
  --ft-checkpoint-every 3000 \
  --out ${DOUT}_joint > ${DOUT}_joint.log 2>&1
touch extended_runs/round5_stage5_done.marker

touch extended_runs/round5_queue5_done.marker
