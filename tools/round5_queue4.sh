#!/bin/bash
# Round-5 queue 4: single-flight continuation after the triple-launch
# cleanup (see RESULTS.md round-5 notes). Three bit-identical Montserrat
# cap2x stage-A processes were found racing on one output dir (orphans of
# queue 1/2 wrappers + queue 3's child); the two laggards and the queue-3
# wrapper were killed by explicit PID, keeping the leader (pid in
# /tmp/round5_stage2_leader.pid) at fine-tune step 13000/21000. This
# script waits for that leader to exit, then chains the remaining stages:
#
#   3. Montserrat 2x stage B (+12k joint)       — VERDICT r4 #1
#   4. FiraCode depth-2 stage A (sup + pixel ft) — VERDICT r4 #3
#   5. FiraCode depth-2 stage B (+12k joint)
#
# One TPU process at a time (CLAUDE.md discipline).
set -e
cd "$(dirname "$0")/.."

LEADER=$(cat /tmp/round5_stage2_leader.pid)
while kill -0 "$LEADER" 2>/dev/null; do sleep 30; done
touch extended_runs/round5_stage2_done.marker

E=64; H=128
OUT=extended_runs/placement_montserrat_cap2x

# Guard: stage 3 needs the leader's final artifacts.
test -f $OUT/placement_finetuned.npz

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

touch extended_runs/round5_queue4_done.marker
