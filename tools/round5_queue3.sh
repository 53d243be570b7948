#!/bin/bash
# Round-5 queue 2: resume of queue 1 (whose wrapper was intentionally
# stopped after the baked-bilinear TPU NEGATIVE landed, to insert the
# phase-binned fast path — see RESULTS.md round-5 neural-render section).
#
#   1b. Phased-bake A/B on TPU (compose_phased take/onehot at P=8/16,
#       plus re-run of exact + learned pipeline in the same process).
#   2+3. Montserrat 2x-capacity chain (VERDICT r4 #1).
#   4+5. FiraCode depth-2 chain (VERDICT r4 #3).
# Stage bodies are identical to round5_queue1.sh stages 2-5.
set -e
cd "$(dirname "$0")/.."


# ---- Stage 1b: phased-bake neural-render A/B (minutes) ----
python tools/bench_neural_render.py --font firacode \
  > extended_runs/bench_neural_render_r5c.jsonl 2> extended_runs/bench_neural_render_r5c.err
touch extended_runs/round5_stage1c_done.marker

# ---- Stage 2: Montserrat 2x stage A (supervised + pixel ft) ----
E=64; H=128
OUT=extended_runs/placement_montserrat_cap2x
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

touch extended_runs/round5_queue3_done.marker
