#!/bin/bash
# Round-5 queue 1: the VERDICT-r4 TPU ladder, one stage at a time.
#
#   0. TPU smoke of the NEW depth axis (--blocks 2) through the full
#      train-placement chain at toy budgets — plumbing gate before the
#      multi-hour stages bet on it.
#   1. Neural-render perf A/B (VERDICT r4 weak #1): exact vs bf16 vs
#      baked-bilinear compose from the committed FiraCode artifacts
#      (tools/bench_neural_render.py) — the headline capability's first
#      perf round since round 2's 44.6k glyphs/sec.
#   2+3. Montserrat 2x-capacity chain (VERDICT r4 #1, = round-4 queue 6,
#      never run): stage A supervised 150 epochs cosine + 21000-step
#      annealed pixel fine-tune, stage B +12000 joint steps — the
#      FiraCode-proven capacity protocol on the proportional font, whose
#      committed best (0.00916) sits 1.6x above its corrected kerned
#      oracle (0.00567).
#   4+5. FiraCode DEPTH point (VERDICT r4 #3): the queue-2 protocol at
#      2x dims with --blocks 2 (two attention blocks) — the last untried
#      architectural axis; width/restarts/objectives measured to a
#      ~0.0063 floor vs a 0.00293 oracle. Comparable arm: the depth-1
#      2x chain (A 0.01493, B 0.00658).
#
# Sequential: one TPU process at a time (CLAUDE.md discipline). Each
# stage leaves a marker so partial progress is adjudicable.
set -e
cd "$(dirname "$0")/.."
mkdir -p extended_runs

# ---- Stage 0: depth plumbing smoke on TPU (minutes) ----
python -m ai_font_renderer_tpu.cli train-placement --font firacode \
  --samples 2000 --epochs 2 --batch 256 --line-head 5 --blocks 2 \
  --embed-dim 64 --hidden-dim 128 \
  --e2e-steps 50 --finetune-steps 20 --finetune-samples 256 \
  --out extended_runs/depth_smoke_tpu \
  > extended_runs/depth_smoke_tpu.log 2>&1
touch extended_runs/round5_stage0_done.marker

# ---- Stage 1: neural-render perf A/B (minutes) ----
python tools/bench_neural_render.py --font firacode \
  > extended_runs/bench_neural_render_r5.jsonl 2> extended_runs/bench_neural_render_r5.err
touch extended_runs/round5_stage1_done.marker

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

touch extended_runs/round5_queue1_done.marker
