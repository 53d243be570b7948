#!/bin/bash
# Round-5 queue 7: FiraCode bank-transplant restart. The depth-2 joint
# produced the campaign's best FiraCode bank (tuned kerned oracle
# 0.00203 vs the standing pair's 0.00293) but its placement net is a
# generalization negative (RESULTS.md "Depth ... closes as a negative").
# Zero-shot, the transplanted bank under the standing-best depth-1
# placement net measures WORSE (0.006836 vs 0.006264 on CPU): the pair
# co-adapts. This run tests whether a half-peak joint restart
# re-co-adapts the transplant into a win: init from the standing-best
# placement (artifacts/), bank from the depth-2 joint, +12k joint steps
# at half-peak cosine (the round-4 queue-1 protocol).
#
# Waits for queue 6 (one TPU process at a time).
set -e
cd "$(dirname "$0")/.."

while [ ! -f extended_runs/round5_queue6_done.marker ]; do sleep 60; done

AFR_DUMP_AFTER=10800 \
python -m ai_font_renderer_tpu.cli train-placement --font firacode \
  --samples 100000 --epochs 0 --line-head 5 \
  --init-from artifacts/firacode/placement_finetuned.npz \
  --siren-from extended_runs/placement_firacode_depth2_joint/siren_finetuned.npz \
  --finetune-joint \
  --finetune-steps 12000 --finetune-samples 32768 \
  --finetune-schedule cosine --finetune-lr 2.5e-5 \
  --out extended_runs/placement_firacode_banktx \
  > extended_runs/placement_firacode_banktx.log 2>&1

touch extended_runs/round5_queue7_done.marker
