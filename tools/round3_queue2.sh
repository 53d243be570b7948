#!/bin/bash
# Round-3 follow-on TPU queue: waits for round3_queue.sh's marker, then
# runs the measurement batch (one TPU process at a time; ~10 min grant
# serialization between jobs is expected on this runtime).
cd /root/repo
while [ ! -f extended_runs/round3_queue_done.marker ]; do sleep 60; done
# 1. bench.py revalidation (fast profile now includes handrolled_bwd).
python bench.py > extended_runs/bench_r3_check2.log 2>&1
# 2. fused-attention v2 A/B (correctness on TPU + tile sweep).
python tools/ab_fa2.py > extended_runs/ab_fa2.log 2>&1
# 3. int8 serve A/B through the full socket path.
python tools/bench_serve.py 8 20 64        > extended_runs/bench_serve_fp.log 2>&1
python tools/bench_serve.py 8 20 64 --int8 > extended_runs/bench_serve_int8.log 2>&1
# 4. fast-profile quality check: 30 epochs, same protocol as the parity
#    "~0.0095 at 30 epochs" row (RESULTS.md) — quality-neutrality evidence
#    for bf16_frontend + bits_dropout + handrolled_bwd end-to-end.
mkdir -p extended_runs/fast30
(cd /tmp && python /root/repo/model.py --train --epochs 30 --profile fast \
    --output /root/repo/extended_runs/fast30 \
    --weights /root/repo/extended_runs/fast30/weights.npz) \
    > extended_runs/fast30.log 2>&1
echo done > extended_runs/round3_queue2_done.marker
