#!/bin/bash
# Round-3 queue 9: serving batch sweep (is batch 1024 the right headline
# shape?) + a bench.py sanity pass. Waits for queue 8 (line-head
# placement runs) — one TPU process at a time.
cd /root/repo
while [ ! -f extended_runs/round3_queue8_done.marker ]; do sleep 60; done
python tools/bench_batch_sweep.py > extended_runs/batch_sweep.log 2>&1
python bench.py > extended_runs/bench_sanity_r3.log 2>&1
echo done > extended_runs/round3_queue9_done.marker
