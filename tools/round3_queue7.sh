#!/bin/bash
# Round-3 queue 7: fused-attention sweep with the 100 MB vmem_limit_bytes
# unlock (fwd<=64 / bwd<=32 tiles now compile) + eval-mode serving A/B.
cd /root/repo
while [ ! -f extended_runs/round3_queue6_done.marker ]; do sleep 60; done
python tools/ab_fa2.py > extended_runs/ab_fa2.log 2>&1
echo done > extended_runs/round3_queue7_done.marker
