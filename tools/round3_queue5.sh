#!/bin/bash
# Round-3 queue 5: reruns after queue4 — the fixed fa2 tile sweep (the
# first attempt crashed on the 16 MB VMEM cap at fwd tile 64) and the
# serving-tier isolation A/B (is bf16-frontend ever a win in eval mode?).
cd /root/repo
while [ ! -f extended_runs/round3_queue4_done.marker ]; do sleep 60; done
python tools/ab_fa2.py > extended_runs/ab_fa2.log 2>&1
python tools/ab_serving_tiers.py > extended_runs/ab_serving_tiers.log 2>&1
echo done > extended_runs/round3_queue5_done.marker
