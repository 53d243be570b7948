#!/bin/bash
# Round-3 queue 6: longer learned-placement budget (RESULTS.md: position
# RMSE still falling steeply at the 30-epoch cap on both fonts) — 100k
# samples, cosine schedule, 150/100 epochs. Waits for the fa2 A/B to
# release the TPU.
cd /root/repo
while kill -0 "$(cat /tmp/fa2.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
python tools/train_placement.py --font montserrat --samples 100000 \
    --epochs 150 --schedule cosine \
    --out extended_runs/placement_montserrat_long \
    > extended_runs/placement_montserrat_long.log 2>&1
python tools/train_placement.py --font firacode --samples 100000 \
    --epochs 100 --schedule cosine \
    --out extended_runs/placement_firacode_long \
    > extended_runs/placement_firacode_long.log 2>&1
echo done > extended_runs/round3_queue6_done.marker
