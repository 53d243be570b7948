#!/bin/bash
# Round-3 queue 11: detached-structure A/B at the 3x budget, both fonts.
# Waits for queue 10 (coupled structured runs) — one TPU process at a time.
cd /root/repo
while [ ! -f extended_runs/round3_queue10_done.marker ]; do sleep 60; done
python tools/train_placement.py --font montserrat --samples 100000 \
  --epochs 150 --schedule cosine --line-head 5 --structured --detach-structure \
  --out extended_runs/placement_montserrat_struct_det \
  > extended_runs/placement_montserrat_struct_det.log 2>&1
python tools/train_placement.py --font firacode --samples 100000 \
  --epochs 100 --schedule cosine --line-head 5 --structured --detach-structure \
  --out extended_runs/placement_firacode_struct_det \
  > extended_runs/placement_firacode_struct_det.log 2>&1
echo done > extended_runs/round3_queue11_done.marker
