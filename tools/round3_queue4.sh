#!/bin/bash
# Round-3 queue 4: learned-placement training (models/placement.py) on the
# real TPU, after queue3. Montserrat is the headline case (proportional
# advances = prefix-sum structure); FiraCode is the monospace control.
cd /root/repo
while [ ! -f extended_runs/round3_queue3_done.marker ]; do sleep 60; done
python tools/train_placement.py --font montserrat --samples 50000 --epochs 30 \
    > extended_runs/placement_montserrat.log 2>&1
python tools/train_placement.py --font firacode --samples 50000 --epochs 30 \
    > extended_runs/placement_firacode.log 2>&1
echo done > extended_runs/round3_queue4_done.marker
