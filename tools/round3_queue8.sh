#!/bin/bash
# Round-3 queue 8: line-classification placement head at the long-run
# budget (3x the round-3 baseline), both fonts. Protocol matches the
# placement_{font}_long runs exactly (100k samples, cosine schedule,
# montserrat 150 / firacode 100 epochs) so the only variable is the
# head: --line-head 5 (the 80 px sheet holds 5 baselines at 14.4 px).
cd /root/repo
python tools/train_placement.py --font montserrat --samples 100000 \
  --epochs 150 --schedule cosine --line-head 5 \
  --out extended_runs/placement_montserrat_lines \
  > extended_runs/placement_montserrat_lines.log 2>&1
python tools/train_placement.py --font firacode --samples 100000 \
  --epochs 100 --schedule cosine --line-head 5 \
  --out extended_runs/placement_firacode_lines \
  > extended_runs/placement_firacode_lines.log 2>&1
echo done > extended_runs/round3_queue8_done.marker
