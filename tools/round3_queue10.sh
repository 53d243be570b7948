#!/bin/bash
# Round-3 queue 10: structured-head placement runs at the 3x budget,
# both fonts. Protocol matches the _long and _lines runs exactly (100k
# samples, cosine schedule, montserrat 150 / firacode 100 epochs) so the
# head is the only variable: --line-head 5 --structured (x derived from
# the predicted break structure, models/placement.py structured_x).
cd /root/repo
python tools/train_placement.py --font montserrat --samples 100000 \
  --epochs 150 --schedule cosine --line-head 5 --structured \
  --out extended_runs/placement_montserrat_struct \
  > extended_runs/placement_montserrat_struct.log 2>&1
python tools/train_placement.py --font firacode --samples 100000 \
  --epochs 100 --schedule cosine --line-head 5 --structured \
  --out extended_runs/placement_firacode_struct \
  > extended_runs/placement_firacode_struct.log 2>&1
echo done > extended_runs/round3_queue10_done.marker
