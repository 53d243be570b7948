#!/bin/bash
# Round-5 flagship reconverge: the FOURTH machine wipe (mid-round-5, after
# the queue-7 launch) took the gitignored font_renderer.npz again. Same
# recovery as rounds 3/4: the parity-defaults recipe is proven to land at
# val 0.005157 with early stop at epoch 737 across three machine
# lifetimes (~24 min on one chip). Chains behind queue 6b so only one
# TPU process runs at a time.
set -e
cd "$(dirname "$0")/.."

while [ ! -f extended_runs/round5_queue6_done.marker ]; do sleep 60; done

AFR_DUMP_AFTER=3600 \
python model.py --train --output extended_runs/flagship_reconverge_r5 \
  > extended_runs/flagship_reconverge_r5.log 2>&1
test -f font_renderer.npz

touch extended_runs/round5_reconverge_done.marker
