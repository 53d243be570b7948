#!/bin/bash
# Round-3 queue 22: session-restart recovery chain.
#
# The machine restart wiped every gitignored npz checkpoint. This wrapper
# restores the product state and finishes the queued campaign in one
# serial TPU chain (one TPU process at a time, per CLAUDE.md):
#   1. flagship reconverge — `model.py --train` with parity defaults
#      (plateau + early stop @~737 epochs, ~24 min) regenerates the
#      shipped font_renderer.npz so bench/render/serve/eval run on
#      converged weights again (RESULTS.md pins val 0.005157);
#   2. queue 20 — rebuild both placement campaigns (supervised best
#      protocol + 21000-step annealed pixel fine-tune, both fonts);
#   3. queue 21 — the joint SIREN+placement pixel fine-tune A/B from the
#      queue-20 endpoints (its own marker-wait is a no-op by then).
set -e
cd "$(dirname "$0")/.."

python model.py --train --output extended_runs/flagship_reconverge_r3b \
  > extended_runs/flagship_reconverge_r3b.log 2>&1
test -f font_renderer.npz
touch extended_runs/round3_queue22_flagship_done.marker

bash tools/round3_queue20.sh
bash tools/round3_queue21.sh
