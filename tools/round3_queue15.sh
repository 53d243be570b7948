#!/bin/bash
# Round-3 queue 15: break-error-weighted line CE, FiraCode (line head).
#
# Companion to queue 14. Diagnostic on the trained FiraCode struct_det
# baseline shows the same error concentration as Montserrat: slots whose
# wrap decision was within 8 px of flipping are 4.6% of contributing
# slots but carry 44% of line errors (16x lift; monospace margins
# quantize to the 7.38 px advance so thr 4 and 8 select the same set).
# The A/B target is FiraCode's BEST config — the plain line head
# (RESULTS.md: e2e 0.02415 with hard decode) — same protocol as
# placement_firacode_lines (100k samples, 100 epochs, cosine), the CE
# weights the only variable.
set -e
cd "$(dirname "$0")/.."

python tools/train_placement.py --font firacode --samples 100000 \
  --epochs 100 --schedule cosine --line-head 5 \
  --break-ce-boost 8 --boundary-margin 8 \
  --out extended_runs/placement_firacode_lines_cew \
  > extended_runs/placement_firacode_lines_cew.log 2>&1

python tools/eval_decode_modes.py \
  extended_runs/placement_firacode_lines_cew \
  > extended_runs/eval_decode_modes_cew_fc.jsonl 2>/dev/null

python tools/ab_hard_decode.py \
  extended_runs/placement_firacode_lines_cew \
  2>/dev/null | grep '^{' > extended_runs/ab_hard_decode_cew_fc.jsonl

touch extended_runs/round3_queue15_done.marker
