#!/bin/bash
# Round-3 queue 13: kerning-aware break-margin boost, Montserrat only.
#
# Queue 12's extent-based boost was a measured negative on the
# proportional font (RESULTS.md "Boundary-case oversampling"): kerned
# prefix sums make line extents diffuse, so extent-vs-width selects the
# wrong strings. --boundary-mode break instead flags strings where some
# wrap DECISION was within the margin of flipping (min over the engine's
# greedy accept/reject walk of |measure(candidate) - usable_width|).
# Montserrat at margin 2 px: a sharp 12.3% of strings (Jaccard 0.45 vs
# the extent set). FiraCode is skipped by diagnostic: monospace decision
# margins quantize to multiples of the 7.38 px advance (0% of strings
# under 2 px, then a 39% cliff at 4) — no graded hardness to mine, and
# the extent boost already won there.
#
# Equal samples-seen vs the struct_det baseline (150 epochs x 80k):
# hard 12.3% x boost 3 inflates the epoch ~1.246x -> 120 epochs.
set -e
cd "$(dirname "$0")/.."

python tools/train_placement.py --font montserrat --samples 100000 \
  --epochs 120 --schedule cosine --line-head 5 --structured \
  --detach-structure --boundary-boost 3 --boundary-margin 2 \
  --boundary-mode break \
  --out extended_runs/placement_montserrat_struct_det_bmargin \
  > extended_runs/placement_montserrat_struct_det_bmargin.log 2>&1

python tools/eval_decode_modes.py \
  extended_runs/placement_montserrat_struct_det_bmargin \
  > extended_runs/eval_decode_modes_bmargin.jsonl 2>/dev/null

python tools/ab_hard_decode.py \
  extended_runs/placement_montserrat_struct_det_bmargin \
  2>/dev/null | grep '^{' > extended_runs/ab_hard_decode_bmargin.jsonl

touch extended_runs/round3_queue13_done.marker
