"""Unit tests for the profiler-trace attribution helpers (tools/trace_step.py).

The busy/idle attribution in RESULTS.md ("The last 2.7 ms") rests on
`_union_ms` computing the union of possibly-nested/overlapping XLA-op
intervals correctly — a wrong union would misreport device idle time.
Pure-function tests, no device.
"""

import importlib.util
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
_spec = importlib.util.spec_from_file_location(
    "trace_step",
    os.path.join(os.path.dirname(__file__), "..", "tools", "trace_step.py"),
)
trace_step = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(trace_step)
_union_ms = trace_step._union_ms


def test_union_disjoint():
    busy, span = _union_ms([(0.0, 1000.0), (2000.0, 3000.0)])
    assert busy == 2.0  # us -> ms
    assert span == 3.0


def test_union_nested_and_overlapping():
    # A parent op fully containing children (nested trace events) must
    # count the parent's extent once, not sum the children on top.
    busy, span = _union_ms([(0.0, 10_000.0), (1000.0, 2000.0), (9000.0, 12_000.0)])
    assert busy == 12.0
    assert span == 12.0


def test_union_unsorted_input():
    busy, span = _union_ms([(5000.0, 6000.0), (0.0, 1000.0), (500.0, 1500.0)])
    assert busy == 2.5
    assert span == 6.0


def test_union_matches_brute_force():
    rng = np.random.default_rng(0)
    starts = rng.uniform(0, 10_000, size=200)
    durs = rng.uniform(1, 500, size=200)
    intervals = [(float(s), float(s + d)) for s, d in zip(starts, durs)]
    busy, span = _union_ms(list(intervals))
    # Brute-force on a fine grid.
    lo = min(a for a, _ in intervals)
    hi = max(b for _, b in intervals)
    grid = np.linspace(lo, hi, 2_000_001)
    covered = np.zeros(grid.shape, bool)
    for a, b in intervals:
        covered |= (grid >= a) & (grid < b)
    approx_busy = covered.mean() * (hi - lo) / 1e3
    assert abs(busy - approx_busy) < 0.05  # ms
    assert abs(span - (hi - lo) / 1e3) < 1e-9
