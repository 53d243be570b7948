"""Profiler-trace attribution of the fast+handrolled train step (VERDICT r3 #5).

The round-3 roofline table (RESULTS.md) leaves ~2.7 ms of the 13.96 ms
fast+handrolled step attributed-but-unproven: component sums say ~11.3 ms,
and the question is whether the residual is genuine memory stall *inside*
ops (long op durations vs rooflines) or scheduling slack *between* ops
(device idle gaps). A `jax.profiler.trace` answers this directly: the TPU
device plane's per-op events give busy time, per-op self time, and the gap
structure within a step.

Usage: python tools/trace_step.py [profile ...]   (default: fast_handrolled)
Writes the raw trace under extended_runs/trace_<profile>/ and prints a
JSON summary per profile: steps/sec from the timed scan, device busy ms
per step, idle ms per step, and the top ops by self time.

The traced window is `train_epoch` — the train-only scan, the SAME jit
bench.py times — so every per-step number divides a window that contains
exactly STEPS train steps (an earlier version traced train_eval_epoch,
which appends a 2-batch eval scan; that charged eval device time to the
train steps). The summary also re-measures the wall amortization pair
(20 vs 117 steps, trace off) in-process, replacing the ad-hoc
`longepoch_r4.log` measurement.

Parsing: the trace-viewer JSON (`*.trace.json.gz`) jax.profiler writes
alongside the xplane.pb — no tensorboard UI or TF protos needed (this
image's tensorflow lacks `tensorflow.core.profiler.protobuf`).
"""

from __future__ import annotations

import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import glob
import json
import sys
import time

import jax
import jax.numpy as jnp

from ai_font_renderer_tpu.config import ModelConfig, TrainConfig
from ai_font_renderer_tpu.train.step import init_state, train_epoch

from ab_profiles import PROFILES

STEPS = 20
LONG_STEPS = 117  # the production epoch length (bench.py's train section)


def run_profile(name: str) -> dict:
    mcfg, tcfg = PROFILES[name]
    b = tcfg.batch_size
    key = jax.random.PRNGKey(0)
    n = 4 * b
    codes = jax.random.randint(key, (n, mcfg.max_length), 65, 91, jnp.int32)
    targets = jax.random.randint(
        key, (n, mcfg.sheet_height, mcfg.sheet_width), 0, 256, jnp.int32
    ).astype(jnp.uint8)
    lr = jnp.float32(1e-3)
    skey = jax.random.key(1, impl=tcfg.prng_impl)

    def epoch(st, steps, i):
        bi = jnp.arange(steps * b, dtype=jnp.int32).reshape(steps, b) % n
        return train_epoch(
            st, codes, targets, bi, lr, jax.random.fold_in(skey, i), mcfg, tcfg
        )

    st = init_state(jax.random.PRNGKey(0), mcfg, tcfg)
    st, tl = epoch(st, STEPS, 0)
    float(tl)  # compile + warm

    logdir = f"extended_runs/trace_{name}"
    t0 = time.perf_counter()
    with jax.profiler.trace(logdir):
        st, tl = epoch(st, STEPS, 1)
        float(tl)
    wall = time.perf_counter() - t0

    # Amortization pair, trace off: same jit at the microbench length and
    # the production epoch length (the per-epoch dispatch + scalar-fetch
    # cost through the remote tunnel divides by the step count).
    walls = {}
    for steps in (STEPS, LONG_STEPS):
        st, tl = epoch(st, steps, 2)  # compile the long shape
        float(tl)
        t0 = time.perf_counter()
        st, tl = epoch(st, steps, 3)
        float(tl)
        walls[steps] = round(1e3 * (time.perf_counter() - t0) / steps, 2)

    return {
        "profile": name,
        "logdir": logdir,
        "wall_ms_per_step_traced": round(1e3 * wall / STEPS, 2),
        "wall_ms_per_step": {f"steps={k}": v for k, v in walls.items()},
        **summarize_xspace(logdir),
    }


def _union_ms(intervals: list[tuple[float, float]]) -> tuple[float, float]:
    """(busy, span) in ms from possibly-nested [start_us, end_us) intervals."""
    intervals.sort()
    busy = 0.0
    cur0, cur1 = intervals[0]
    hi = intervals[0][1]
    for a, b in intervals[1:]:
        hi = max(hi, b)
        if a > cur1:
            busy += cur1 - cur0
            cur0, cur1 = a, b
        else:
            cur1 = max(cur1, b)
    busy += cur1 - cur0
    return busy / 1e3, (hi - intervals[0][0]) / 1e3


def summarize_xspace(logdir: str) -> dict:
    import gzip

    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        return {"trace": "NO trace.json.gz produced (profiler unsupported here?)"}
    with gzip.open(sorted(paths)[-1]) as f:
        events = json.load(f)["traceEvents"]

    procs: dict[int, str] = {}
    threads: dict[tuple, str] = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            procs[e["pid"]] = e["args"].get("name", "")
        elif e.get("ph") == "M" and e.get("name") == "thread_name":
            threads[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    out: dict = {"processes": list(procs.values())}
    for pid, pname in procs.items():
        if "TPU" not in pname and "device" not in pname.lower():
            continue
        if "host" in pname.lower() or "CPU" in pname:
            continue
        # Busy/idle from the XLA Ops line (nested events union correctly);
        # per-op totals for the top-op table.
        intervals: list[tuple[float, float]] = []
        per_op: dict[str, float] = {}
        n = 0
        for e in events:
            if e.get("ph") != "X" or e["pid"] != pid:
                continue
            if threads.get((pid, e.get("tid"))) != "XLA Ops":
                continue
            n += 1
            intervals.append((e["ts"], e["ts"] + e["dur"]))
            per_op[e["name"]] = per_op.get(e["name"], 0.0) + e["dur"]
        if not intervals:
            continue
        busy_ms, span_ms = _union_ms(intervals)
        top = sorted(per_op.items(), key=lambda kv: -kv[1])[:15]
        out[pname] = {
            "events": n,
            "span_ms": round(span_ms, 2),
            "busy_ms": round(busy_ms, 2),
            "idle_ms": round(span_ms - busy_ms, 2),
            "busy_ms_per_step": round(busy_ms / STEPS, 3),
            "idle_ms_per_step": round((span_ms - busy_ms) / STEPS, 3),
            "top_ops_ms_total": {k: round(v / 1e3, 3) for k, v in top},
        }
    return out


def main() -> None:
    names = sys.argv[1:] or ["fast_handrolled"]
    for nm in names:
        print(json.dumps(run_profile(nm)))


if __name__ == "__main__":
    main()
