"""Profiling helpers: jax.profiler traces + blocked timers.

The reference has no profiling at all (SURVEY §5). These wrap jax.profiler
for capturing device traces viewable in TensorBoard/Perfetto, plus an
honest wall-clock timer that forces completion via a scalar fetch (device
queues are async; naive timing measures dispatch, not execution).
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: `with trace('/tmp/trace'): run()`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, iters: int = 10, warmup: int = 2) -> float:
    """Seconds per call, forcing execution with a scalar reduction fetch."""
    for _ in range(warmup):
        out = fn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters


def _force(out):
    leaves = jax.tree_util.tree_leaves(out)
    if leaves:
        # A scalar fetch is the only completion barrier that every backend
        # honors (block_until_ready can be advisory on remote runtimes).
        float(jnp.asarray(leaves[0]).ravel()[0])


def device_memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them."""
    stats = {}
    for d in jax.devices():
        try:
            stats[str(d)] = d.memory_stats()
        except Exception:
            stats[str(d)] = None
    return stats
