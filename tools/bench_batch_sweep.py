"""Serving-throughput batch sweep: is batch 1024 the right headline shape?

bench.py's atlas headline pins batch=1024 (the train-time batch). Serving
has no such constraint — the batch axis is free, and if any part of the
eval forward is launch- or bandwidth-bound rather than MXU-bound, larger
batches amortize it. This sweeps the full-precision parity path and the
int8x int8 path across batch sizes with the same chained-dependency
timing discipline as bench.py (each iteration's codes derive from the
previous output; final scalar fetch).

Prints one JSON line per (mode, batch) with ms/batch and glyphs/sec.
"""

from __future__ import annotations

import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import jax
import jax.numpy as jnp

from ai_font_renderer_tpu.config import ModelConfig
from ai_font_renderer_tpu.models import font_renderer
from ai_font_renderer_tpu.ops.quantized import apply_quantized_int8, quantize_params


def chain_time(fn, params, codes, iters=30, rounds=3):
    out, nxt = fn(params, codes)
    jax.block_until_ready((out, nxt))
    best = float("inf")
    for _ in range(rounds):
        t0 = time.perf_counter()
        c = codes
        for _ in range(iters):
            out, c = fn(params, c)
        float(out.mean())
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main() -> None:
    mcfg = ModelConfig()
    params = font_renderer.init(jax.random.PRNGKey(0), mcfg)
    served = quantize_params(params)

    def make_chain(apply_fn):
        @jax.jit
        def f(p, c):
            out = apply_fn(p, c)
            delta = (out[:, :1, : mcfg.max_length] * 7).astype(jnp.int32)
            return out, (c + delta.reshape(c.shape)) % 26 + 65

        return f

    full = make_chain(lambda p, c: font_renderer.apply(p, c, mcfg, train=False))
    q8 = make_chain(lambda p, c: apply_quantized_int8(p, c, mcfg))

    for batch in (256, 512, 1024, 2048, 4096, 8192):
        codes = jax.random.randint(
            jax.random.PRNGKey(1), (batch, mcfg.max_length), 65, 91, jnp.int32
        )
        for mode, fn, p in (("full", full, params), ("int8", q8, served)):
            try:
                dt = chain_time(fn, p, codes)
            except Exception as e:  # noqa: BLE001 — OOM at big batches is data
                print(
                    json.dumps(
                        {"mode": mode, "batch": batch, "error": str(e)[:120]}
                    ),
                    flush=True,
                )
                continue
            print(
                json.dumps(
                    {
                        "mode": mode,
                        "batch": batch,
                        "ms_per_batch": round(dt * 1e3, 3),
                        "glyphs_per_sec": round(batch * mcfg.max_length / dt),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
