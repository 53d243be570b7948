"""Inference throughput: f32-frontend/bf16-GEMM vs int8-quantized serving.

Chained honest timing (see bench.py). Prints one JSON line per mode.
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
from ai_font_renderer_tpu.ops.quantized import (
    apply_quantized,
    apply_quantized_int8,
    quantize_params,
)


def chain_time(fn, params, codes, iters=50, rounds=3):
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


def main():
    mcfg = ModelConfig()
    B = 1024
    params = font_renderer.init(jax.random.PRNGKey(0), mcfg)
    codes = jax.random.randint(jax.random.PRNGKey(1), (B, 100), 65, 91, jnp.int32)

    def make_chain(apply_fn):
        # params travel as a jit ARGUMENT: closing over them would embed
        # 492 MB of weights as constants in the compiled program.
        @jax.jit
        def f(p, c):
            out = apply_fn(p, c)
            delta = (out[:, :1, :100] * 7).astype(jnp.int32).reshape(c.shape)
            return out, (c + delta) % 26 + 65

        return f

    full = make_chain(lambda p, c: font_renderer.apply(p, c, mcfg, train=False))
    dt_full = chain_time(full, params, codes)

    served = quantize_params(params)
    q = make_chain(lambda p, c: apply_quantized(p, c, mcfg))
    dt_q = chain_time(q, served, codes)

    q8 = make_chain(lambda p, c: apply_quantized_int8(p, c, mcfg))
    dt_q8 = chain_time(q8, served, codes)

    for tag, dt in [("bf16", dt_full), ("int8w", dt_q), ("int8x8", dt_q8)]:
        print(
            json.dumps(
                {
                    "metric": f"inference_{tag}_glyphs_per_sec",
                    "value": round(B * 100 / dt, 1),
                    "unit": "glyphs/sec",
                    "ms_per_batch_1024": round(dt * 1e3, 3),
                }
            )
        )


if __name__ == "__main__":
    main()
