"""A/B the serving tiers on TPU: fp32, fp+bf16-frontend, int8, int8+bf16.

bench.py's round-3 artifact showed int8+bf16 SLOWER than plain int8
(28.1M vs 33.9M glyphs/sec) — this tool isolates whether the bf16
frontend helps the full-precision path at all in eval mode (no dropout),
or whether the conversion overhead always dominates at these shapes.

Chained timing (data-dependent iterations + final scalar fetch).
"""

from __future__ import annotations

import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import dataclasses
import time

import jax
import jax.numpy as jnp

from ai_font_renderer_tpu.config import ModelConfig
from ai_font_renderer_tpu.models import font_renderer
from ai_font_renderer_tpu.ops.quantized import apply_quantized_int8, quantize_params


def chain(apply_fn, params, codes, iters=50):
    @jax.jit
    def f(p, c):
        out = apply_fn(p, c)
        delta = (out[:, :1, :100] * 7).astype(jnp.int32)
        return out, (c + delta.reshape(c.shape)) % 26 + 65

    out, c = f(params, codes)
    jax.block_until_ready((out, c))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        cc = codes
        for _ in range(iters):
            out, cc = f(params, cc)
        float(out.mean())
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main() -> None:
    base = ModelConfig()
    params = font_renderer.init(jax.random.PRNGKey(0), base)
    q8 = quantize_params(params)
    codes = jax.random.randint(jax.random.PRNGKey(1), (1024, 100), 65, 91, jnp.int32)
    tiers = [
        ("fp32", params, lambda p, c: font_renderer.apply(p, c, base, train=False)),
        (
            "fp+bf16",
            params,
            lambda p, c: font_renderer.apply(
                p, c, dataclasses.replace(base, bf16_frontend=True), train=False
            ),
        ),
        ("int8", q8, lambda p, c: apply_quantized_int8(p, c, base)),
        (
            "int8+bf16",
            q8,
            lambda p, c: apply_quantized_int8(
                p, c, dataclasses.replace(base, bf16_frontend=True)
            ),
        ),
    ]
    for tag, p, fn in tiers:
        dt = chain(fn, p, codes)
        print(
            f"{tag:10s}: {dt*1e3:.3f} ms/batch = "
            f"{1024 * 100 / dt / 1e6:.1f}M glyphs/sec"
        )


if __name__ == "__main__":
    main()
