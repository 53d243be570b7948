"""A/B: fused-attention v2 (stored-mask dropout) on TPU — correctness + tiles.

v2 (ops/fused_attention.py:fused_attention2) writes the dropout mask to HBM
so the forward and backward grids decouple; this sweeps (fwd, bwd) batch-tile
pairs at flagship shapes (B=1024, S=100, E=32, H=4) against the XLA attention
frontend and the round-2 v1 kernel (shared tile 8).

Measurements:
  1. correctness: eval-mode fwd + grads (dropout off) v2 vs XLA;
  2. train-epoch step latency via the real epoch-scan path for
     XLA / v1(tile 8) / v2 at each tile pair, parity and fast profiles.

Chained timing (data dependencies + final scalar fetch) per CLAUDE.md.
"""

from __future__ import annotations

import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

from ai_font_renderer_tpu.config import ModelConfig, TrainConfig
from ai_font_renderer_tpu.models import font_renderer
from tools.ab_fused_attention import epoch_time


def main() -> None:
    base = ModelConfig()
    v2 = ModelConfig(fused_attention_v2=True)
    params = font_renderer.init(jax.random.PRNGKey(0), base)
    codes = jax.random.randint(jax.random.PRNGKey(1), (1024, 100), 65, 91, jnp.int32)

    # 1. correctness (eval mode: dropout inactive, mask still materialized)
    out_a = font_renderer.apply(params, codes, base, train=False)
    out_b = font_renderer.apply(params, codes, v2, train=False)
    print(f"fwd max|diff| = {float(jnp.max(jnp.abs(out_a - out_b))):.3e}")

    def loss_fn(p, cfg):
        return jnp.mean(font_renderer.apply(p, codes, cfg, train=False) ** 2)

    ga = jax.grad(lambda p: loss_fn(p, base))(params)
    gb = jax.grad(lambda p: loss_fn(p, v2))(params)
    gdiffs = {
        k: float(jnp.max(jnp.abs(ga[k] - gb[k])) / (jnp.max(jnp.abs(ga[k])) + 1e-12))
        for k in ("wq", "wk", "wv", "wo", "out_w", "embedding")
    }
    print("grad rel max diffs:", {k: f"{v:.2e}" for k, v in gdiffs.items()})

    # 2. train-step latency sweep on the real epoch-scan path.
    # The kernels raise Mosaic's scoped-VMEM limit from the default
    # 16 MB to 100 MB (_VMEM_LIMIT — the v5e core has 128 MB physical),
    # which lifts the AOT-measured caps from fwd 16 / bwd 8 to fwd 64 /
    # bwd 32 (v2) and shared tile 32 (v1: its bwd stack is ~63 MB at
    # 32, ~126 MB at 64). Sweep brackets both the old caps and the new.
    rows = [
        ("xla", dict()),
        ("v1 t8", dict(fused_attention=True, fused_attention_tile=8)),
        ("v1 t32", dict(fused_attention=True, fused_attention_tile=32)),
    ]
    for tf, tb in [(16, 8), (32, 16), (64, 32)]:
        rows.append(
            (f"v2 f{tf}/b{tb}",
             dict(fused_attention_v2=True, fa2_tile_fwd=tf, fa2_tile_bwd=tb))
        )
    for fast in (False, True):
        for tag, kw in rows:
            m = ModelConfig(bf16_frontend=fast, bits_dropout=fast, **kw)
            try:
                dt = epoch_time(m, TrainConfig())
            except Exception as e:  # VMEM overflow at big tiles is informative
                print(f"train step [{tag} fast={fast}]: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}")
                continue
            print(f"train step [{tag} fast={fast}]: {dt*1e3:.2f} ms")

    # 3. eval-mode forward (the serving/headline path): dropout is
    # inactive, so v1 (no mask write) is the right kernel shape; its
    # eval tile can exceed the train cap (fwd-only stack: ~45 MB at 64,
    # ~91 MB at 128).
    def eval_time(cfg, iters=50):
        @jax.jit
        def f(p, c):
            out = font_renderer.apply(p, c, cfg, train=False)
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

    for tag, kw in [
        ("xla", dict()),
        ("v1 t32", dict(fused_attention=True, fused_attention_tile=32)),
        ("v1 t64", dict(fused_attention=True, fused_attention_tile=64)),
        ("v1 t128", dict(fused_attention=True, fused_attention_tile=128)),
    ]:
        try:
            dt = eval_time(ModelConfig(**kw))
        except Exception as e:
            print(f"eval fwd [{tag}]: FAILED {type(e).__name__}: {str(e)[:120]}")
            continue
        print(f"eval fwd [{tag}]: {dt*1e3:.3f} ms/batch = "
              f"{1024 * 100 / dt / 1e6:.1f}M glyphs/sec")


if __name__ == "__main__":
    main()
