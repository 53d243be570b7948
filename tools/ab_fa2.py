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
    # fwd tiles > 16 overflow the 16 MB scoped-VMEM stack (measured:
    # 51.5 MB at 64, so ~12.9 MB at 16); (32, 16) stays in the sweep to
    # document the cap as a loud failure.
    rows = [
        ("xla", dict()),
        ("v1 t8", dict(fused_attention=True, fused_attention_tile=8)),
    ]
    for tf, tb in [(8, 8), (16, 8), (16, 16), (16, 32), (32, 16)]:
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


if __name__ == "__main__":
    main()
