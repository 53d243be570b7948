"""A/B: fused Pallas attention kernel vs the XLA attention frontend, on TPU.

Three measurements at flagship shapes (B=1024, S=100, E=32, H=4):
  1. correctness: fwd outputs (eval mode, no dropout) fused vs XLA;
     grads of a scalar loss w.r.t. x and weights, dropout off;
  2. fwd-only latency of the full model apply (train=False);
  3. full train-step latency via the real epoch-scan path
     (train_epoch, rbg keys) with fused_attention on vs off.

Chained timing throughout (data dependencies + final scalar fetch).
"""

from __future__ import annotations

import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp

from ai_font_renderer_tpu.config import ModelConfig, TrainConfig
from ai_font_renderer_tpu.models import font_renderer


def chain_fwd(mcfg, params, codes, iters=30):
    @jax.jit
    def f(p, c):
        out = font_renderer.apply(p, c, mcfg, train=False)
        delta = (out[:, :1, : mcfg.max_length] * 7).astype(jnp.int32)
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


def epoch_time(mcfg, tcfg, steps=20):
    from ai_font_renderer_tpu.train import init_state, train_epoch

    key = jax.random.PRNGKey(7)
    state = init_state(jax.random.PRNGKey(0), mcfg, tcfg)
    tb = tcfg.batch_size
    n_fake = 4 * tb
    codes_all = jax.random.randint(key, (n_fake, mcfg.max_length), 65, 91, jnp.int32)
    targets_all = jax.random.randint(
        key, (n_fake, mcfg.sheet_height, mcfg.sheet_width), 0, 256, jnp.int32
    ).astype(jnp.uint8)
    batch_idx = jnp.arange(steps * tb, dtype=jnp.int32).reshape(steps, tb) % n_fake
    lr = jnp.float32(1e-3)
    step_key = jax.random.key(1, impl=tcfg.prng_impl)
    state, loss = train_epoch(
        state, codes_all, targets_all, batch_idx, lr, step_key, mcfg, tcfg
    )
    float(loss)
    best = float("inf")
    for i in range(4):
        t0 = time.perf_counter()
        state, loss = train_epoch(
            state, codes_all, targets_all, batch_idx, lr,
            jax.random.fold_in(step_key, i), mcfg, tcfg,
        )
        float(loss)
        best = min(best, time.perf_counter() - t0)
    return best / steps


def main() -> None:
    base = ModelConfig()
    fused = ModelConfig(fused_attention=True)
    params = font_renderer.init(jax.random.PRNGKey(0), base)
    codes = jax.random.randint(jax.random.PRNGKey(1), (1024, 100), 65, 91, jnp.int32)

    # 1. correctness (eval mode fwd + grads, dropout inactive)
    out_a = font_renderer.apply(params, codes, base, train=False)
    out_b = font_renderer.apply(params, codes, fused, train=False)
    fwd_diff = float(jnp.max(jnp.abs(out_a - out_b)))

    def loss_fn(p, cfg):
        return jnp.mean(font_renderer.apply(p, codes, cfg, train=False) ** 2)

    ga = jax.grad(lambda p: loss_fn(p, base))(params)
    gb = jax.grad(lambda p: loss_fn(p, fused))(params)
    gdiffs = {
        k: float(jnp.max(jnp.abs(ga[k] - gb[k])) / (jnp.max(jnp.abs(ga[k])) + 1e-12))
        for k in ("wq", "wk", "wv", "wo", "out_w", "embedding")
    }
    print(f"fwd max|diff| = {fwd_diff:.3e}")
    print("grad rel max diffs:", {k: f"{v:.2e}" for k, v in gdiffs.items()})

    # 2. fwd latency
    dt_a = chain_fwd(base, params, codes)
    dt_b = chain_fwd(fused, params, codes)
    print(f"fwd apply:  xla {dt_a*1e3:.3f} ms   fused {dt_b*1e3:.3f} ms")

    # 3. train-step latency on the real epoch-scan path
    for tag, mcfg in [("xla", base), ("fused", fused)]:
        for fast in (False, True):
            m = ModelConfig(
                fused_attention=mcfg.fused_attention,
                bf16_frontend=fast,
                bits_dropout=fast,
            )
            dt = epoch_time(m, TrainConfig())
            print(f"train step [{tag} fast={fast}]: {dt*1e3:.2f} ms")


if __name__ == "__main__":
    main()
