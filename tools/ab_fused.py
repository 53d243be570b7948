"""A/B: standard XLA step vs fused dW+AdamW Pallas step at flagship shapes.

Chained-timing discipline (CLAUDE.md): each variant runs as a 20-step
`lax.scan` epoch (state threads through; final scalar fetch), alternating
variants across rounds to cancel clock drift. Prints ms/step for both.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from ai_font_renderer_tpu.config import ModelConfig, TrainConfig
from ai_font_renderer_tpu.train.step import (
    init_fused_state,
    init_state,
    train_eval_epoch_fused,
    train_eval_epoch,
)


def main():
    mcfg = ModelConfig()
    tcfg = TrainConfig()
    b = tcfg.batch_size
    steps = 20
    key = jax.random.PRNGKey(0)
    n = 4 * b
    codes = jax.random.randint(key, (n, mcfg.max_length), 65, 91, jnp.int32)
    targets = jax.random.randint(
        key, (n, mcfg.sheet_height, mcfg.sheet_width), 0, 256, jnp.int32
    ).astype(jnp.uint8)
    batch_idx = jnp.arange(steps * b, dtype=jnp.int32).reshape(steps, b) % n
    val_idx = batch_idx[:2]
    val_w = jnp.ones((2, b), jnp.float32)
    lr = jnp.float32(1e-3)
    skey = jax.random.key(1, impl=tcfg.prng_impl)

    def run(label, state, epoch_fn, rounds=4):
        nonlocal_state = state
        # compile + warm
        nonlocal_state, tl, vl = epoch_fn(
            nonlocal_state, codes, targets, batch_idx, val_idx, val_w, lr,
            skey, mcfg, tcfg,
        )
        float(tl)
        best = float("inf")
        for r in range(rounds):
            t0 = time.perf_counter()
            nonlocal_state, tl, vl = epoch_fn(
                nonlocal_state, codes, targets, batch_idx, val_idx, val_w,
                lr, jax.random.fold_in(skey, r), mcfg, tcfg,
            )
            float(tl)
            best = min(best, time.perf_counter() - t0)
        # subtract nothing; val pass (2 fwd batches ~1 ms) is identical in
        # both variants so the delta is pure train-step difference.
        print(f"{label}: {1e3 * best / steps:.2f} ms/step (epoch best {best:.3f}s)")
        return best

    std = init_state(jax.random.PRNGKey(0), mcfg, tcfg)
    fus = init_fused_state(jax.random.PRNGKey(0), mcfg, tcfg)
    # alternate rounds: std, fused, std, fused
    run("standard (warm)", std, train_eval_epoch)
    run("fused    (warm)", fus, train_eval_epoch_fused)
    std = init_state(jax.random.PRNGKey(1), mcfg, tcfg)
    fus = init_fused_state(jax.random.PRNGKey(1), mcfg, tcfg)
    run("standard", std, train_eval_epoch)
    run("fused   ", fus, train_eval_epoch_fused)


if __name__ == "__main__":
    main()
