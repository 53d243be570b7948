"""A/B train-step timing across ModelConfig speed profiles.

Chained-timing discipline (CLAUDE.md): each profile runs 20-step
`lax.scan` epochs (state threads through; final scalar fetch), alternating
profiles across rounds to cancel clock drift; best-of-rounds reported.

Usage: python tools/ab_profiles.py [profile ...]
Profiles: parity, fast (bf16_frontend+bits_dropout), cotangent (fast +
bf16_cotangent). Default: fast cotangent.
"""

from __future__ import annotations

import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import jax
import jax.numpy as jnp

from ai_font_renderer_tpu.config import ModelConfig, TrainConfig
from ai_font_renderer_tpu.train.step import init_state, train_eval_epoch

# name -> (ModelConfig, TrainConfig)
PROFILES = {
    "parity": (ModelConfig(), TrainConfig()),
    "fast": (ModelConfig(bf16_frontend=True, bits_dropout=True), TrainConfig()),
    "cotangent": (
        ModelConfig(bf16_frontend=True, bits_dropout=True, bf16_cotangent=True),
        TrainConfig(),
    ),
    "conv": (
        ModelConfig(decoder="conv", bf16_frontend=True, bits_dropout=True),
        TrainConfig(),
    ),
    "conv_ps": (
        ModelConfig(decoder="conv_ps", bf16_frontend=True, bits_dropout=True),
        TrainConfig(),
    ),
    # Round 3: hand-rolled projection backward (bf16 cotangent into both
    # GEMMs, chain hand-fused — no autodiff boundary). See RESULTS.md
    # roofline table.
    "handrolled": (ModelConfig(), TrainConfig(handrolled_bwd=True)),
    "fast_handrolled": (
        ModelConfig(bf16_frontend=True, bits_dropout=True),
        TrainConfig(handrolled_bwd=True),
    ),
    # Round 4: remat policies on the traffic-bound frontend backward
    # (TrainConfig.remat_frontend; VERDICT r3 #5's non-kernel lever).
    "fast_hr_rematdots": (
        ModelConfig(bf16_frontend=True, bits_dropout=True),
        TrainConfig(handrolled_bwd=True, remat_frontend="dots"),
    ),
    "fast_hr_rematfull": (
        ModelConfig(bf16_frontend=True, bits_dropout=True),
        TrainConfig(handrolled_bwd=True, remat_frontend="full"),
    ),
}


def main() -> None:
    names = sys.argv[1:] or ["fast", "fast_handrolled"]
    b = TrainConfig().batch_size
    steps = 20
    key = jax.random.PRNGKey(0)
    n = 4 * b
    ml = ModelConfig().max_length
    codes = jax.random.randint(key, (n, ml), 65, 91, jnp.int32)
    targets = jax.random.randint(key, (n, 80, 240), 0, 256, jnp.int32).astype(
        jnp.uint8
    )
    batch_idx = jnp.arange(steps * b, dtype=jnp.int32).reshape(steps, b) % n
    val_idx = batch_idx[:2]
    val_w = jnp.ones((2, b), jnp.float32)
    lr = jnp.float32(1e-3)
    skey = jax.random.key(1, impl=TrainConfig().prng_impl)

    states = {}
    for nm in names:
        mcfg, tcfg = PROFILES[nm]
        st = init_state(jax.random.PRNGKey(0), mcfg, tcfg)
        # compile + warm
        st, tl, _ = train_eval_epoch(
            st, codes, targets, batch_idx, val_idx, val_w, lr, skey, mcfg, tcfg
        )
        float(tl)
        states[nm] = st
    best = {nm: float("inf") for nm in names}
    for r in range(5):  # alternate profiles each round
        for nm in names:
            mcfg, tcfg = PROFILES[nm]
            t0 = time.perf_counter()
            states[nm], tl, _ = train_eval_epoch(
                states[nm], codes, targets, batch_idx, val_idx, val_w, lr,
                jax.random.fold_in(skey, r), mcfg, tcfg,
            )
            float(tl)
            best[nm] = min(best[nm], time.perf_counter() - t0)
    for nm in names:
        print(f"{nm}: {1e3 * best[nm] / steps:.2f} ms/step (epoch best {best[nm]:.3f}s)")


if __name__ == "__main__":
    main()
