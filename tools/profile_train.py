"""Component-level timing of the train step on the real TPU.

Times each piece with the honest chained-scalar-fetch method (see
utils/profiling.py): full fwd, fwd+bwd+AdamW, the fused-Pallas variant, the
dominant GEMM alone, attention alone, dropout mask generation, optimizer
alone — to attribute the step-time budget and verify the Pallas kernel
compiled (not interpret) agrees with XLA numerically.

Run:  python tools/profile_train.py
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp
import numpy as np

from ai_font_renderer_tpu.config import ModelConfig, TrainConfig, replace
from ai_font_renderer_tpu.models import font_renderer
from ai_font_renderer_tpu.train import init_state, make_optimizer, train_step
import optax

B = 1024


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    # honest: chain via dependency where possible, finish with scalar fetch
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:38s} {dt * 1e3:8.3f} ms")
    return dt


def main():
    mcfg = ModelConfig()
    tcfg = TrainConfig()
    key = jax.random.PRNGKey(0)
    params = font_renderer.init(key, mcfg)
    codes = jax.random.randint(key, (B, 100), 65, 91, jnp.int32)
    targets = jax.random.uniform(key, (B, 80, 240))
    lr = jnp.float32(1e-3)

    fwd_eval = jax.jit(lambda p, c: font_renderer.apply(p, c, mcfg, train=False))
    fwd_train = jax.jit(
        lambda p, c, k: font_renderer.apply(p, c, mcfg, train=True, key=k)
    )
    timeit("fwd eval", fwd_eval, params, codes)
    timeit("fwd train (dropout)", fwd_train, params, codes, key)

    mcfg_p = replace(mcfg, use_pallas_output=True)
    fwd_pallas = jax.jit(lambda p, c: font_renderer.apply(p, c, mcfg_p, train=False))
    a = fwd_pallas(params, codes)
    b = fwd_eval(params, codes)
    err = float(jnp.abs(a - b).max())
    print(f"pallas-vs-xla fwd max abs err: {err:.2e}")
    timeit("fwd eval (pallas fused)", fwd_pallas, params, codes)

    # GEMM alone.
    flat = jax.random.normal(key, (B, 6400), jnp.float32)
    w = params["out_w"]
    gemm = jax.jit(
        lambda f, w: jnp.dot(
            f.astype(jnp.bfloat16),
            w.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    )
    timeit("out GEMM alone (bf16)", gemm, flat, w)

    # Attention alone.
    x = jax.random.normal(key, (B, 100, 32), jnp.float32)
    attn = jax.jit(lambda p, x: font_renderer.attention(p, x, mcfg))
    timeit("attention alone", attn, params, x)

    # Dropout mask generation at attention-probs size.
    bern = jax.jit(lambda k: jax.random.bernoulli(k, 0.8, (B, 4, 100, 100)))
    timeit("bernoulli [B,4,100,100] threefry", bern, key)

    # Full train step (XLA) and (pallas).
    state = init_state(key, mcfg, tcfg)
    t_step = jax.jit(
        lambda s, c, t, l, k: train_step(s, c, t, l, k, mcfg, tcfg),
        donate_argnums=(0,),
    )
    s1 = state
    s1, _ = t_step(s1, codes, targets, lr, key)
    jax.block_until_ready(s1.params)
    t0 = time.perf_counter()
    for i in range(20):
        s1, loss = t_step(s1, codes, targets, lr, jax.random.fold_in(key, i))
    float(loss)
    print(f"{'train step XLA':38s} {(time.perf_counter() - t0) / 20 * 1e3:8.3f} ms")

    state_p = init_state(key, mcfg_p, tcfg)
    tp_step = jax.jit(
        lambda s, c, t, l, k: train_step(s, c, t, l, k, mcfg_p, tcfg),
        donate_argnums=(0,),
    )
    s2 = state_p
    s2, _ = tp_step(s2, codes, targets, lr, key)
    jax.block_until_ready(s2.params)
    t0 = time.perf_counter()
    for i in range(20):
        s2, loss = tp_step(s2, codes, targets, lr, jax.random.fold_in(key, i))
    float(loss)
    print(f"{'train step PALLAS':38s} {(time.perf_counter() - t0) / 20 * 1e3:8.3f} ms")

    # Optimizer update alone.
    opt = make_optimizer(tcfg)
    grads = jax.tree.map(jnp.ones_like, params)
    opt_state = opt.init(params)

    @jax.jit
    def opt_only(p, os_, g):
        updates, os2 = opt.update(g, os_, p)
        return optax.apply_updates(p, jax.tree.map(lambda u: 1e-3 * u, updates)), os2

    timeit("AdamW update alone (123M f32)", opt_only, params, opt_state, grads)


if __name__ == "__main__":
    main()
