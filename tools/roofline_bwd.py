"""Backward-pass roofline decomposition for the flagship train step.

Splits the parity-profile step (ModelConfig() defaults, batch 1024) into
measured segments and compares each against its compute/bandwidth roofline
on v5e (bf16 MXU peak 197 TFLOP/s, HBM ~819 GB/s). Methodology: every
segment is a jitted function timed with a data-dependent chain (the output
perturbs the next input) ending in a scalar fetch — the honest-timing
discipline from CLAUDE.md (block_until_ready can return early on the
remote runtime).

Segment algebra (all include the same forward where noted):
    full_step           train_step: fwd + bwd + AdamW
    fwd                 loss value only (train=True dropout, same as step)
    fwd_bwd             value_and_grad over all params
    fwd_bwd_dw_side     grad wrt out_w only  -> fwd + chain + dW GEMM
    fwd_bwd_dx_side     grad wrt frontend params only -> fwd + chain + dX
                        GEMM + frontend backward
    chain_only          grad of mean((clamp(sheet)-t)^2) wrt sheet: the
                        clamp-mask + MSE elementwise chain in isolation
    raw dX / dW GEMMs   the two projection backward GEMMs at step dtypes
    frontend fwd/bwd    attention+MLP block alone
    adamw_only          optimizer update with precomputed grads

Derived:  bwd_total = fwd_bwd - fwd;   dW_side = fwd_bwd_dw_side - fwd;
          dX_side = fwd_bwd_dx_side - fwd;
          frontend_bwd ~= dX_side - chain_only - raw_dX.

Usage (TPU): python tools/roofline_bwd.py [--fast]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

from ai_font_renderer_tpu.config import ModelConfig, TrainConfig
from ai_font_renderer_tpu.models import font_renderer
from ai_font_renderer_tpu.train.step import (
    init_state,
    loss_fn,
    make_optimizer,
    mse_loss,
    train_step,
)

B = 1024
PEAK_BF16 = 197e12  # v5e MXU, bf16 x bf16 -> f32
PEAK_HBM = 819e9  # v5e HBM bytes/sec


def chain_time(label, fn, *args, iters=20, windows=4):
    """fn(*args) -> (scalar_or_array, *new_args). Chains args through
    iterations; scalar fetch at the end of each window. The chain never
    rewinds to the original args (they may be donated buffers)."""
    out = fn(*args)  # compile + warm
    jax.block_until_ready(out)
    a = out[1:]
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
            a = out[1:]
        float(jnp.asarray(out[0]).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    ms = 1e3 * best / iters
    print(f"{label:26s} {ms:7.3f} ms", flush=True)
    return ms


def perturb(codes, sig):
    """Data-dependent next-iteration codes from any scalar signal."""
    return (codes + jnp.int32(sig * 7)) % 26 + 65


def main():
    fast = "--fast" in sys.argv
    mcfg = (
        ModelConfig(bf16_frontend=True, bits_dropout=True) if fast else ModelConfig()
    )
    tcfg = TrainConfig()
    key = jax.random.PRNGKey(0)
    state = init_state(key, mcfg, tcfg)
    codes = jax.random.randint(key, (B, mcfg.max_length), 65, 91, jnp.int32)
    targets = jax.random.randint(
        key, (B, mcfg.sheet_height, mcfg.sheet_width), 0, 256, jnp.int32
    ).astype(jnp.uint8)
    lr = jnp.float32(1e-3)
    dkey = jax.random.key(1, impl=tcfg.prng_impl)
    P = mcfg.sheet_height * mcfg.sheet_width
    K_, N_ = mcfg.max_length * mcfg.hidden_dim, P

    results = {}

    # --- full step (state chained through donation) --------------------
    def full(state, codes):
        state, loss = train_step(state, codes, targets, lr, dkey, mcfg, tcfg)
        return loss, state, perturb(codes, loss)

    results["full_step"] = chain_time("full_step", full, state, codes)
    state = init_state(key, mcfg, tcfg)  # donated away; rebuild

    params = state.params

    # --- forward only --------------------------------------------------
    @jax.jit
    def fwd(p, codes):
        loss = loss_fn(p, codes, targets, mcfg, dkey, True)
        return loss, p, perturb(codes, loss)

    results["fwd"] = chain_time("fwd (loss only)", fwd, params, codes)

    # --- forward + full backward ---------------------------------------
    @jax.jit
    def fwd_bwd(p, codes):
        loss, g = jax.value_and_grad(loss_fn)(p, codes, targets, mcfg, dkey, True)
        return loss, jax.tree.map(lambda a, b: a - 0.0 * b, p, g), perturb(codes, loss)

    results["fwd_bwd"] = chain_time("fwd_bwd (all grads)", fwd_bwd, params, codes)

    # --- dW side: grad wrt out_w only ----------------------------------
    frontend_params = {k: v for k, v in params.items() if k not in ("out_w",)}

    @jax.jit
    def fwd_bwd_dw(w, codes):
        def f(w):
            p = dict(frontend_params, out_w=w)
            return loss_fn(p, codes, targets, mcfg, dkey, True)

        loss, gw = jax.value_and_grad(f)(w)
        return loss, w - 0.0 * gw, perturb(codes, loss)

    results["fwd_bwd_dw_side"] = chain_time(
        "fwd+chain+dW", fwd_bwd_dw, params["out_w"], codes
    )

    # --- dX side: grad wrt frontend params only ------------------------
    out_w_const = params["out_w"]

    @jax.jit
    def fwd_bwd_dx(fp, codes):
        def f(fp):
            p = dict(fp, out_w=out_w_const)
            return loss_fn(p, codes, targets, mcfg, dkey, True)

        loss, g = jax.value_and_grad(f)(fp)
        return loss, jax.tree.map(lambda a, b: a - 0.0 * b, fp, g), perturb(codes, loss)

    results["fwd_bwd_dx_side"] = chain_time(
        "fwd+chain+dX+frontbwd", fwd_bwd_dx, frontend_params, codes
    )

    # --- elementwise chain alone ---------------------------------------
    tgt_f = targets.reshape(B, P).astype(jnp.float32) / 255.0

    @jax.jit
    def chain_only(sheet):
        def f(s):
            return mse_loss(jnp.clip(s, 0.0, 1.0), tgt_f)

        loss, g = jax.value_and_grad(f)(sheet)
        return loss, sheet - g  # g feeds the next sheet: data-dependent

    sheet0 = jax.random.normal(key, (B, P), jnp.float32)
    results["chain_only"] = chain_time("clamp+MSE chain", chain_only, sheet0)

    # --- raw projection GEMMs at step dtypes ---------------------------
    # Parity path: fwd casts (flat, W) to bf16; autodiff then runs
    # dX = g_f32 @ W_bf16^T and dW = flat_bf16^T @ g_f32.
    g0 = jax.random.normal(key, (B, N_), jnp.float32) * 1e-3
    wb = params["out_w"].astype(jnp.bfloat16)
    fb = jax.random.normal(key, (B, K_), jnp.bfloat16)

    @jax.jit
    def raw_dx(g):
        dx = jnp.dot(g, wb.T, preferred_element_type=jnp.float32)
        # fold dx back into g (keeps the chain honest, negligible cost)
        return dx[0, 0], g + 1e-9 * jnp.pad(dx, ((0, 0), (0, N_ - K_)))

    results["raw_dx_gemm"] = chain_time("raw dX GEMM", raw_dx, g0)

    @jax.jit
    def raw_dw(g):
        dw = jax.lax.dot_general(
            fb, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dw[0, 0], g + 1e-9 * dw[:1, :]

    results["raw_dw_gemm"] = chain_time("raw dW GEMM", raw_dw, g0)

    # --- frontend alone -------------------------------------------------
    @jax.jit
    def front_fwd(fp, codes):
        flat = font_renderer.frontend(
            dict(fp, out_w=out_w_const), codes, mcfg, train=True, key=dkey
        )
        s = flat.sum()
        return s, fp, perturb(codes, s)

    results["frontend_fwd"] = chain_time("frontend fwd", front_fwd, frontend_params, codes)

    @jax.jit
    def front_fwd_bwd(fp, codes):
        def f(fp):
            return font_renderer.frontend(
                dict(fp, out_w=out_w_const), codes, mcfg, train=True, key=dkey
            ).sum()

        s, g = jax.value_and_grad(f)(fp)
        return s, jax.tree.map(lambda a, b: a - 0.0 * b, fp, g), perturb(codes, s)

    results["frontend_fwd_bwd"] = chain_time(
        "frontend fwd+bwd", front_fwd_bwd, frontend_params, codes
    )

    # --- AdamW alone (grads fixed, state chained/donated) ---------------
    opt = make_optimizer(tcfg)
    grads = jax.tree.map(lambda p: 1e-4 * jnp.ones_like(p), params)
    opt_state0 = opt.init(params)

    @jax.jit
    def adamw_only(p, os_):
        updates, os2 = opt.update(grads, os_, p)
        p2 = jax.tree.map(lambda a, u: a + lr * u, p, updates)
        return p2["out_b"][0], p2, os2

    results["adamw_only"] = chain_time("AdamW only", adamw_only, params, opt_state0)

    # --- derived + rooflines --------------------------------------------
    flop_gemm = 2.0 * B * K_ * N_
    ideal_gemm_ms = 1e3 * flop_gemm / PEAK_BF16
    # chain bytes: read sheet f32 + read target u8 + write g f32
    chain_bytes = B * P * (4 + 1 + 4)
    ideal_chain_ms = 1e3 * chain_bytes / PEAK_HBM
    # AdamW bytes: r/w w f32, r/w nu f32, r/w mu (bf16 default), read dw f32
    mu_b = 2 if tcfg.adam_mu_bf16 else 4
    n_par = sum(p.size for p in jax.tree.leaves(params))
    adamw_bytes = n_par * (4 * 2 + 4 * 2 + mu_b * 2 + 4)
    ideal_adamw_ms = 1e3 * adamw_bytes / PEAK_HBM

    bwd_total = results["fwd_bwd"] - results["fwd"]
    dw_side = results["fwd_bwd_dw_side"] - results["fwd"]
    dx_side = results["fwd_bwd_dx_side"] - results["fwd"]
    front_bwd = results["frontend_fwd_bwd"] - results["frontend_fwd"]

    print("\n--- derived (ms) ---")
    print(f"bwd_total (fwd_bwd - fwd)        {bwd_total:7.3f}")
    print(f"dW side   (chain+dW)             {dw_side:7.3f}")
    print(f"dX side   (chain+dX+front_bwd)   {dx_side:7.3f}")
    print(f"frontend bwd (direct)            {front_bwd:7.3f}")
    print(f"step - (fwd_bwd + adamw)         "
          f"{results['full_step'] - results['fwd_bwd'] - results['adamw_only']:7.3f}")
    print("\n--- rooflines ---")
    print(f"projection GEMM ideal (bf16 MXU) {ideal_gemm_ms:7.3f} ms "
          f"(measured dX {results['raw_dx_gemm']:.3f}, dW {results['raw_dw_gemm']:.3f})")
    print(f"clamp+MSE chain ideal (HBM)      {ideal_chain_ms:7.3f} ms "
          f"(measured {results['chain_only']:.3f})")
    print(f"AdamW ideal (HBM, {n_par/1e6:.1f}M params)  {ideal_adamw_ms:7.3f} ms "
          f"(measured {results['adamw_only']:.3f})")


if __name__ == "__main__":
    main()
