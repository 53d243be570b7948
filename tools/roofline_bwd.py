"""Backward-pass roofline decomposition for the flagship train step.

Splits the parity-profile step (ModelConfig() defaults, batch 1024) into
measured segments and compares each against its compute/bandwidth roofline
on v5e (bf16 MXU peak 197 TFLOP/s, HBM ~819 GB/s).

Methodology: each segment runs ITERS times inside ONE device dispatch via
``lax.scan`` with a data-dependent carry (outputs perturb the next
iteration's inputs), ending in a scalar fetch. Per-call timing is useless
on this remote runtime: the tunnel's per-dispatch + per-output-buffer
overhead is several ms and scales with the number of returned arrays, so
a per-call "dW GEMM" can appear to cost 0.3 ms. The in-scan numbers are
true device times (same discipline as bench.py's train_epoch).

Segment algebra (all include the same forward where noted):
    full_step           train_step math: fwd + bwd + AdamW
    fwd                 loss value only (train=True dropout, as the step)
    fwd_bwd             value_and_grad over all params
    fwd_bwd_dw_side     grad wrt out_w only  -> fwd + chain + dW GEMM
    fwd_bwd_dx_side     grad wrt frontend params only -> fwd + chain + dX
                        GEMM + frontend backward
    chain_only          grad of mean((clamp(sheet)-t)^2) wrt sheet
    raw dX / dW GEMMs   the projection backward GEMMs at step dtypes
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
from jax import lax

from ai_font_renderer_tpu.config import ModelConfig, TrainConfig
from ai_font_renderer_tpu.models import font_renderer
from ai_font_renderer_tpu.train.step import (
    init_state,
    loss_fn,
    make_optimizer,
    mse_loss,
)

B = 1024
ITERS = 20
PEAK_BF16 = 197e12  # v5e MXU, bf16 x bf16 -> f32
PEAK_HBM = 819e9  # v5e HBM bytes/sec
EPS = 1e-12  # grad feedback factor: tiny but NOT zero (zero would DCE)


def scan_time(label, body, carry, windows=4):
    """Time ITERS in-device iterations of ``body`` (carry -> carry) inside
    one lax.scan dispatch; returns ms per iteration."""

    @jax.jit
    def run(c):
        return lax.scan(lambda c, _: (body(c), None), c, None, length=ITERS)[0]

    c = run(carry)  # compile + warm
    jax.block_until_ready(c)
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        c = run(c)
        float(jnp.asarray(jax.tree.leaves(c)[0]).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    ms = 1e3 * best / ITERS
    print(f"{label:26s} {ms:7.3f} ms", flush=True)
    return ms


def main():
    fast = "--fast" in sys.argv
    mcfg = (
        ModelConfig(bf16_frontend=True, bits_dropout=True) if fast else ModelConfig()
    )
    tcfg = TrainConfig()
    key = jax.random.PRNGKey(0)
    state0 = init_state(key, mcfg, tcfg)
    codes0 = jax.random.randint(key, (B, mcfg.max_length), 65, 91, jnp.int32)
    targets = jax.random.randint(
        key, (B, mcfg.sheet_height, mcfg.sheet_width), 0, 256, jnp.int32
    ).astype(jnp.uint8)
    lr = jnp.float32(1e-3)
    dkey = jax.random.key(1, impl=tcfg.prng_impl)
    P = mcfg.sheet_height * mcfg.sheet_width
    K_, N_ = mcfg.max_length * mcfg.hidden_dim, P
    params = state0.params
    opt = make_optimizer(tcfg)

    def perturb(codes, sig):
        return (codes + jnp.int32(sig * 7.0)) % 26 + 65

    def feed(tree, grads):
        """Fold grads into the carry so the scan iterations chain."""
        return jax.tree.map(lambda a, b: a + EPS * b, tree, grads)

    results = {}

    # --- full step math (fwd + bwd + AdamW), state chained --------------
    def full(c):
        st, codes = c
        loss, grads = jax.value_and_grad(loss_fn)(
            st.params, codes, targets, mcfg, dkey, True
        )
        updates, opt_state = opt.update(grads, st.opt_state, st.params)
        p = jax.tree.map(lambda a, u: a + lr * u, st.params, updates)
        return type(st)(p, opt_state), perturb(codes, loss)

    results["full_step"] = scan_time("full_step", full, (state0, codes0))

    # --- forward only ----------------------------------------------------
    def fwd(c):
        p, codes = c
        loss = loss_fn(p, codes, targets, mcfg, dkey, True)
        return p, perturb(codes, loss)

    results["fwd"] = scan_time("fwd (loss only)", fwd, (params, codes0))

    # --- forward + full backward -----------------------------------------
    def fwd_bwd(c):
        p, codes = c
        loss, g = jax.value_and_grad(loss_fn)(p, codes, targets, mcfg, dkey, True)
        return feed(p, g), perturb(codes, loss)

    results["fwd_bwd"] = scan_time("fwd_bwd (all grads)", fwd_bwd, (params, codes0))

    # --- dW side: grad wrt out_w only ------------------------------------
    frontend_params = {k: v for k, v in params.items() if k != "out_w"}

    def fwd_bwd_dw(c):
        w, codes = c

        def f(w):
            return loss_fn(
                dict(frontend_params, out_w=w), codes, targets, mcfg, dkey, True
            )

        loss, gw = jax.value_and_grad(f)(w)
        return w + EPS * gw, perturb(codes, loss)

    results["fwd_bwd_dw_side"] = scan_time(
        "fwd+chain+dW", fwd_bwd_dw, (params["out_w"], codes0)
    )

    # --- dX side: grad wrt frontend params only --------------------------
    # out_w rides the carry untouched: a closure over the 492 MB array
    # would embed it as an HLO constant (the remote compiler rejects the
    # oversized program body with HTTP 413).

    def fwd_bwd_dx(c):
        fp, codes, w = c

        def f(fp):
            return loss_fn(dict(fp, out_w=w), codes, targets, mcfg, dkey, True)

        loss, g = jax.value_and_grad(f)(fp)
        return feed(fp, g), perturb(codes, loss), w

    results["fwd_bwd_dx_side"] = scan_time(
        "fwd+chain+dX+frontbwd",
        fwd_bwd_dx,
        (frontend_params, codes0, params["out_w"]),
    )

    # --- elementwise chain alone ------------------------------------------
    tgt_f = targets.reshape(B, P).astype(jnp.float32) / 255.0

    def chain_only(c):
        sheet, tgt = c

        def f(s):
            return mse_loss(jnp.clip(s, 0.0, 1.0), tgt)

        loss, g = jax.value_and_grad(f)(sheet)
        return sheet - g, tgt

    sheet0 = jax.random.normal(key, (B, P), jnp.float32)
    results["chain_only"] = scan_time("clamp+MSE chain", chain_only, (sheet0, tgt_f))

    # --- raw projection GEMMs at step dtypes ------------------------------
    # Parity path: fwd casts (flat, W) to bf16; autodiff then runs
    # dX = g_f32 @ W_bf16^T and dW = flat_bf16^T @ g_f32.
    g0 = jax.random.normal(key, (B, N_), jnp.float32) * 1e-3
    wb = params["out_w"].astype(jnp.bfloat16)
    fb = jax.random.normal(key, (B, K_), jnp.bfloat16)

    def raw_dx(c):
        g, wb = c  # wb in the carry, not a 246 MB HLO constant
        dx = jnp.dot(g, wb.T, preferred_element_type=jnp.float32)
        return g + EPS * jnp.pad(dx, ((0, 0), (0, N_ - K_))), wb

    results["raw_dx_gemm"] = scan_time("raw dX GEMM", raw_dx, (g0, wb))

    def raw_dw(c):
        g, fb = c
        dw = lax.dot_general(
            fb, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return g + EPS * dw[:1, :], fb

    results["raw_dw_gemm"] = scan_time("raw dW GEMM", raw_dw, (g0, fb))

    # --- frontend alone ----------------------------------------------------
    def front_fwd(c):
        fp, codes = c
        flat = font_renderer.frontend(fp, codes, mcfg, train=True, key=dkey)
        return fp, perturb(codes, flat.sum())

    results["frontend_fwd"] = scan_time(
        "frontend fwd", front_fwd, (frontend_params, codes0)
    )

    def front_fwd_bwd(c):
        fp, codes = c

        def f(fp):
            return font_renderer.frontend(
                fp, codes, mcfg, train=True, key=dkey
            ).sum()

        s, g = jax.value_and_grad(f)(fp)
        return feed(fp, g), perturb(codes, s)

    results["frontend_fwd_bwd"] = scan_time(
        "frontend fwd+bwd", front_fwd_bwd, (frontend_params, codes0)
    )

    # --- AdamW alone (grads fixed, state chained) --------------------------
    grads0 = jax.tree.map(lambda p: 1e-4 * jnp.ones_like(p), params)
    opt_state0 = opt.init(params)

    def adamw_only(c):
        p, os_, grads = c
        updates, os2 = opt.update(grads, os_, p)
        # grads perturbed by the update so the scan can't hoist anything.
        g2 = jax.tree.map(lambda g, u: g + EPS * u, grads, updates)
        return jax.tree.map(lambda a, u: a + lr * u, p, updates), os2, g2

    results["adamw_only"] = scan_time(
        "AdamW only", adamw_only, (params, opt_state0, grads0)
    )

    # --- derived + rooflines ----------------------------------------------
    flop_gemm = 2.0 * B * K_ * N_
    ideal_gemm_ms = 1e3 * flop_gemm / PEAK_BF16
    chain_bytes = B * P * (4 + 1 + 4)  # read sheet f32, read target u8, write g
    ideal_chain_ms = 1e3 * chain_bytes / PEAK_HBM
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
    print(
        f"step - (fwd_bwd + adamw)         "
        f"{results['full_step'] - results['fwd_bwd'] - results['adamw_only']:7.3f}"
    )
    print("\n--- rooflines ---")
    print(
        f"projection GEMM ideal (bf16 MXU) {ideal_gemm_ms:7.3f} ms "
        f"(measured dX {results['raw_dx_gemm']:.3f}, dW {results['raw_dw_gemm']:.3f})"
    )
    print(
        f"clamp+MSE chain ideal (HBM)      {ideal_chain_ms:7.3f} ms "
        f"(measured {results['chain_only']:.3f})"
    )
    print(
        f"AdamW ideal (HBM, {n_par / 1e6:.1f}M params)  {ideal_adamw_ms:7.3f} ms "
        f"(measured {results['adamw_only']:.3f})"
    )


if __name__ == "__main__":
    main()
