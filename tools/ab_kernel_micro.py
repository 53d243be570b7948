"""Microbench: fused dW+AdamW kernel alone vs XLA dW GEMM + AdamW alone.

Flagship shapes: X [1024, 6400] bf16, gm [1024, 19200] bf16, W/mu/nu
[6400, 19200]. Chained timing: each iteration feeds the previous w back in.
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp

from ai_font_renderer_tpu.ops.fused_dw_adamw import fused_dw_adamw

M, K, N = 1024, 6400, 19200


def timeit(label, fn, x, gm, w, mu, nu, iters=10):
    """fn(x, gm, w, mu, nu) -> (w', mu', nu'), with w/mu/nu donated; the
    state chain makes every iteration data-dependent on the previous."""
    o = fn(x, gm, jnp.copy(w), jnp.copy(mu), jnp.copy(nu))  # compile/warm
    jax.block_until_ready(o)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fn(x, gm, *o)
        float(jax.tree.leaves(o)[0].ravel()[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {1e3 * best / iters:.2f} ms")
    return best


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (M, K), jnp.bfloat16)
    gm = jax.random.normal(key, (M, N), jnp.bfloat16) * 1e-4
    w = jax.random.normal(key, (K, N), jnp.float32) * 0.01
    mu = jnp.zeros((K, N), jnp.bfloat16)
    nu = jnp.zeros((K, N), jnp.float32)
    lr = jnp.float32(1e-3)
    count = jnp.int32(3)

    tiles = [(256, 640, 384), (256, 640, 768), (128, 1280, 384),
             (512, 320, 384), (256, 320, 768), (1024, 640, 384)]
    if len(sys.argv) > 1:
        tiles = [tuple(map(int, sys.argv[1:4]))]

    @functools.partial(jax.jit, donate_argnums=(2, 3, 4))
    def xla_path(x, gm, w, mu, nu):
        dw = jax.lax.dot_general(
            x, gm, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        b1, b2, wd, eps = 0.9, 0.99, 5e-4, 1e-8
        mu2 = b1 * mu.astype(jnp.float32) + (1 - b1) * dw
        nu2 = b2 * nu + (1 - b2) * dw * dw
        c1 = 1.0 / (1.0 - b1 ** count.astype(jnp.float32))
        c2 = 1.0 / (1.0 - b2 ** count.astype(jnp.float32))
        w2 = w - lr * (mu2 * c1 / (jnp.sqrt(nu2 * c2) + eps) + wd * w)
        return w2, mu2.astype(jnp.bfloat16), nu2

    timeit("XLA dW GEMM + AdamW (donated)", xla_path, x, gm, w, mu, nu)

    for bm, bk, bn in tiles:
        try:
            fn = jax.jit(
                lambda x, gm, w, mu, nu, bm=bm, bk=bk, bn=bn: fused_dw_adamw(
                    x, gm, w, mu, nu, lr, 5e-4, 0.9, 0.99, count,
                    bm=bm, bk=bk, bn=bn,
                ),
                donate_argnums=(2, 3, 4),
            )
            timeit(f"fused kernel bm={bm} bk={bk} bn={bn}", fn, x, gm, w, mu, nu)
        except Exception as e:
            print(f"tiles ({bm},{bk},{bn}) failed: {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()


# --- experimental variant: x pre-transposed [K, M] to avoid the in-kernel
# transpose of the contraction operand ---------------------------------
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_xt(scalars_ref, xt_ref, g_ref, w_ref, mu_ref, nu_ref,
               w_out_ref, mu_out_ref, nu_out_ref, acc_ref, *, n_m, eps):
    m = pl.program_id(2)

    @pl.when(m == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        xt_ref[:], g_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(m == n_m - 1)
    def _():
        lr, wd, b1, b2, c1, c2 = [scalars_ref[i] for i in range(6)]
        dw = acc_ref[:]
        mu = b1 * mu_ref[:].astype(jnp.float32) + (1.0 - b1) * dw
        nu = b2 * nu_ref[:] + (1.0 - b2) * dw * dw
        w = w_ref[:]
        w_out_ref[:] = w - lr * (mu * c1 / (jnp.sqrt(nu * c2) + eps) + wd * w)
        mu_out_ref[:] = mu.astype(mu_out_ref.dtype)
        nu_out_ref[:] = nu


def fused_xt(xt, gm, w, mu, nu, lr, count, bm=1024, bk=640, bn=384):
    import functools as ft
    k, m = xt.shape
    _, n = gm.shape
    t = count.astype(jnp.float32)
    c1 = 1.0 / (1.0 - 0.9 ** t)
    c2 = 1.0 / (1.0 - 0.99 ** t)
    scalars = jnp.stack([lr, jnp.float32(5e-4), jnp.float32(0.9),
                         jnp.float32(0.99), c1, c2])
    n_m = m // bm
    kn = lambda: pl.BlockSpec((bk, bn), lambda i, j, mm: (i, j), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        ft.partial(_kernel_xt, n_m=n_m, eps=1e-8),
        grid=(k // bk, n // bn, n_m),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bk, bm), lambda i, j, mm: (i, mm), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bn), lambda i, j, mm: (mm, j), memory_space=pltpu.VMEM),
            kn(), kn(), kn(),
        ],
        out_specs=(kn(), kn(), kn()),
        out_shape=(jax.ShapeDtypeStruct(w.shape, w.dtype),
                   jax.ShapeDtypeStruct(mu.shape, mu.dtype),
                   jax.ShapeDtypeStruct(nu.shape, nu.dtype)),
        scratch_shapes=[pltpu.VMEM((bk, bn), jnp.float32)],
        input_output_aliases={3: 0, 4: 1, 5: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(scalars, xt, gm, w, mu, nu)


def main_xt():
    key = jax.random.PRNGKey(0)
    xt = jax.random.normal(key, (K, M), jnp.bfloat16)
    gm = jax.random.normal(key, (M, N), jnp.bfloat16) * 1e-4
    w = jax.random.normal(key, (K, N), jnp.float32) * 0.01
    mu = jnp.zeros((K, N), jnp.bfloat16)
    nu = jnp.zeros((K, N), jnp.float32)
    lr = jnp.float32(1e-3)
    count = jnp.int32(3)
    for bm in (1024,):
        for bn in (384,):
            fn = jax.jit(lambda a, b, c, d, e: fused_xt(a, b, c, d, e, lr, count, bm=bm, bn=bn),
                         donate_argnums=(2, 3, 4))
            timeit(f"fused XT bm={bm} bn={bn}", fn, xt, gm, w, mu, nu)


if __name__ == "__main__" and len(sys.argv) > 4 and sys.argv[4] == "xt":
    main_xt()
