"""Pallas TPU kernel: fused  dW = X^T @ (g*mask)  +  AdamW update of W.

Motivation (measured, RESULTS.md): the train step's fwd+bwd runs at ~5.4 ms
but the optimizer costs ~10 ms — pure HBM traffic over the 123M-param
output projection. The standard pipeline writes dW (492 MB f32) out of the
backward GEMM and immediately re-reads it in the elementwise AdamW pass.
This kernel computes each dW tile on the MXU and applies AdamW to the
corresponding (w, mu, nu) tiles while the gradient tile is still in VMEM —
dW never exists in HBM, saving ~1 GB of traffic per step.

Status (v5e, measured A/B at B=1024): 20 ms vs 14.8 ms for the standard
step — a NEGATIVE result at these shapes. The (k, n) tiling must re-stream
g/out once per K-tile (25x158 MB) and x once per N-tile (50x26 MB), ~3 GB of
extra reads that outweigh the saved dW round trip; the optimizer-state
traffic (2.5 GB r+w) is irreducible either way. The kernel stays available
(and exactly equivalent, see tests/test_fused_step.py) as the base for a
larger-VMEM-tile revision; the default path remains XLA.

Math is exactly the framework's AdamW (torch-parity, model.py:273):

    mu  <- b1*mu + (1-b1)*dW
    nu  <- b2*nu + (1-b2)*dW^2
    w   <- w - lr * (mu_hat / (sqrt(nu_hat) + eps) + wd*w),
           mu_hat = mu/(1-b1^t), nu_hat = nu/(1-b2^t)

The clamp mask (grad passes where 0 < out < 1) is fused from the saved
forward output, so the masked gradient tensor is never materialized either.

Grid: (K/bk, N/bn, M/bm) with the M-contraction innermost; w/mu/nu blocks
have M-independent index maps so Pallas keeps them resident across the
contraction and writes them once per (k, n) tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _kernel(
    scalars_ref,  # SMEM [6]: lr, wd, b1, b2, c1=1/(1-b1^t), c2=1/(1-b2^t)
    x_ref,  # [bm, bk] block of X [M, K]
    g_ref,  # [bm, bn] block of upstream grad [M, N]
    out_ref,  # [bm, bn] block of saved clamped output [M, N]
    w_ref,  # [bk, bn] block of W (in/out via aliasing)
    mu_ref,  # [bk, bn] block of mu (in/out)
    nu_ref,  # [bk, bn] block of nu (in/out)
    w_out_ref,
    mu_out_ref,
    nu_out_ref,
    acc_ref,  # VMEM scratch [bk, bn] f32
    *,
    n_m: int,
    eps: float,
):
    m = pl.program_id(2)

    @pl.when(m == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    o = out_ref[:]
    gm = jnp.where((o > 0.0) & (o < 1.0), g_ref[:], 0.0)
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:].astype(jnp.bfloat16),
        gm.astype(jnp.bfloat16),
        dimension_numbers=(((0,), (0,)), ((), ())),  # contract M
        preferred_element_type=jnp.float32,
    )

    @pl.when(m == n_m - 1)
    def _():
        lr = scalars_ref[0]
        wd = scalars_ref[1]
        b1 = scalars_ref[2]
        b2 = scalars_ref[3]
        c1 = scalars_ref[4]
        c2 = scalars_ref[5]
        dw = acc_ref[:]
        mu = b1 * mu_ref[:].astype(jnp.float32) + (1.0 - b1) * dw
        nu = b2 * nu_ref[:] + (1.0 - b2) * dw * dw
        mu_hat = mu * c1
        nu_hat = nu * c2
        w = w_ref[:]
        w_out_ref[:] = w - lr * (mu_hat / (jnp.sqrt(nu_hat) + eps) + wd * w)
        mu_out_ref[:] = mu.astype(mu_out_ref.dtype)
        nu_out_ref[:] = nu


def fused_dw_adamw(
    x: jax.Array,  # [M, K] f32 activations
    g: jax.Array,  # [M, N] f32 upstream gradient (unmasked)
    out: jax.Array,  # [M, N] f32 saved clamped output (mask source)
    w: jax.Array,  # [K, N] f32
    mu: jax.Array,  # [K, N] f32 or bf16
    nu: jax.Array,  # [K, N] f32
    lr: jax.Array,
    wd: float,
    b1: float,
    b2: float,
    count: jax.Array,  # int32 step count AFTER increment (t)
    eps: float = 1e-8,
    bm: int = 256,
    bk: int = 256,
    bn: int = 384,
    interpret: bool | None = None,
):
    """Returns (new_w, new_mu, new_nu); w/mu/nu buffers are donated.

    ``interpret=None`` auto-selects interpreter mode off-TPU so the op is
    runnable (and testable) on any backend.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m, k = x.shape
    _, n = g.shape
    bm, bk, bn = min(bm, m), min(bk, k), min(bn, n)
    if m % bm or k % bk or n % bn:
        raise ValueError(
            f"shapes ({m},{k},{n}) must divide tiles ({bm},{bk},{bn})"
        )
    t = count.astype(jnp.float32)
    c1 = 1.0 / (1.0 - b1**t)
    c2 = 1.0 / (1.0 - b2**t)
    scalars = jnp.stack(
        [
            lr.astype(jnp.float32),
            jnp.float32(wd),
            jnp.float32(b1),
            jnp.float32(b2),
            c1,
            c2,
        ]
    )
    n_m = _cdiv(m, bm)
    grid = (_cdiv(k, bk), _cdiv(n, bn), n_m)
    out_shapes = (
        jax.ShapeDtypeStruct(w.shape, w.dtype),
        jax.ShapeDtypeStruct(mu.shape, mu.dtype),
        jax.ShapeDtypeStruct(nu.shape, nu.dtype),
    )
    kn_spec = lambda dtype=None: pl.BlockSpec(
        (bk, bn), lambda i, j, mm: (i, j), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_kernel, n_m=n_m, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
            pl.BlockSpec((bm, bk), lambda i, j, mm: (mm, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bn), lambda i, j, mm: (mm, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bn), lambda i, j, mm: (mm, j), memory_space=pltpu.VMEM),
            kn_spec(),
            kn_spec(),
            kn_spec(),
        ],
        out_specs=(kn_spec(), kn_spec(), kn_spec()),
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((bk, bn), jnp.float32)],
        input_output_aliases={4: 0, 5: 1, 6: 2},  # w->new_w, mu->new_mu, nu->new_nu
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=m * k * 2 + 2 * m * n * 4 + 3 * k * n * 4 * 2,
            transcendentals=0,
        ),
    )(scalars, x, g, out, w, mu, nu)
