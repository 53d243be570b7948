"""Pallas TPU kernel: fused  dW = X^T @ gm  +  AdamW update of W.

Motivation (measured, RESULTS.md): the train step's fwd+bwd runs at ~5.4 ms
but the optimizer costs ~10 ms — pure HBM traffic over the 123M-param
output projection. The standard pipeline writes dW (492 MB f32) out of the
backward GEMM and immediately re-reads it in the elementwise AdamW pass.
This kernel computes each dW tile on the MXU and applies AdamW to the
corresponding (w, mu, nu) tiles while the gradient tile is still in VMEM —
dW never exists in HBM, saving ~1 GB of traffic per step.

Round-1 version was a measured NEGATIVE (20 vs 14.8 ms): it took f32 g plus
the saved forward output as the mask source and tiled (bk=256, bn=384), so
the (k, n) grid re-streamed ~5.3 GB (g AND out once per K-tile, x once per
N-tile). Round-2 revision per the ROADMAP analysis:

  * inputs are bf16 and PRE-MASKED: the caller already materializes the
    masked gradient `gm` for the dX GEMM and the bf16 activations for the
    forward GEMM, so passing them here is free — halves both streams and
    removes the `out` mask stream entirely;
  * larger K tiles (bk=640 at flagship shapes; VMEM caps the product) cut
    the gm re-stream to K/bk=10 passes (393 MB) and the bf16 x stream to
    N/bn=50 x 13 MB (655 MB) — ~1 GB vs 5.3 GB;
  * optimizer-state traffic (w/mu/nu read+write ~2.5 GB) is irreducible
    and the same for both paths.

Math is exactly the framework's AdamW (torch-parity, model.py:273):

    mu  <- b1*mu + (1-b1)*dW
    nu  <- b2*nu + (1-b2)*dW^2
    w   <- w - lr * (mu_hat / (sqrt(nu_hat) + eps) + wd*w),
           mu_hat = mu/(1-b1^t), nu_hat = nu/(1-b2^t)

dW is computed in bf16 x bf16 -> f32 MXU dots — the identical precision the
standard XLA path uses for its dW GEMM under ``bf16_matmul`` (train/step.py).

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
    x_ref,  # [bm, bk] block of X [M, K] (bf16)
    g_ref,  # [bm, bn] block of MASKED upstream grad [M, N] (bf16)
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

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:],
        g_ref[:],
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
    x: jax.Array,  # [M, K] bf16 (or f32) activations
    gm: jax.Array,  # [M, N] bf16 (or f32) MASKED upstream gradient
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
    bk: int = 640,
    bn: int = 384,
    interpret: bool | None = None,
):
    """Returns (new_w, new_mu, new_nu); w/mu/nu buffers are donated.

    ``interpret=None`` auto-selects interpreter mode off-TPU so the op is
    runnable (and testable) on any backend.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    x = x.astype(jnp.bfloat16)
    gm = gm.astype(jnp.bfloat16)
    m, k = x.shape
    _, n = gm.shape
    bm, bk, bn = min(bm, m), min(bk, k), min(bn, n)
    if m % bm or k % bk or n % bn:
        # Fall back to the largest dividing tile (shapes in tests are small
        # powers of two; flagship shapes divide the defaults exactly).
        bk = next(t for t in (bk, 512, 256, 128, k) if k % t == 0)
        bn = next(t for t in (bn, 512, 384, 256, 128, n) if n % t == 0)
        bm = next(t for t in (bm, 128, 64, m) if m % t == 0)
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
    kn_spec = lambda: pl.BlockSpec(
        (bk, bn), lambda i, j, mm: (i, j), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_kernel, n_m=n_m, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scalars
            pl.BlockSpec((bm, bk), lambda i, j, mm: (mm, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bn), lambda i, j, mm: (mm, j), memory_space=pltpu.VMEM),
            kn_spec(),
            kn_spec(),
            kn_spec(),
        ],
        out_specs=(kn_spec(), kn_spec(), kn_spec()),
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((bk, bn), jnp.float32)],
        input_output_aliases={3: 0, 4: 1, 5: 2},  # w->new_w, mu->new_mu, nu->new_nu
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k,
            bytes_accessed=(n // bn) * m * k * 2
            + (k // bk) * m * n * 2
            + 2 * k * n * (4 + 4 + mu.dtype.itemsize),
            transcendentals=0,
        ),
    )(scalars, x, gm, w, mu, nu)
