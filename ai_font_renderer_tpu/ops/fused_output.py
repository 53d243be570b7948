"""Pallas TPU kernel: fused output projection  clamp(x @ W + b).

This layer is 99.99% of the model's parameters and FLOPs (SURVEY §2 C12-C13:
the 6400x19200 projection, model.py:152,196-202). The fusion:

  forward:  one kernel computes the GEMM in bf16 on the MXU with f32
            accumulation and applies bias + clamp(0,1) in the epilogue —
            the pre-activation sheet never round-trips through HBM.
  backward: custom VJP. The clamp mask is recomputed from the saved output
            (grad passes where 0 < out < 1, exactly torch.clamp's rule) and
            fused into the dX/dW GEMM kernels, so the masked gradient tensor
            is never materialized either.

Tiling: grid (M/bm, N/bn, K/bk) with K innermost; the f32 accumulator lives
in a VMEM scratch block (standard Pallas accumulation pattern). Tile sizes
keep double-buffered blocks well under VMEM.

Status (v5e, measured with alternating A/B rounds and chained scalar-fetch
timing): XLA's GEMM with its own fused bias+clamp epilogue runs the full
train step in ~17 ms at batch 1024 vs ~25 ms with this kernel, so
``ModelConfig.use_pallas_output`` stays False by default. The kernel is kept
as a verified-correct (max err 4e-7 vs XLA on TPU) base for deeper fusions
(full MSE-loss epilogue, dW/dX single-pass) and tile tuning.

All shapes here are multiples of 128 by construction (6400 = 50*128,
19200 = 150*128, batch padded to 128); `fused_output` falls back to plain
XLA ops for odd shapes so the op is total.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ------------------------------------------------------------------ forward


def _fwd_kernel(x_ref, w_ref, b_ref, out_ref, acc_ref, *, n_k: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(
        x_ref[:].astype(jnp.bfloat16),
        w_ref[:].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:] = jnp.clip(acc_ref[:] + b_ref[:].astype(jnp.float32), 0.0, 1.0)


def _fwd_pallas(x, w, b, *, bm, bn, bk, interpret=False):
    m, k = x.shape
    _, n = w.shape
    n_k = _cdiv(k, bk)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, n_k=n_k),
        grid=(_cdiv(m, bm), _cdiv(n, bn), n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n * k, bytes_accessed=m * k * 2 + k * n * 2 + m * n * 4,
            transcendentals=0,
        ),
    )(x, w, b.reshape(1, n))


# ----------------------------------------------------------------- backward


def _dx_kernel(g_ref, out_ref, w_ref, dx_ref, acc_ref, *, n_k: int):
    """dX = (g * mask) @ W^T, mask fused from the saved clamped output."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    o = out_ref[:]
    gm = jnp.where((o > 0.0) & (o < 1.0), g_ref[:], 0.0)
    acc_ref[:] += jax.lax.dot_general(
        gm.astype(jnp.bfloat16),
        w_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),  # contract N with N
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == n_k - 1)
    def _():
        dx_ref[:] = acc_ref[:]


def _dx_pallas(g, out, w, *, bm, bk, bn, interpret=False):
    m, n = g.shape
    kdim = w.shape[0]
    n_k = _cdiv(n, bn)  # contraction over N
    return pl.pallas_call(
        functools.partial(_dx_kernel, n_k=n_k),
        grid=(_cdiv(m, bm), _cdiv(kdim, bk), n_k),
        in_specs=[
            pl.BlockSpec((bm, bn), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bn), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (j, kk), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bk), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, kdim), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bk), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(g, out, w)


def _dw_kernel(x_ref, g_ref, out_ref, dw_ref, acc_ref, *, n_k: int):
    """dW = X^T @ (g * mask); db comes from XLA (cheap reduction)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
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

    @pl.when(k == n_k - 1)
    def _():
        dw_ref[:] = acc_ref[:]


def _dw_pallas(x, g, out, *, bk, bn, bm, interpret=False):
    m, kdim = x.shape
    _, n = g.shape
    n_k = _cdiv(m, bm)  # contraction over M
    return pl.pallas_call(
        functools.partial(_dw_kernel, n_k=n_k),
        grid=(_cdiv(kdim, bk), _cdiv(n, bn), n_k),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (kk, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bk, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((kdim, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bk, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, g, out)


# ------------------------------------------------------------------ public


def _supported(x, w):
    m, k = x.shape
    k2, n = w.shape
    return k == k2 and m % 128 == 0 and k % 128 == 0 and n % 128 == 0


def _reference(x, w, b):
    z = (
        jnp.dot(
            x.astype(jnp.bfloat16),
            w.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        + b
    )
    return jnp.clip(z, 0.0, 1.0)


def _impl(x, w, b, interpret):
    if not _supported(x, w):
        return _reference(x, w, b)
    return _fwd_pallas(
        x, w, b, bm=min(256, x.shape[0]), bn=640, bk=640, interpret=interpret
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_output(x, w, b, interpret=False):
    """clamp(x @ W + b, 0, 1) — Pallas-fused on TPU-friendly shapes."""
    return _impl(x, w, b, interpret)


def _fwd_rule(x, w, b, interpret):
    out = _impl(x, w, b, interpret)
    return out, (x, w, out)


def _bwd_rule(interpret, res, g):
    x, w, out = res
    if not _supported(x, w):
        mask = (out > 0.0) & (out < 1.0)
        gm = jnp.where(mask, g, 0.0)
        dx = jnp.dot(
            gm.astype(jnp.bfloat16),
            w.T.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        dw = jnp.dot(
            x.T.astype(jnp.bfloat16),
            gm.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return dx, dw, jnp.sum(gm, axis=0)
    bm = min(256, x.shape[0])
    dx = _dx_pallas(g, out, w, bm=bm, bk=640, bn=640, interpret=interpret)
    dw = _dw_pallas(x, g, out, bk=640, bn=640, bm=bm, interpret=interpret)
    gm = jnp.where((out > 0.0) & (out < 1.0), g, 0.0)
    db = jnp.sum(gm, axis=0)
    return dx, dw, db


fused_output.defvjp(_fwd_rule, _bwd_rule)
