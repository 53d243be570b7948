"""Pallas TPU kernel: fully fused multi-head self-attention block.

Replaces the XLA lowering of the model's attention frontend
(models/font_renderer.py:attention — q/k/v projections, QK^T softmax,
attention-probability dropout, PV, output projection) with ONE kernel per
batch tile. Measured motivation (RESULTS.md step decomposition): at
B=1024, S=100, E=32 the XLA attention core costs ~1.2 ms (+0.8 ms for
probability dropout) because logits/probs ([B,H,S,S] = 41M elements) round-
trip HBM between the einsums, softmax, and dropout. Here they never leave
VMEM:

  * grid over batch tiles (bb rows); per head, logits [bb, S, S] live in a
    VMEM scratch accumulator;
  * softmax statistics in f32, probabilities cast to bf16 for the PV dot —
    the same precision contract as the XLA path;
  * dropout draws from the in-kernel TPU PRNG (pltpu.prng_random_bits),
    seeded per (tile, head) from a caller scalar, so the backward pass can
    REGENERATE the identical mask instead of storing 41M mask bits;
  * custom VJP with full recompute: backward re-runs the forward math in
    VMEM (cheap — the FLOPs are trivial, the win is traffic) and emits
    per-tile partial parameter gradients that XLA sums (E x E = 32 x 32,
    negligible).

Dropout-mask parity note: masks come from the TPU PRNG, not
jax.random.bernoulli, so a training run with this kernel draws different
dropout noise than the XLA path (same keep probability; quantized to
2^-32). Loss trajectories are statistically identical; bit-replay of an
XLA-path run is not a goal (the reference's torch RNG differs from both).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Mosaic's scoped-VMEM allocator defaults to a conservative 16 MB, which
# is what capped round 2's batch tile at 8 rows (fwd stack 91 MB at tile
# 128) and round 3's v2 backward at <8 (16.25 MB at tile 8). The v5e core
# has 128 MB of physical VMEM; raising the limit to 100 MB (leaving ~28 MB
# for the pipeline's own buffers) is the documented escape hatch
# (CompilerParams.vmem_limit_bytes) and unlocks the MXU-sized tiles the
# round-2 negative said were impossible.
_VMEM_LIMIT = 100 * 1024 * 1024


def _head_bits(shape, h, seed_ref, interpret):
    """Per-head uint32 dropout bits. On TPU: the stateful hardware PRNG
    (seeded once per tile; heads consume the stream in order). In interpret
    mode (CPU tests): threefry keyed by (seed, tile, head) — pltpu.prng_*
    has no CPU lowering. Masks differ between backends by design; each
    backend regenerates ITS mask identically in the backward pass."""
    if not interpret:
        return pltpu.prng_random_bits(shape).astype(jnp.uint32)
    key = jax.random.fold_in(
        jax.random.fold_in(jax.random.PRNGKey(seed_ref[0]), pl.program_id(0)), h
    )
    return jax.random.bits(key, shape, jnp.uint32)


def _fwd_kernel(
    seed_ref,  # SMEM [1] int32 dropout seed (ignored when rate == 0)
    x_ref,  # [bb, S, E] bf16
    wq_ref, wk_ref, wv_ref, wo_ref,  # [E, E] f32
    bq_ref, bk_ref, bv_ref, bo_ref,  # [1, E] f32
    out_ref,  # [bb, S, E] bf16
    *,
    heads: int,
    dropout_rate: float,
    thresh: int,
    interpret: bool,
):
    bb, S, E = x_ref.shape
    d = E // heads
    scale = 1.0 / (d ** 0.5)
    x2 = x_ref[:].reshape(bb * S, E)
    dt = x_ref.dtype
    q = jnp.dot(x2, wq_ref[:].astype(dt), preferred_element_type=jnp.float32)
    k = jnp.dot(x2, wk_ref[:].astype(dt), preferred_element_type=jnp.float32)
    v = jnp.dot(x2, wv_ref[:].astype(dt), preferred_element_type=jnp.float32)
    q = (q + bq_ref[0]).reshape(bb, S, E)
    k = (k + bk_ref[0]).reshape(bb, S, E)
    v = (v + bv_ref[0]).reshape(bb, S, E)

    if dropout_rate > 0.0 and not interpret:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))

    outs = []
    for h in range(heads):
        qh = q[:, :, h * d : (h + 1) * d].astype(dt)
        kh = k[:, :, h * d : (h + 1) * d].astype(dt)
        vh = v[:, :, h * d : (h + 1) * d].astype(dt)
        logits = jax.lax.dot_general(
            qh, kh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # [bb, S, T] f32
        m = jnp.max(logits, axis=2, keepdims=True)
        p = jnp.exp(logits - m)
        probs = (p / jnp.sum(p, axis=2, keepdims=True)).astype(dt)
        if dropout_rate > 0.0:
            bits = _head_bits((bb, S, S), h, seed_ref, interpret)
            keep = 1.0 - dropout_rate
            mask = bits < jnp.uint32(thresh)
            probs = jnp.where(mask, probs / keep, jnp.zeros((), dt))
        outs.append(
            jax.lax.dot_general(
                probs, vh,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [bb, S, d]
        )
    attn = jnp.concatenate(outs, axis=2).astype(dt).reshape(bb * S, E)
    out = jnp.dot(attn, wo_ref[:].astype(dt), preferred_element_type=jnp.float32)
    out_ref[:] = (out + bo_ref[0]).reshape(bb, S, E).astype(out_ref.dtype)


def _bwd_kernel(
    seed_ref,
    x_ref,  # [bb, S, E] bf16 (saved input)
    g_ref,  # [bb, S, E] bf16 upstream gradient
    wq_ref, wk_ref, wv_ref, wo_ref,
    bq_ref, bk_ref, bv_ref, bo_ref,
    dx_ref,  # [bb, S, E] bf16
    dwq_ref, dwk_ref, dwv_ref, dwo_ref,  # [1, E, E] f32 per-tile partials
    dbq_ref, dbk_ref, dbv_ref, dbo_ref,  # [1, 1, E] f32 per-tile partials
    *,
    heads: int,
    dropout_rate: float,
    thresh: int,
    interpret: bool,
):
    bb, S, E = x_ref.shape
    d = E // heads
    scale = 1.0 / (d ** 0.5)
    dt = x_ref.dtype
    x2 = x_ref[:].reshape(bb * S, E)
    q = jnp.dot(x2, wq_ref[:].astype(dt), preferred_element_type=jnp.float32)
    k = jnp.dot(x2, wk_ref[:].astype(dt), preferred_element_type=jnp.float32)
    v = jnp.dot(x2, wv_ref[:].astype(dt), preferred_element_type=jnp.float32)
    q = (q + bq_ref[0]).reshape(bb, S, E)
    k = (k + bk_ref[0]).reshape(bb, S, E)
    v = (v + bv_ref[0]).reshape(bb, S, E)

    if dropout_rate > 0.0 and not interpret:
        # Same seeding as forward -> identical per-head mask sequence.
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))

    g2 = g_ref[:].reshape(bb * S, E)
    # d(out proj): out = attn @ wo + bo
    dattn = jnp.dot(
        g2, wo_ref[:].T.astype(dt), preferred_element_type=jnp.float32
    ).reshape(bb, S, E)
    dbo_ref[0, 0] = jnp.sum(g2.astype(jnp.float32), axis=0)

    attn_cols = []  # recomputed attn (pre out-proj), for dwo
    dq_cols, dk_cols, dv_cols = [], [], []
    keep = 1.0 - dropout_rate
    for h in range(heads):
        qh = q[:, :, h * d : (h + 1) * d].astype(dt)
        kh = k[:, :, h * d : (h + 1) * d].astype(dt)
        vh = v[:, :, h * d : (h + 1) * d].astype(dt)
        logits = jax.lax.dot_general(
            qh, kh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        m = jnp.max(logits, axis=2, keepdims=True)
        p = jnp.exp(logits - m)
        probs_sm = p / jnp.sum(p, axis=2, keepdims=True)  # f32, pre-dropout
        if dropout_rate > 0.0:
            bits = _head_bits((bb, S, S), h, seed_ref, interpret)
            mask = bits < jnp.uint32(thresh)
            probs_used = jnp.where(
                mask, probs_sm.astype(dt) / keep, jnp.zeros((), dt)
            )
        else:
            mask = None
            probs_used = probs_sm.astype(dt)

        dout_h = dattn[:, :, h * d : (h + 1) * d].astype(dt)
        attn_cols.append(
            jax.lax.dot_general(
                probs_used, vh,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )
        # dprobs_used = dout @ vh^T
        dprobs = jax.lax.dot_general(
            dout_h, vh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [bb, S, T] f32
        # dvh = probs_used^T @ dout  (contract S)
        dv_cols.append(
            jax.lax.dot_general(
                probs_used, dout_h,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # [bb, T, d]
        )
        if mask is not None:
            dprobs = jnp.where(mask, dprobs / keep, 0.0)
        # softmax backward (f32): dlogits = P * (dP - sum(dP * P))
        inner = jnp.sum(dprobs * probs_sm, axis=2, keepdims=True)
        dlogits = (probs_sm * (dprobs - inner) * scale).astype(dt)
        dq_cols.append(
            jax.lax.dot_general(
                dlogits, kh,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )
        dk_cols.append(
            jax.lax.dot_general(
                dlogits, qh,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )
    attn = jnp.concatenate(attn_cols, axis=2).astype(dt).reshape(bb * S, E)
    dwo_ref[0] = jnp.dot(attn.T, g2, preferred_element_type=jnp.float32)
    dq = jnp.concatenate(dq_cols, axis=2).astype(dt).reshape(bb * S, E)
    dk = jnp.concatenate(dk_cols, axis=2).astype(dt).reshape(bb * S, E)
    dv = jnp.concatenate(dv_cols, axis=2).astype(dt).reshape(bb * S, E)
    dbq_ref[0, 0] = jnp.sum(dq.astype(jnp.float32), axis=0)
    dbk_ref[0, 0] = jnp.sum(dk.astype(jnp.float32), axis=0)
    dbv_ref[0, 0] = jnp.sum(dv.astype(jnp.float32), axis=0)
    dwq_ref[0] = jnp.dot(x2.T, dq, preferred_element_type=jnp.float32)
    dwk_ref[0] = jnp.dot(x2.T, dk, preferred_element_type=jnp.float32)
    dwv_ref[0] = jnp.dot(x2.T, dv, preferred_element_type=jnp.float32)
    dx = (
        jnp.dot(dq, wq_ref[:].T.astype(dt), preferred_element_type=jnp.float32)
        + jnp.dot(dk, wk_ref[:].T.astype(dt), preferred_element_type=jnp.float32)
        + jnp.dot(dv, wv_ref[:].T.astype(dt), preferred_element_type=jnp.float32)
    )
    dx_ref[:] = dx.reshape(bb, S, E).astype(dx_ref.dtype)


def _specs(bb, S, E, n_w):
    """in_specs for (seed, x, [g], weights x4, biases x4)."""
    tile = pl.BlockSpec((bb, S, E), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((E, E), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, E), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return tile, wspec, bspec


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3)
)
def fused_attention(heads, dropout_rate, bb, interpret, x, weights, seed):
    """Fused MHA block. x: [B, S, E] bf16; weights: dict wq/wk/wv/wo/bq/bk/
    bv/bo (f32); seed: int32 scalar (used when dropout_rate > 0).

    Returns [B, S, E] in x.dtype. Differentiable w.r.t. x and weights.
    """
    out, _ = _fwd(heads, dropout_rate, bb, interpret, x, weights, seed)
    return out


def _fwd(heads, dropout_rate, bb, interpret, x, weights, seed):
    B, S, E = x.shape
    bb = min(bb, B)
    assert B % bb == 0, (B, bb)
    thresh = min(int((1.0 - dropout_rate) * 2**32), 2**32 - 1)
    tile, wspec, bspec = _specs(bb, S, E, 4)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    biases2 = {k: weights[k].reshape(1, E) for k in ("bq", "bk", "bv", "bo")}
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel,
            heads=heads,
            dropout_rate=dropout_rate,
            thresh=thresh,
            interpret=interpret,
        ),
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            tile, wspec, wspec, wspec, wspec, bspec, bspec, bspec, bspec,
        ],
        out_specs=tile,
        out_shape=jax.ShapeDtypeStruct((B, S, E), x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # PRNG stream is stateful
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(
        seed_arr, x,
        weights["wq"], weights["wk"], weights["wv"], weights["wo"],
        biases2["bq"], biases2["bk"], biases2["bv"], biases2["bo"],
    )
    return out, (x, weights, seed)


def _bwd(heads, dropout_rate, bb, interpret, res, g):
    x, weights, seed = res
    B, S, E = x.shape
    bb = min(bb, B)
    n_tiles = B // bb
    thresh = min(int((1.0 - dropout_rate) * 2**32), 2**32 - 1)
    tile, wspec, bspec = _specs(bb, S, E, 4)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    biases2 = {k: weights[k].reshape(1, E) for k in ("bq", "bk", "bv", "bo")}
    # Per-tile partial parameter grads, summed by XLA afterwards.
    pw = pl.BlockSpec((1, E, E), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    pb = pl.BlockSpec((1, 1, E), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((B, S, E), x.dtype),  # dx
        *(jax.ShapeDtypeStruct((n_tiles, E, E), jnp.float32) for _ in range(4)),
        *(jax.ShapeDtypeStruct((n_tiles, 1, E), jnp.float32) for _ in range(4)),
    )

    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel,
            heads=heads,
            dropout_rate=dropout_rate,
            thresh=thresh,
            interpret=interpret,
        ),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            tile, tile, wspec, wspec, wspec, wspec,
            bspec, bspec, bspec, bspec,
        ],
        out_specs=(tile, pw, pw, pw, pw, pb, pb, pb, pb),
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(
        seed_arr, x, g.astype(x.dtype),
        weights["wq"], weights["wk"], weights["wv"], weights["wo"],
        biases2["bq"], biases2["bk"], biases2["bv"], biases2["bo"],
    )
    dx = outs[0]
    dwq, dwk, dwv, dwo = (o.sum(axis=0) for o in outs[1:5])
    dbq, dbk, dbv, dbo = (o.sum(axis=(0, 1)) for o in outs[5:9])
    dweights = {
        "wq": dwq, "wk": dwk, "wv": dwv, "wo": dwo,
        "bq": dbq, "bk": dbk, "bv": dbv, "bo": dbo,
    }
    return dx, dweights, None


fused_attention.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# v2: decoupled fwd/bwd tiles via a STORED dropout mask.
#
# Round-2's measured negative (RESULTS.md) traced to one constraint: the
# backward regenerates the dropout mask from the in-kernel PRNG, so the
# fwd/bwd grids must match, and the backward's recompute VMEM (~2 MB/row)
# capped BOTH at 8-row tiles — per-invocation GEMMs of 8x100 rows idle the
# MXU and the 128-deep grid serializes. v2 writes the mask to HBM as a
# uint8 [B, H, S, S] tensor instead (41 MB at flagship shapes — a ~0.1 ms
# round trip at HBM speed, vs the multi-ms cost of tiny tiles). Forward
# then tiles at 64 rows (S x S f32 scratch 2.6 MB/head, in-place softmax),
# backward independently at 16.
# ---------------------------------------------------------------------------


def _fwd2_kernel(
    seed_ref, x_ref,
    wq_ref, wk_ref, wv_ref, wo_ref,
    bq_ref, bk_ref, bv_ref, bo_ref,
    out_ref, mask_ref,  # mask_ref: [bb, heads, S, S] uint8 (1 = keep)
    *, heads, dropout_rate, thresh, interpret,
):
    bb, S, E = x_ref.shape
    d = E // heads
    scale = 1.0 / (d ** 0.5)
    x2 = x_ref[:].reshape(bb * S, E)
    dt = x_ref.dtype
    q = jnp.dot(x2, wq_ref[:].astype(dt), preferred_element_type=jnp.float32)
    k = jnp.dot(x2, wk_ref[:].astype(dt), preferred_element_type=jnp.float32)
    v = jnp.dot(x2, wv_ref[:].astype(dt), preferred_element_type=jnp.float32)
    q = (q + bq_ref[0]).reshape(bb, S, E)
    k = (k + bk_ref[0]).reshape(bb, S, E)
    v = (v + bv_ref[0]).reshape(bb, S, E)

    if dropout_rate > 0.0 and not interpret:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))

    keep = 1.0 - dropout_rate
    outs = []
    for h in range(heads):
        qh = q[:, :, h * d : (h + 1) * d].astype(dt)
        kh = k[:, :, h * d : (h + 1) * d].astype(dt)
        vh = v[:, :, h * d : (h + 1) * d].astype(dt)
        logits = jax.lax.dot_general(
            qh, kh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        m = jnp.max(logits, axis=2, keepdims=True)
        p = jnp.exp(logits - m)
        probs = (p / jnp.sum(p, axis=2, keepdims=True)).astype(dt)
        if dropout_rate > 0.0:
            bits = _head_bits((bb, S, S), h, seed_ref, interpret)
            mask = bits < jnp.uint32(thresh)
            mask_ref[:, h] = mask.astype(jnp.uint8)
            probs = jnp.where(mask, probs / keep, jnp.zeros((), dt))
        outs.append(
            jax.lax.dot_general(
                probs, vh,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )
    attn = jnp.concatenate(outs, axis=2).astype(dt).reshape(bb * S, E)
    out = jnp.dot(attn, wo_ref[:].astype(dt), preferred_element_type=jnp.float32)
    out_ref[:] = (out + bo_ref[0]).reshape(bb, S, E).astype(out_ref.dtype)


def _bwd2_kernel(
    x_ref, g_ref, mask_ref,
    wq_ref, wk_ref, wv_ref, wo_ref,
    bq_ref, bk_ref, bv_ref, bo_ref,
    dx_ref,
    dwq_ref, dwk_ref, dwv_ref, dwo_ref,
    dbq_ref, dbk_ref, dbv_ref, dbo_ref,
    *, heads, dropout_rate, interpret,
):
    bb, S, E = x_ref.shape
    d = E // heads
    scale = 1.0 / (d ** 0.5)
    dt = x_ref.dtype
    x2 = x_ref[:].reshape(bb * S, E)
    q = jnp.dot(x2, wq_ref[:].astype(dt), preferred_element_type=jnp.float32)
    k = jnp.dot(x2, wk_ref[:].astype(dt), preferred_element_type=jnp.float32)
    v = jnp.dot(x2, wv_ref[:].astype(dt), preferred_element_type=jnp.float32)
    q = (q + bq_ref[0]).reshape(bb, S, E)
    k = (k + bk_ref[0]).reshape(bb, S, E)
    v = (v + bv_ref[0]).reshape(bb, S, E)

    g2 = g_ref[:].reshape(bb * S, E)
    dattn = jnp.dot(
        g2, wo_ref[:].T.astype(dt), preferred_element_type=jnp.float32
    ).reshape(bb, S, E)
    dbo_ref[0, 0] = jnp.sum(g2.astype(jnp.float32), axis=0)

    keep = 1.0 - dropout_rate
    attn_cols, dq_cols, dk_cols, dv_cols = [], [], [], []
    for h in range(heads):
        qh = q[:, :, h * d : (h + 1) * d].astype(dt)
        kh = k[:, :, h * d : (h + 1) * d].astype(dt)
        vh = v[:, :, h * d : (h + 1) * d].astype(dt)
        logits = jax.lax.dot_general(
            qh, kh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        m = jnp.max(logits, axis=2, keepdims=True)
        p = jnp.exp(logits - m)
        probs_sm = p / jnp.sum(p, axis=2, keepdims=True)
        if dropout_rate > 0.0:
            mask = mask_ref[:, h] != 0
            probs_used = jnp.where(
                mask, probs_sm.astype(dt) / keep, jnp.zeros((), dt)
            )
        else:
            mask = None
            probs_used = probs_sm.astype(dt)

        dout_h = dattn[:, :, h * d : (h + 1) * d].astype(dt)
        attn_cols.append(
            jax.lax.dot_general(
                probs_used, vh,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )
        dprobs = jax.lax.dot_general(
            dout_h, vh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dv_cols.append(
            jax.lax.dot_general(
                probs_used, dout_h,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )
        if mask is not None:
            dprobs = jnp.where(mask, dprobs / keep, 0.0)
        inner = jnp.sum(dprobs * probs_sm, axis=2, keepdims=True)
        dlogits = (probs_sm * (dprobs - inner) * scale).astype(dt)
        dq_cols.append(
            jax.lax.dot_general(
                dlogits, kh,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )
        dk_cols.append(
            jax.lax.dot_general(
                dlogits, qh,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        )
    attn = jnp.concatenate(attn_cols, axis=2).astype(dt).reshape(bb * S, E)
    dwo_ref[0] = jnp.dot(attn.T, g2, preferred_element_type=jnp.float32)
    dq = jnp.concatenate(dq_cols, axis=2).astype(dt).reshape(bb * S, E)
    dk = jnp.concatenate(dk_cols, axis=2).astype(dt).reshape(bb * S, E)
    dv = jnp.concatenate(dv_cols, axis=2).astype(dt).reshape(bb * S, E)
    dbq_ref[0, 0] = jnp.sum(dq.astype(jnp.float32), axis=0)
    dbk_ref[0, 0] = jnp.sum(dk.astype(jnp.float32), axis=0)
    dbv_ref[0, 0] = jnp.sum(dv.astype(jnp.float32), axis=0)
    dwq_ref[0] = jnp.dot(x2.T, dq, preferred_element_type=jnp.float32)
    dwk_ref[0] = jnp.dot(x2.T, dk, preferred_element_type=jnp.float32)
    dwv_ref[0] = jnp.dot(x2.T, dv, preferred_element_type=jnp.float32)
    dx = (
        jnp.dot(dq, wq_ref[:].T.astype(dt), preferred_element_type=jnp.float32)
        + jnp.dot(dk, wk_ref[:].T.astype(dt), preferred_element_type=jnp.float32)
        + jnp.dot(dv, wv_ref[:].T.astype(dt), preferred_element_type=jnp.float32)
    )
    dx_ref[:] = dx.reshape(bb, S, E).astype(dx_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def fused_attention2(heads, dropout_rate, bb_fwd, bb_bwd, interpret, x, weights, seed):
    """v2 fused MHA: stored-mask dropout, independent fwd/bwd batch tiles.

    Same contract as fused_attention; bb_fwd/bb_bwd are the forward and
    backward batch-tile sizes (the mask tensor decouples them).
    """
    out, _ = _fwd2(heads, dropout_rate, bb_fwd, bb_bwd, interpret, x, weights, seed)
    return out


def _fwd2(heads, dropout_rate, bb_fwd, bb_bwd, interpret, x, weights, seed):
    B, S, E = x.shape
    bb = min(bb_fwd, B)
    assert B % bb == 0, (B, bb)
    thresh = min(int((1.0 - dropout_rate) * 2**32), 2**32 - 1)
    tile, wspec, bspec = _specs(bb, S, E, 4)
    mspec = pl.BlockSpec(
        (bb, heads, S, S), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    biases2 = {k: weights[k].reshape(1, E) for k in ("bq", "bk", "bv", "bo")}
    out, mask = pl.pallas_call(
        functools.partial(
            _fwd2_kernel,
            heads=heads,
            dropout_rate=dropout_rate,
            thresh=thresh,
            interpret=interpret,
        ),
        grid=(B // bb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            tile, wspec, wspec, wspec, wspec, bspec, bspec, bspec, bspec,
        ],
        out_specs=(tile, mspec),
        out_shape=(
            jax.ShapeDtypeStruct((B, S, E), x.dtype),
            jax.ShapeDtypeStruct((B, heads, S, S), jnp.uint8),
        ),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # PRNG stream is stateful
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(
        seed_arr, x,
        weights["wq"], weights["wk"], weights["wv"], weights["wo"],
        biases2["bq"], biases2["bk"], biases2["bv"], biases2["bo"],
    )
    return out, (x, weights, mask)


def _bwd2(heads, dropout_rate, bb_fwd, bb_bwd, interpret, res, g):
    x, weights, mask = res
    B, S, E = x.shape
    bb = min(bb_bwd, B)
    n_tiles = B // bb
    tile, wspec, bspec = _specs(bb, S, E, 4)
    mspec = pl.BlockSpec(
        (bb, heads, S, S), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    biases2 = {k: weights[k].reshape(1, E) for k in ("bq", "bk", "bv", "bo")}
    pw = pl.BlockSpec((1, E, E), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    pb = pl.BlockSpec((1, 1, E), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((B, S, E), x.dtype),
        *(jax.ShapeDtypeStruct((n_tiles, E, E), jnp.float32) for _ in range(4)),
        *(jax.ShapeDtypeStruct((n_tiles, 1, E), jnp.float32) for _ in range(4)),
    )
    outs = pl.pallas_call(
        functools.partial(
            _bwd2_kernel,
            heads=heads,
            dropout_rate=dropout_rate,
            interpret=interpret,
        ),
        grid=(n_tiles,),
        in_specs=[
            tile, tile, mspec, wspec, wspec, wspec, wspec,
            bspec, bspec, bspec, bspec,
        ],
        out_specs=(tile, pw, pw, pw, pw, pb, pb, pb, pb),
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),  # no PRNG in the backward
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
    )(
        x, g.astype(x.dtype), mask,
        weights["wq"], weights["wk"], weights["wv"], weights["wo"],
        biases2["bq"], biases2["bk"], biases2["bv"], biases2["bo"],
    )
    dx = outs[0]
    dwq, dwk, dwv, dwo = (o.sum(axis=0) for o in outs[1:5])
    dbq, dbk, dbv, dbo = (o.sum(axis=(0, 1)) for o in outs[5:9])
    dweights = {
        "wq": dwq, "wk": dwk, "wv": dwv, "wo": dwo,
        "bq": dbq, "bk": dbk, "bv": dbv, "bo": dbo,
    }
    return dx, dweights, None


fused_attention2.defvjp(_fwd2, _bwd2)
