"""Fused training step + whole-epoch device loops.

The reference's inner loop (model.py:291-311) is per-batch Python: zero_grad,
forward, MSE, backward, step, with host<->device transfers every batch and a
32-worker DataLoader feeding it. Here the entire epoch is ONE device call:

  * MSE -> value_and_grad -> AdamW update in a single jitted function with
    donated buffers (params/optimizer state update in place in HBM);
  * `lax.scan` over the epoch's batch indices, gathering each batch from the
    device-resident corpus (see fontgen/dataset.py) — zero host round-trips,
    zero input pipeline overhead;
  * dropout keys derived per-step by `fold_in` (deterministic, replayable).

AdamW matches torch exactly (model.py:273: lr=1e-3, betas=(0.9,0.99),
eps=1e-8, weight_decay=5e-4 applied to all parameters):
    p <- p - lr * (m_hat / (sqrt(v_hat) + eps) + wd * p)
with the learning rate passed in as a runtime scalar so the host-side
plateau scheduler never triggers recompilation.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..config import ModelConfig, TrainConfig
from ..models import font_renderer


class TrainState(NamedTuple):
    params: dict
    opt_state: tuple


class FusedTrainState(NamedTuple):
    """State for the fused-out_w path: out_w's AdamW moments live outside
    optax so the Pallas dW+AdamW kernel can update them in place."""

    params: dict
    opt_state: tuple  # optax state over params EXCEPT out_w
    mu_w: jax.Array
    nu_w: jax.Array
    count: jax.Array  # int32 shared step counter (t)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.scale_by_adam(
            b1=cfg.adam_b1,
            b2=cfg.adam_b2,
            eps=1e-8,
            mu_dtype=jnp.bfloat16 if cfg.adam_mu_bf16 else None,
        ),
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale(-1.0),
    )


def init_state(key: jax.Array, mcfg: ModelConfig, tcfg: TrainConfig) -> TrainState:
    params = font_renderer.init(key, mcfg)
    opt_state = make_optimizer(tcfg).init(params)
    return TrainState(params, opt_state)


def mse_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Plain MSE over all pixels (model.py:269-270), f32."""
    d = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(d * d)


def loss_fn(params, codes, targets, mcfg, key, train):
    pred = font_renderer.apply(params, codes, mcfg, train=train, key=key)
    return mse_loss(pred, targets)


@partial(
    jax.jit, static_argnames=("mcfg", "tcfg"), donate_argnames=("state",)
)
def train_step(
    state: TrainState,
    codes: jax.Array,
    targets: jax.Array,
    lr: jax.Array,
    key: jax.Array,
    mcfg: ModelConfig,
    tcfg: TrainConfig,
) -> tuple[TrainState, jax.Array]:
    """One optimizer step. `lr` is a traced scalar (no recompiles on decay)."""
    loss, grads = jax.value_and_grad(loss_fn)(
        state.params, codes, targets, mcfg, key, True
    )
    opt = make_optimizer(tcfg)
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    updates = jax.tree.map(lambda u: lr * u, updates)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state), loss


def _handrolled_step(state: TrainState, codes, targets, lr, key, mcfg, tcfg):
    """Standard-state step with a hand-rolled projection backward.

    Round-3 roofline finding (RESULTS.md, tools/roofline_bwd.py): under
    plain autodiff the dX GEMM consumes the f32 loss cotangent and runs at
    2.3x its bf16 roofline (2.93 vs 1.28 ms), and the round-2
    ``bf16_cotangent`` custom-VJP fix measured NEGATIVE because the VJP
    boundary kept the clamp-mask/MSE chain from fusing into the GEMMs.
    This step removes the boundary entirely: the projection + clamp + MSE
    forward AND backward are written out by hand (the same spelling the
    fused-kernel path uses, train/step.py:_fused_step), so the masked
    cotangent is computed once, cast to bf16, and feeds BOTH projection
    backward GEMMs as native bf16 x bf16 MXU work. The frontend still
    differentiates through jax.vjp; out_w's gradient goes through plain
    XLA + optax (no Pallas kernel — that part of the fused path was the
    measured regression).

    Same optimizer math as train_step; the only numerics delta is the
    bf16 rounding of the projection cotangent. Opt-in:
    TrainConfig.handrolled_bwd.
    """
    if mcfg.decoder != "linear" or mcfg.leaky_clamp > 0.0 or mcfg.use_pallas_output:
        raise ValueError(
            "handrolled_bwd hand-codes the linear projection + hard-clamp "
            "backward; it requires decoder='linear', leaky_clamp=0, and "
            "use_pallas_output=False"
        )
    params = state.params
    rest = {k: v for k, v in params.items() if k != "out_w"}

    def front(rest_params):
        return font_renderer.frontend(rest_params, codes, mcfg, train=True, key=key)

    # VERDICT-r4 non-kernel lever on the traffic-bound frontend backward:
    # rematerialize instead of storing residuals. "dots" keeps GEMM outputs
    # and recomputes the softmax/dropout/LN elementwise chains in the
    # backward (their residuals — attention probs foremost — are the HBM
    # round-trip the roofline table attributes the frontend gap to);
    # "full" saves nothing and replays the whole frontend. PRNG-keyed
    # dropout replays deterministically, so gradients are unchanged.
    if tcfg.remat_frontend == "dots":
        front = jax.checkpoint(
            front,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        )
    elif tcfg.remat_frontend == "full":
        front = jax.checkpoint(front)
    elif tcfg.remat_frontend != "none":
        raise ValueError(
            f"remat_frontend must be none|dots|full, got {tcfg.remat_frontend!r}"
        )

    flat, vjp = jax.vjp(front, rest)
    dt = jnp.bfloat16 if mcfg.bf16_matmul else jnp.float32
    flat_dt = flat.astype(dt)
    pre = (
        jnp.dot(
            flat_dt, params["out_w"].astype(dt), preferred_element_type=jnp.float32
        )
        + params["out_b"]
    )
    out = jnp.clip(pre, 0.0, 1.0)
    tflat = targets.reshape(targets.shape[0], -1).astype(jnp.float32)
    d = out - tflat
    loss = jnp.mean(d * d)
    gm = jnp.where((out > 0.0) & (out < 1.0), (2.0 / d.size) * d, 0.0)
    gm_dt = gm.astype(dt)  # ONE cast feeds both backward GEMMs
    dflat = jnp.dot(
        gm_dt, params["out_w"].T.astype(dt), preferred_element_type=jnp.float32
    )
    (grads_rest,) = vjp(dflat)
    grads = dict(grads_rest)
    grads["out_b"] = jnp.sum(gm, axis=0)
    grads["out_w"] = jax.lax.dot_general(
        flat_dt, gm_dt, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    opt = make_optimizer(tcfg)
    updates, opt_state = opt.update(grads, state.opt_state, params)
    updates = jax.tree.map(lambda u: lr * u, updates)
    new_params = optax.apply_updates(params, updates)
    return TrainState(new_params, opt_state), loss


def init_fused_state(
    key: jax.Array, mcfg: ModelConfig, tcfg: TrainConfig
) -> FusedTrainState:
    if mcfg.decoder != "linear":
        raise ValueError(
            "fused_dw_adamw fuses the linear decoder's out_w update; "
            f"decoder={mcfg.decoder!r} has no out_w"
        )
    if mcfg.leaky_clamp > 0.0:
        raise ValueError(
            "the fused step hand-codes the hard clamp's gradient mask "
            "(train/step.py:_fused_step); leaky_clamp requires the "
            "standard step"
        )
    params = font_renderer.init(key, mcfg)
    rest = {k: v for k, v in params.items() if k != "out_w"}
    opt_state = make_optimizer(tcfg).init(rest)
    mu_dtype = jnp.bfloat16 if tcfg.adam_mu_bf16 else jnp.float32
    return FusedTrainState(
        params=params,
        opt_state=opt_state,
        mu_w=jnp.zeros(params["out_w"].shape, mu_dtype),
        nu_w=jnp.zeros(params["out_w"].shape, jnp.float32),
        count=jnp.zeros((), jnp.int32),
    )


def _fused_step(state: FusedTrainState, codes, targets, lr, key, mcfg, tcfg):
    """One step with the dW+AdamW Pallas fusion on the output projection.

    Mathematically identical to the standard step: same forward, same MSE,
    same AdamW; the only difference is that out_w's gradient never round-
    trips through HBM (ops/fused_dw_adamw.py).
    """
    from ..ops.fused_dw_adamw import fused_dw_adamw

    params = state.params
    rest = {k: v for k, v in params.items() if k != "out_w"}

    def front(rest_params):
        # frontend never touches out_w/out_b; differentiating w.r.t. the
        # rest-dict keeps the giant projection out of autodiff entirely.
        return font_renderer.frontend(rest_params, codes, mcfg, train=True, key=key)

    flat, vjp = jax.vjp(front, rest)
    dt = jnp.bfloat16 if mcfg.bf16_matmul else jnp.float32
    flat_dt = flat.astype(dt)
    pre = (
        jnp.dot(
            flat_dt,
            params["out_w"].astype(dt),
            preferred_element_type=jnp.float32,
        )
        + params["out_b"]
    )
    out = jnp.clip(pre, 0.0, 1.0)
    tflat = targets.reshape(targets.shape[0], -1).astype(jnp.float32)
    d = out - tflat
    loss = jnp.mean(d * d)
    g = (2.0 / d.size) * d  # dL/dout, unmasked
    gm = jnp.where((out > 0.0) & (out < 1.0), g, 0.0)
    gm_dt = gm.astype(dt)  # shared by the dX GEMM and the fused dW kernel
    dflat = jnp.dot(
        gm_dt, params["out_w"].T.astype(dt), preferred_element_type=jnp.float32
    )
    (grads_rest,) = vjp(dflat)
    grads_rest = dict(grads_rest)
    grads_rest["out_b"] = jnp.sum(gm, axis=0)

    # Rest of the parameters (13K params + out_b): plain optax AdamW.
    opt = make_optimizer(tcfg)
    updates, opt_state = opt.update(grads_rest, state.opt_state, rest)
    updates = jax.tree.map(lambda u: lr * u, updates)
    new_rest = optax.apply_updates(rest, updates)

    # out_w (122.9M params): fused dW GEMM + AdamW, no HBM gradient. The
    # bf16 masked gradient and bf16 activations are the SAME tensors the
    # fwd/dX GEMMs consume, so the kernel streams half the round-1 bytes.
    count = state.count + 1
    new_w, new_mu, new_nu = fused_dw_adamw(
        flat_dt,
        gm_dt,
        params["out_w"],
        state.mu_w,
        state.nu_w,
        lr,
        tcfg.weight_decay,
        tcfg.adam_b1,
        tcfg.adam_b2,
        count,
    )
    new_params = {**new_rest, "out_w": new_w}
    return (
        FusedTrainState(new_params, opt_state, new_mu, new_nu, count),
        loss,
    )


@partial(jax.jit, static_argnames=("mcfg", "tcfg"), donate_argnames=("state",))
def train_step_fused(
    state: FusedTrainState,
    codes: jax.Array,
    targets: jax.Array,
    lr: jax.Array,
    key: jax.Array,
    mcfg: ModelConfig,
    tcfg: TrainConfig,
) -> tuple[FusedTrainState, jax.Array]:
    return _fused_step(state, codes, targets, lr, key, mcfg, tcfg)


@partial(jax.jit, static_argnames=("mcfg", "tcfg"), donate_argnames=("state",))
def train_eval_epoch_fused(
    state: FusedTrainState,
    codes_all: jax.Array,
    targets_all: jax.Array,
    batch_idx: jax.Array,
    val_batch_idx: jax.Array,
    val_weights: jax.Array,
    lr: jax.Array,
    key: jax.Array,
    mcfg: ModelConfig,
    tcfg: TrainConfig,
) -> tuple[FusedTrainState, jax.Array, jax.Array]:
    """Fused-kernel variant of train_eval_epoch: one dispatch per epoch."""

    def step(carry, idx):
        st, k = carry
        k, sub = jax.random.split(k)
        codes = jnp.take(codes_all, idx, axis=0)
        targets = jnp.take(targets_all, idx, axis=0).astype(jnp.float32) / 255.0
        st, loss = _fused_step(st, codes, targets, lr, sub, mcfg, tcfg)
        return (st, k), loss

    (state, _), losses = jax.lax.scan(step, (state, key), batch_idx)
    val_loss = _eval_scan(
        state.params, codes_all, targets_all, val_batch_idx, val_weights, mcfg
    )
    return state, jnp.mean(losses), val_loss


def _train_scan(state, codes_all, targets_all, batch_idx, lr, key, mcfg, tcfg):
    opt = make_optimizer(tcfg)

    def step(carry, idx):
        st, k = carry
        k, sub = jax.random.split(k)
        codes = jnp.take(codes_all, idx, axis=0)
        targets = jnp.take(targets_all, idx, axis=0).astype(jnp.float32) / 255.0
        if tcfg.handrolled_bwd:
            st, loss = _handrolled_step(st, codes, targets, lr, sub, mcfg, tcfg)
            return (st, k), loss
        loss, grads = jax.value_and_grad(loss_fn)(
            st.params, codes, targets, mcfg, sub, True
        )
        updates, opt_state = opt.update(grads, st.opt_state, st.params)
        updates = jax.tree.map(lambda u: lr * u, updates)
        params = optax.apply_updates(st.params, updates)
        return (TrainState(params, opt_state), k), loss

    (state, _), losses = jax.lax.scan(step, (state, key), batch_idx)
    return state, jnp.mean(losses)


def _eval_scan(params, codes_all, targets_all, batch_idx, weights, mcfg):
    def step(carry, inp):
        idx, w = inp
        codes = jnp.take(codes_all, idx, axis=0)
        targets = jnp.take(targets_all, idx, axis=0).astype(jnp.float32) / 255.0
        pred = font_renderer.apply(params, codes, mcfg, train=False)
        per_sample = jnp.mean((pred - targets) ** 2, axis=(1, 2), dtype=jnp.float32)
        return carry, (jnp.sum(per_sample * w), jnp.sum(w))

    _, (sums, counts) = jax.lax.scan(step, None, (batch_idx, weights))
    return jnp.sum(sums) / jnp.maximum(jnp.sum(counts), 1.0)


@partial(
    jax.jit,
    static_argnames=("mcfg", "tcfg"),
    donate_argnames=("state",),
)
def train_epoch(
    state: TrainState,
    codes_all: jax.Array,  # int32 [N, max_chars] device-resident
    targets_all: jax.Array,  # uint8 [N, H, W] device-resident
    batch_idx: jax.Array,  # int32 [steps, B] shuffled sample indices
    lr: jax.Array,
    key: jax.Array,
    mcfg: ModelConfig,
    tcfg: TrainConfig,
) -> tuple[TrainState, jax.Array]:
    """A full training epoch as one `lax.scan` — a single device dispatch.

    Returns (new_state, mean train loss over the epoch's batches), matching
    the reference's avg_train_loss (model.py:333).
    """
    return _train_scan(
        state, codes_all, targets_all, batch_idx, lr, key, mcfg, tcfg
    )


@partial(
    jax.jit,
    static_argnames=("mcfg", "tcfg"),
    donate_argnames=("state",),
)
def train_eval_epoch(
    state: TrainState,
    codes_all: jax.Array,
    targets_all: jax.Array,
    batch_idx: jax.Array,
    val_batch_idx: jax.Array,
    val_weights: jax.Array,
    lr: jax.Array,
    key: jax.Array,
    mcfg: ModelConfig,
    tcfg: TrainConfig,
) -> tuple[TrainState, jax.Array, jax.Array]:
    """Training epoch + validation pass fused into ONE device dispatch."""
    state, train_loss = _train_scan(
        state, codes_all, targets_all, batch_idx, lr, key, mcfg, tcfg
    )
    val_loss = _eval_scan(
        state.params, codes_all, targets_all, val_batch_idx, val_weights, mcfg
    )
    return state, train_loss, val_loss


@partial(jax.jit, static_argnames=("mcfg",))
def eval_epoch(
    params: dict,
    codes_all: jax.Array,
    targets_all: jax.Array,
    batch_idx: jax.Array,  # int32 [steps, B], padded with repeats at the tail
    weights: jax.Array,  # f32 [steps, B], 0 for padded entries
    mcfg: ModelConfig,
) -> jax.Array:
    """Validation pass (no dropout), one device call.

    Reports the sample-weighted mean MSE. (The reference averages per-batch
    means with a ragged final batch, model.py:334, which overweights the
    remainder; sample weighting is the principled equivalent and identical
    when batches divide evenly.)
    """
    return _eval_scan(params, codes_all, targets_all, batch_idx, weights, mcfg)
