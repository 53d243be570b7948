"""Sharding rules: which parameter/batch axes live on which mesh axis.

Placement logic (SURVEY §7 step 6):

  * ``out_w`` [6400, 19200] — 99.99% of all parameters — shards its OUTPUT
    dimension over the ``model`` axis (column parallelism): each device
    computes a [B/data, 19200/model] slice of the sheet; no collective is
    needed in the forward for the GEMM itself, and the MSE reduce becomes a
    psum XLA inserts automatically.
  * ``out_b`` shards with it; every other parameter (~13K x 32 scale) is
    replicated — far below the cost of sharding bookkeeping.
  * batches shard over ``data``; the optimizer states inherit parameter
    shardings (optax states are parameter-shaped pytrees).
  * the device-resident corpus is replicated so on-device batch gathers are
    local; at 2.9 GB (uint8 targets) this fits every TPU HBM comfortably.

All placement is data movement only — the jitted step functions themselves
are unchanged; GSPMD propagates these shardings through the whole graph.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def param_spec(name: str) -> P:
    if name == "out_w":
        return P(None, MODEL_AXIS)
    if name == "out_b":
        return P(MODEL_AXIS)
    return P()


def param_shardings(mesh: Mesh, params: dict) -> dict:
    return {k: NamedSharding(mesh, param_spec(k)) for k in params}


def shard_params(mesh: Mesh, params: dict) -> dict:
    return {
        k: jax.device_put(v, NamedSharding(mesh, param_spec(k)))
        for k, v in params.items()
    }


def shard_state(mesh: Mesh, state):
    """Place a TrainState/FusedTrainState: params by rule, moments like params.

    optax states are nested tuples whose param-shaped subtrees are dicts
    keyed like ``params`` (scale_by_adam's mu/nu); those inherit the
    parameter shardings so the 123M-param moments shard with ``out_w``.
    Everything else (step counters) replicates. FusedTrainState's explicit
    out_w moments (mu_w/nu_w) shard exactly like out_w itself.
    """
    from ..train.step import FusedTrainState, TrainState

    keys = set(state.params)
    # FusedTrainState's optax state covers every param EXCEPT out_w (out_w's
    # moments live in mu_w/nu_w); its moment dicts are keyed accordingly.
    rest_keys = keys - {"out_w"}

    def go(tree):
        if isinstance(tree, dict) and set(tree) in (keys, rest_keys):
            return {
                k: jax.device_put(v, NamedSharding(mesh, param_spec(k)))
                for k, v in tree.items()
            }
        if isinstance(tree, dict):
            return {k: go(v) for k, v in tree.items()}
        if isinstance(tree, tuple) and hasattr(tree, "_fields"):
            return type(tree)(*(go(v) for v in tree))
        if isinstance(tree, (list, tuple)):
            return type(tree)(go(v) for v in tree)
        return jax.device_put(tree, NamedSharding(mesh, P()))

    if isinstance(state, FusedTrainState):
        w_sharding = NamedSharding(mesh, param_spec("out_w"))
        return FusedTrainState(
            params=shard_params(mesh, state.params),
            opt_state=go(state.opt_state),
            mu_w=jax.device_put(state.mu_w, w_sharding),
            nu_w=jax.device_put(state.nu_w, w_sharding),
            count=jax.device_put(state.count, NamedSharding(mesh, P())),
        )
    return TrainState(shard_params(mesh, state.params), go(state.opt_state))


def replicate(mesh: Mesh, tree):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )


def shard_batch(mesh: Mesh, codes: jax.Array, targets: jax.Array):
    """Shard a batch over the data axis."""
    return (
        jax.device_put(codes, NamedSharding(mesh, P(DATA_AXIS, None))),
        jax.device_put(targets, NamedSharding(mesh, P(DATA_AXIS, None, None))),
    )


def shard_batch_idx(mesh: Mesh, batch_idx: jax.Array):
    """Shard per-epoch batch indices [steps, B] over the batch dim."""
    return jax.device_put(batch_idx, NamedSharding(mesh, P(None, DATA_AXIS)))
