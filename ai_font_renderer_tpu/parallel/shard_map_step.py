"""Explicit-collective data-parallel training step via shard_map.

The default multi-chip path annotates shardings and lets GSPMD insert
collectives (parallel/sharding.py). This module is the explicit alternative:
`shard_map` splits the batch across the ``data`` mesh axis, each device
computes gradients on its shard, and a hand-placed `jax.lax.pmean` averages
them over ICI before a replicated AdamW update — the classic DP recipe
(SURVEY §5: "collectives (psum for grads under DP)") stated as collectives
rather than inferred from shardings.

Equivalent to the single-device step when loss is a batch mean (mean of
per-shard means over equal shards == full-batch mean); verified in
tests/test_parallel.py. Useful both pedagogically and when manual collective
placement beats GSPMD's choices.
"""

from __future__ import annotations

import jax
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import ModelConfig, TrainConfig
from ..train.step import TrainState, loss_fn, make_optimizer
from .mesh import DATA_AXIS


def make_shard_map_train_step(mesh: Mesh, mcfg: ModelConfig, tcfg: TrainConfig):
    """Build a jitted DP train step with explicit gradient pmean.

    Params/optimizer state replicate; codes/targets arrive sharded on the
    batch axis (or get sharded by the in_specs). Every device applies the
    identical update, so the state stays replicated without any protocol.
    """
    opt = make_optimizer(tcfg)

    def local_step(state: TrainState, codes, targets, lr, key):
        # Per-device dropout: fold in the device's position so shards draw
        # independent masks (full-batch dropout would too).
        idx = jax.lax.axis_index(DATA_AXIS)
        dev_key = jax.random.fold_in(key, idx)
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, codes, targets, mcfg, dev_key, True
        )
        # The collective: average gradients and loss across the data axis.
        grads = jax.lax.pmean(grads, DATA_AXIS)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: lr * u, updates)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state), loss

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            P(),  # state replicated
            P(DATA_AXIS, None),  # codes [B, S] sharded on batch
            P(DATA_AXIS, None, None),  # targets [B, H, W]
            P(),  # lr
            P(),  # key
        ),
        out_specs=(P(), P()),
        check_vma=False,  # optimizer update is replicated by construction
    )
    return jax.jit(sharded, donate_argnums=(0,))
