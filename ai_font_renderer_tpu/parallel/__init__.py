"""Parallelism: device meshes + sharding rules (DP batch, TP output GEMM)."""

from .mesh import DATA_AXIS, MODEL_AXIS, make_mesh, single_device_mesh
from .shard_map_step import make_shard_map_train_step
from .sharding import (
    param_shardings,
    param_spec,
    replicate,
    shard_batch,
    shard_batch_idx,
    shard_params,
    shard_state,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "single_device_mesh",
    "make_shard_map_train_step",
    "param_shardings",
    "param_spec",
    "replicate",
    "shard_batch",
    "shard_batch_idx",
    "shard_params",
    "shard_state",
]
