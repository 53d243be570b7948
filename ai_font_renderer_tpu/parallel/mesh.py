"""Device mesh construction.

The reference is strictly single-device (model.py:98-106; SURVEY §2: no DP/
TP/PP anywhere). Here scaling is first-class: a 2D ``(data, model)`` mesh
where the batch shards over ``data`` (gradient psum rides ICI) and the
dominant 6400x19200 output projection shards over ``model``. XLA's GSPMD
inserts the collectives; we only annotate.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: int | None = None,
    model: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    ``data=None`` consumes all remaining devices. A single-device mesh is a
    valid degenerate case — the same code path runs on one chip.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n % model != 0:
        raise ValueError(f"{n} devices not divisible by model={model}")
    if data is None:
        data = n // model
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} needs {data * model} > {n} devices")
    grid = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(data=1, model=1)
