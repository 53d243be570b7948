"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device sharding (pjit/shard_map over a Mesh) is tested without TPU
hardware via XLA's host-platform device-count override — the standard JAX
fake-backend trick. Must run before jax initializes.
"""

import os

# Hard override: the container env pins JAX_PLATFORMS to the TPU plugin;
# unit tests must run on the virtual CPU mesh (fast, multi-device).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
