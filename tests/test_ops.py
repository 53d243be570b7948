"""Pallas kernel tests (interpret mode on CPU; compiled path runs on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_font_renderer_tpu.ops.fused_output import _reference, fused_output

# Shapes are scaled-down multiples of 128 exercising the real tiling
# (the flagship is M=1024, K=6400, N=19200 with bm=256, bk=640, bn=640).
M, K, N = 256, 1280, 1280


@pytest.fixture(scope="module")
def inputs():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(k1, (M, K), jnp.float32) * 0.05
    w = jax.random.normal(k2, (K, N), jnp.float32) * 0.02
    b = jax.random.normal(k3, (N,), jnp.float32) * 0.5
    return x, w, b


def test_forward_matches_reference(inputs):
    x, w, b = inputs
    got = fused_output(x, w, b, True)  # interpret mode
    want = _reference(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    # Clamp engaged on both sides.
    assert float(got.min()) == 0.0 and float(got.max()) == 1.0


def test_gradients_match_reference(inputs):
    x, w, b = inputs
    t = jax.random.uniform(jax.random.PRNGKey(9), (M, N))

    def loss_fused(x, w, b):
        return jnp.mean((fused_output(x, w, b, True) - t) ** 2)

    def loss_ref(x, w, b):
        return jnp.mean((_reference(x, w, b) - t) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, b_, name in zip(gf, gr, "x w b".split()):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=2e-5, err_msg=name
        )


def test_clamp_mask_blocks_gradient(inputs):
    x, w, b = inputs
    big_b = b + 100.0  # saturate everything at 1.0

    def loss(x):
        return jnp.sum(fused_output(x, w, big_b, True))

    g = jax.grad(loss)(x)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_unsupported_shape_falls_back():
    # Odd K (not a multiple of 128) must route to the XLA reference path.
    x = jnp.ones((4, 100))
    w = jnp.ones((100, 256)) * 0.001
    b = jnp.zeros((256,))
    out = fused_output(x, w, b, True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_reference(x, w, b)), atol=1e-6
    )
