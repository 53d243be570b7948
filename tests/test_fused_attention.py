"""Fused attention kernel: numerical equivalence + VJP correctness (interpret
mode on CPU; the same kernel compiles on TPU — perf A/B in RESULTS.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_font_renderer_tpu.config import ModelConfig
from ai_font_renderer_tpu.models import font_renderer
from ai_font_renderer_tpu.models.font_renderer import attention
from ai_font_renderer_tpu.ops.fused_attention import fused_attention

B, S, E, H = 256, 100, 32, 4
KEYS = ("wq", "wk", "wv", "wo", "bq", "bk", "bv", "bo")


@pytest.fixture(scope="module")
def setup():
    mcfg = ModelConfig()
    params = font_renderer.init(jax.random.PRNGKey(0), mcfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, S, E), jnp.float32)
    weights = {k: params[k] for k in KEYS}
    return mcfg, params, x, weights


def test_matches_xla_attention_no_dropout(setup):
    mcfg, params, x, weights = setup
    ref = attention(params, x, mcfg, train=False)
    out = fused_attention(H, 0.0, 128, True, x, weights, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_bf16_matches_bf16_xla(setup):
    mcfg, params, x, weights = setup
    xb = x.astype(jnp.bfloat16)
    ref = attention(params, xb, mcfg, train=False)  # bf16 activations path
    out = fused_attention(H, 0.0, 128, True, xb, weights, jnp.int32(0))
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=0.05
    )


def test_grads_match_xla_no_dropout(setup):
    mcfg, params, x, weights = setup

    def loss_fused(x, w):
        o = fused_attention(H, 0.0, 128, True, x, w, jnp.int32(0))
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_ref(x, w):
        p = dict(params)
        p.update(w)
        return jnp.sum(attention(p, x, mcfg, train=False) ** 2)

    (dx_f, dw_f) = jax.grad(loss_fused, argnums=(0, 1))(x, weights)
    (dx_r, dw_r) = jax.grad(loss_ref, argnums=(0, 1))(x, weights)
    np.testing.assert_allclose(
        np.asarray(dx_f), np.asarray(dx_r), rtol=1e-3, atol=2e-4
    )
    # Scale tolerance by the LARGEST gradient in the dict: dbk is
    # analytically zero (softmax-Jacobian rows sum to 0), so its reference
    # value is pure f32 rounding noise and per-tensor relative comparison
    # is meaningless.
    gmax = max(float(np.abs(dw_r[k]).max()) for k in KEYS)
    for k in KEYS:
        np.testing.assert_allclose(
            np.asarray(dw_f[k]),
            np.asarray(dw_r[k]),
            rtol=2e-3,
            atol=2e-4 * gmax,
            err_msg=k,
        )


def test_dropout_statistics_and_determinism(setup):
    _, _, x, weights = setup
    rate = 0.2
    o1 = fused_attention(H, rate, 128, True, x, weights, jnp.int32(7))
    o2 = fused_attention(H, rate, 128, True, x, weights, jnp.int32(7))
    o3 = fused_attention(H, rate, 128, True, x, weights, jnp.int32(8))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))  # replayable
    assert np.abs(np.asarray(o1) - np.asarray(o3)).max() > 0  # seed matters
    # Dropout changes the output vs no-dropout (mask actually applies).
    o0 = fused_attention(H, 0.0, 128, True, x, weights, jnp.int32(7))
    assert np.abs(np.asarray(o1) - np.asarray(o0)).max() > 1e-3


def test_dropout_bwd_uses_same_mask(setup):
    """grad through the dropout path must be finite and deterministic —
    the backward kernel regenerates the identical PRNG mask."""
    _, _, x, weights = setup

    def loss(x):
        o = fused_attention(H, 0.2, 128, True, x, weights, jnp.int32(3))
        return jnp.mean(o.astype(jnp.float32) ** 2)

    g1 = jax.grad(loss)(x)
    g2 = jax.grad(loss)(x)
    assert np.all(np.isfinite(np.asarray(g1)))
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


def test_model_level_flag(setup):
    """frontend() routes through the kernel when fused_attention=True and
    batch divides 128; output matches the XLA frontend at eval."""
    mcfg, params, _, _ = setup
    mf = ModelConfig(fused_attention=True)
    codes = jax.random.randint(jax.random.PRNGKey(2), (128, 100), 65, 91, jnp.int32)
    a = font_renderer.frontend(params, codes, mcfg, train=False)
    b = font_renderer.frontend(params, codes, mf, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    # Non-dividing batch falls back to XLA (no crash).
    codes15 = codes[:15]
    c = font_renderer.frontend(params, codes15, mf, train=False)
    np.testing.assert_allclose(
        np.asarray(c),
        np.asarray(font_renderer.frontend(params, codes15, mcfg, train=False)),
        atol=2e-5,
    )


# --- v2: stored-mask dropout, decoupled fwd/bwd tiles ----------------------

from ai_font_renderer_tpu.ops.fused_attention import fused_attention2


def test_v2_matches_xla_attention_no_dropout(setup):
    mcfg, params, x, weights = setup
    ref = attention(params, x, mcfg, train=False)
    out = fused_attention2(H, 0.0, 64, 16, True, x, weights, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_v2_grads_match_xla_no_dropout(setup):
    mcfg, params, x, weights = setup

    def loss_fused(x, w):
        o = fused_attention2(H, 0.0, 64, 16, True, x, w, jnp.int32(0))
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_ref(x, w):
        p = dict(params)
        p.update(w)
        return jnp.sum(attention(p, x, mcfg, train=False) ** 2)

    (dx_f, dw_f) = jax.grad(loss_fused, argnums=(0, 1))(x, weights)
    (dx_r, dw_r) = jax.grad(loss_ref, argnums=(0, 1))(x, weights)
    np.testing.assert_allclose(
        np.asarray(dx_f), np.asarray(dx_r), rtol=1e-3, atol=2e-4
    )
    gmax = max(float(np.abs(dw_r[k]).max()) for k in KEYS)
    for k in KEYS:
        np.testing.assert_allclose(
            np.asarray(dw_f[k]),
            np.asarray(dw_r[k]),
            rtol=2e-3,
            atol=2e-4 * gmax,
            err_msg=k,
        )


def test_v2_bwd_consumes_stored_mask(setup):
    """The backward must apply EXACTLY the forward's dropout mask even
    though the fwd/bwd tiles differ: gradients through the dropout path
    are deterministic, finite, and differ from the no-dropout gradients."""
    _, _, x, weights = setup

    def loss(x, rate):
        o = fused_attention2(H, rate, 64, 16, True, x, weights, jnp.int32(3))
        return jnp.mean(o.astype(jnp.float32) ** 2)

    g1 = jax.grad(lambda x: loss(x, 0.2))(x)
    g2 = jax.grad(lambda x: loss(x, 0.2))(x)
    g0 = jax.grad(lambda x: loss(x, 0.0))(x)
    assert np.all(np.isfinite(np.asarray(g1)))
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    # Dropout must visibly reshape the gradient (scale-relative check:
    # the raw values are ~1e-7 because the loss mean divides by o.size).
    assert (
        np.abs(np.asarray(g1) - np.asarray(g0)).max()
        > 0.1 * np.abs(np.asarray(g0)).max()
    )


def test_v2_dropout_unbiased(setup):
    """Stored-mask dropout keeps E[output] ~ no-dropout output (inverted
    scaling), same contract as v1 and jax.random.bernoulli dropout."""
    _, _, x, weights = setup
    rate = 0.2
    o0 = np.asarray(
        fused_attention2(H, 0.0, 64, 16, True, x, weights, jnp.int32(0)),
        np.float32,
    )
    acc = np.zeros_like(o0)
    n = 8
    single_err = None
    for s in range(n):
        o = np.asarray(
            fused_attention2(H, rate, 64, 16, True, x, weights, jnp.int32(s)),
            np.float32,
        )
        if single_err is None:
            single_err = np.mean(np.abs(o - o0))
        acc += o
    # Averaging over seeds converges toward the undropped output (the
    # inverted-scaling unbiasedness property); with n=8 the residual is
    # sampling noise ~ single-seed error / sqrt(n).
    mean_err = np.mean(np.abs(acc / n - o0))
    assert mean_err < 0.55 * single_err, (mean_err, single_err)


def test_v2_model_level_flag(setup):
    mcfg, params, _, _ = setup
    mf = ModelConfig(fused_attention_v2=True)
    codes = jax.random.randint(jax.random.PRNGKey(2), (128, 100), 65, 91, jnp.int32)
    a = font_renderer.frontend(params, codes, mcfg, train=False)
    b = font_renderer.frontend(params, codes, mf, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    # Non-dividing batch falls back to XLA (no crash).
    codes15 = codes[:15]
    c = font_renderer.frontend(params, codes15, mf, train=False)
    np.testing.assert_allclose(
        np.asarray(c),
        np.asarray(font_renderer.frontend(params, codes15, mcfg, train=False)),
        atol=2e-5,
    )
