"""Model tests: shapes, param-count parity, determinism, jit/grad behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_font_renderer_tpu.config import ModelConfig
from ai_font_renderer_tpu.models import font_renderer


@pytest.fixture(scope="module")
def cfg():
    return ModelConfig()


@pytest.fixture(scope="module")
def params(cfg):
    return font_renderer.init(jax.random.PRNGKey(0), cfg)


def test_param_count_matches_reference(params):
    # Reference model is ~122.9M params (SURVEY §2 C13, computed from
    # model.py:136-152); fc_output dominates: 6400*19200 + 19200.
    n = font_renderer.param_count(params)
    assert n == (
        128 * 32  # embedding
        + 100 * 32  # positional
        + 3 * (32 * 32 + 32)  # qkv projections
        + 32 * 32 + 32  # out projection
        + 2 * 32  # layer norm
        + 32 * 64 + 64  # fc1
        + 6400 * 19200 + 19200  # fc_output
    )
    assert abs(n - 122_900_000) < 150_000  # ~122.9M


def test_forward_shape_and_range(params, cfg):
    codes = jnp.zeros((3, 100), jnp.int32).at[:, 0].set(65)
    out = font_renderer.apply(params, codes, cfg)
    assert out.shape == (3, 80, 240)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_eval_deterministic(params, cfg):
    codes = jnp.full((2, 100), 65, jnp.int32)
    a = font_renderer.apply(params, codes, cfg)
    b = font_renderer.apply(params, codes, cfg)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_dropout_varies_with_key(params, cfg):
    codes = jnp.full((2, 100), 65, jnp.int32)
    a = font_renderer.apply(params, codes, cfg, train=True, key=jax.random.PRNGKey(1))
    b = font_renderer.apply(params, codes, cfg, train=True, key=jax.random.PRNGKey(2))
    assert not np.array_equal(np.asarray(a), np.asarray(b))
    # Same key -> identical (replayable dropout).
    c = font_renderer.apply(params, codes, cfg, train=True, key=jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_long_input_truncated(params, cfg):
    codes120 = jnp.full((1, 120), 66, jnp.int32)
    codes100 = codes120[:, :100]
    a = font_renderer.apply(params, codes120, cfg)
    b = font_renderer.apply(params, codes100, cfg)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_short_input_zero_padding_equivalence(params, cfg):
    # The reference zero-pads FC features for short sequences
    # (model.py:190-193). Feeding explicit 0-codes is NOT the same thing
    # (char 0 embeds + attends), so short inputs must go through the pad
    # path and produce valid sheets.
    short = jnp.full((1, 10), 67, jnp.int32)
    out = font_renderer.apply(params, short, cfg)
    assert out.shape == (1, 80, 240)
    assert bool(jnp.isfinite(out).all())


def test_grad_flows_everywhere(params, cfg):
    codes = jnp.full((2, 100), 65, jnp.int32)
    target = jnp.zeros((2, 80, 240))

    def loss(p):
        pred = font_renderer.apply(p, codes, cfg, train=True, key=jax.random.PRNGKey(0))
        return jnp.mean((pred - target) ** 2)

    grads = jax.grad(loss)(params)
    for name, g in grads.items():
        assert bool(jnp.isfinite(g).all()), name
    # The output projection must receive signal.
    assert float(jnp.abs(grads["out_w"]).max()) > 0
    assert float(jnp.abs(grads["embedding"]).max()) > 0
    assert float(jnp.abs(grads["pos"]).max()) > 0


def test_attention_mixes_positions(params, cfg):
    # Changing one character changes distant output pixels (global head).
    base = jnp.full((1, 100), 65, jnp.int32)
    mod = base.at[0, 0].set(90)
    a = font_renderer.apply(params, base, cfg)
    b = font_renderer.apply(params, mod, cfg)
    assert float(jnp.abs(a - b).sum()) > 0


def test_bf16_frontend_close_to_f32():
    """bf16 frontend is a speed profile: outputs stay within bf16 rounding
    of the f32 parity path (inference, no dropout)."""
    import jax, jax.numpy as jnp, numpy as np
    from ai_font_renderer_tpu.config import ModelConfig
    from ai_font_renderer_tpu.models import font_renderer

    mcfg32 = ModelConfig(max_length=24, sheet_height=16, sheet_width=48)
    mcfg16 = ModelConfig(
        max_length=24, sheet_height=16, sheet_width=48, bf16_frontend=True
    )
    params = font_renderer.init(jax.random.PRNGKey(0), mcfg32)
    codes = jax.random.randint(jax.random.PRNGKey(1), (8, 24), 65, 91, jnp.int32)
    o32 = font_renderer.apply(params, codes, mcfg32, train=False)
    o16 = font_renderer.apply(params, codes, mcfg16, train=False)
    assert float(jnp.abs(o32 - o16).max()) < 0.05
    assert float(jnp.abs(o32 - o16).mean()) < 0.005


def test_bits_dropout_trains():
    """bits_dropout keeps ~keep fraction and zeroes the rest (scaled)."""
    import jax, jax.numpy as jnp
    from ai_font_renderer_tpu.models.font_renderer import _dropout

    x = jnp.ones((1000, 100))
    y = _dropout(x, 0.2, jax.random.PRNGKey(0), True, bits=True)
    kept = float((y > 0).mean())
    assert abs(kept - 0.796875) < 0.02  # keep prob quantized to 204/256
    assert float(y.max()) == 1.25  # scaled by 1/keep


def test_bf16_cotangent_grads_match_standard():
    """The bf16-cotangent projection changes only backward dtype rounding:
    forward is bit-identical to bf16_matmul, and gradients stay within
    bf16 rounding of the standard autodiff path."""
    import jax, jax.numpy as jnp, numpy as np
    from ai_font_renderer_tpu.config import ModelConfig
    from ai_font_renderer_tpu.models import font_renderer

    std = ModelConfig(max_length=24, sheet_height=16, sheet_width=48)
    fast = ModelConfig(
        max_length=24, sheet_height=16, sheet_width=48, bf16_cotangent=True
    )
    params = font_renderer.init(jax.random.PRNGKey(0), std)
    codes = jax.random.randint(jax.random.PRNGKey(1), (8, 24), 65, 91, jnp.int32)
    targets = jax.random.uniform(jax.random.PRNGKey(2), (8, 16, 48))

    def loss(p, cfg):
        pred = font_renderer.apply(p, codes, cfg, train=False)
        return jnp.mean((pred - targets) ** 2)

    # Forward: bit-identical.
    np.testing.assert_array_equal(
        np.asarray(font_renderer.apply(params, codes, std)),
        np.asarray(font_renderer.apply(params, codes, fast)),
    )
    g_std = jax.grad(loss)(params, std)
    g_fast = jax.grad(loss)(params, fast)
    for k in ("out_w", "fc1_w", "embedding"):
        a, b = np.asarray(g_std[k]).ravel(), np.asarray(g_fast[k]).ravel()
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))
        assert cos > 0.999, (k, cos)
        scale = np.abs(a).max() + 1e-30
        assert np.abs(a - b).max() / scale < 0.02, k
