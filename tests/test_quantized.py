"""Int8 serving-mode quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ai_font_renderer_tpu.config import ModelConfig
from ai_font_renderer_tpu.models import font_renderer
from ai_font_renderer_tpu.ops.quantized import (
    apply_quantized,
    quantize_params,
    quantize_weights,
)

MCFG = ModelConfig(max_length=16, hidden_dim=8, sheet_height=16, sheet_width=16)


def test_quantize_roundtrip_error_bounded():
    w = jax.random.normal(jax.random.PRNGKey(0), (128, 64)) * 0.01
    w_q, s = quantize_weights(w)
    assert w_q.dtype == jnp.int8
    deq = w_q.astype(jnp.float32) * s
    # Max error is half a quantization step per channel.
    step = np.asarray(s)
    err = np.abs(np.asarray(deq - w))
    assert (err <= step[None, :] * 0.5 + 1e-9).all()


def test_quantized_inference_close_to_f32():
    params = font_renderer.init(jax.random.PRNGKey(1), MCFG)
    codes = jax.random.randint(jax.random.PRNGKey(2), (8, 16), 65, 91, jnp.int32)
    full = np.asarray(font_renderer.apply(params, codes, MCFG))
    served = quantize_params(params)
    q = np.asarray(apply_quantized(served, codes, MCFG))
    # Within one 8-bit gray level of the full-precision render.
    assert np.abs(q - full).max() < 1.5 / 255.0
    assert served["out_w_q"].nbytes == params["out_w"].nbytes // 4


def test_serving_bundle_drops_f32_weights():
    params = font_renderer.init(jax.random.PRNGKey(1), MCFG)
    served = quantize_params(params)
    assert "out_w" not in served
    assert "out_w_q" in served and "out_w_scale" in served


def test_int8_int8_inference_close_to_f32():
    from ai_font_renderer_tpu.ops.quantized import apply_quantized_int8

    params = font_renderer.init(jax.random.PRNGKey(1), MCFG)
    codes = jax.random.randint(jax.random.PRNGKey(2), (8, 16), 65, 91, jnp.int32)
    full = np.asarray(font_renderer.apply(params, codes, MCFG))
    served = quantize_params(params)
    q = np.asarray(apply_quantized_int8(served, codes, MCFG))
    # Both operands quantized: allow a few gray levels of drift.
    assert np.abs(q - full).max() < 4.0 / 255.0
    assert np.abs(q - full).mean() < 0.5 / 255.0


def test_activation_quantization_roundtrip():
    from ai_font_renderer_tpu.ops.quantized import quantize_activations

    x = jax.random.uniform(jax.random.PRNGKey(3), (4, 64)) * 3.0
    a_q, s = quantize_activations(x)
    deq = a_q.astype(jnp.float32) * s[:, None]
    assert np.abs(np.asarray(deq - x)).max() <= np.asarray(s).max() * 0.5 + 1e-6
