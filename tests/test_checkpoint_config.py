"""Embedded model config in saved weights (npz __config__ sidecar entry).

Shapes alone cannot determine num_heads (qkv projections are [E, E] for any
head count) or the conv latent grid (rows*cols folds into one reshape);
save_params now embeds the exact architecture so loading never guesses.
Legacy files without the entry still load via infer_model_config.
"""

import dataclasses

import jax
import numpy as np
import pytest

from ai_font_renderer_tpu.config import ModelConfig
from ai_font_renderer_tpu.models import font_renderer
from ai_font_renderer_tpu.utils.checkpoint import (
    load_params,
    load_params_with_config,
    save_params,
)


def test_round_trip_nondefault_heads(tmp_path):
    """embed-64/4-heads: shape inference would guess 8 heads (E//8);
    the embedded config preserves the truth."""
    cfg = ModelConfig(embedding_dim=64, num_heads=4)
    params = font_renderer.init(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "w.npz")
    save_params(params, path, cfg)
    loaded, mcfg = load_params_with_config(path)
    assert mcfg.num_heads == 4
    assert mcfg.embedding_dim == 64
    for k in params:
        np.testing.assert_array_equal(np.asarray(loaded[k]), np.asarray(params[k]))
    # The recovered config renders: forward runs with the true head count.
    out = font_renderer.apply(
        loaded, np.full((2, 10), 65, np.int32), mcfg, train=False
    )
    assert out.shape == (2, 80, 240)


def test_round_trip_custom_conv_grid(tmp_path):
    """A (10, 10) latent grid has the same product as the default (5, 20);
    shape inference cannot tell them apart — the embedded config can."""
    cfg = ModelConfig(decoder="conv_ps", decoder_grid=(10, 10))
    params = font_renderer.init(jax.random.PRNGKey(1), cfg)
    path = str(tmp_path / "conv.npz")
    save_params(params, path, cfg)
    _, mcfg = load_params_with_config(path)
    assert mcfg.decoder == "conv_ps"
    assert mcfg.decoder_grid == (10, 10)
    assert mcfg.decoder_channels == cfg.decoder_channels


def test_legacy_npz_without_config_falls_back(tmp_path):
    """Files written before the sidecar existed infer from shapes."""
    cfg = ModelConfig()
    params = font_renderer.init(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "legacy.npz")
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})
    loaded, mcfg = load_params_with_config(path)
    assert "__config__" not in loaded
    assert mcfg.decoder == "linear" and mcfg.num_heads == 4
    assert set(loaded) == set(params)


def test_load_params_hides_sidecar(tmp_path):
    """The bare-weights contract is preserved: load_params returns only
    tensors, never the __config__ entry."""
    cfg = ModelConfig()
    params = font_renderer.init(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "w.npz")
    save_params(params, path, cfg)
    loaded = load_params(path)
    assert set(loaded) == set(params)


def test_runtime_knobs_not_persisted(tmp_path):
    """bf16/fused flags are execution choices, not architecture; a base
    config's runtime knobs survive loading untouched."""
    cfg = ModelConfig(bf16_frontend=True, bits_dropout=True)
    params = font_renderer.init(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "w.npz")
    save_params(params, path, cfg)
    base = ModelConfig()  # default runtime knobs
    _, mcfg = load_params_with_config(path, base)
    assert mcfg.bf16_frontend is False and mcfg.bits_dropout is False
    assert mcfg == dataclasses.replace(base)


def test_bf16_cotangent_requires_bf16_matmul():
    """ADVICE r2: bf16_cotangent silently ran the forward GEMM in bf16
    under strict-f32 mode; now it raises."""
    cfg = ModelConfig(bf16_matmul=False, bf16_cotangent=True)
    params = font_renderer.init(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="bf16_cotangent"):
        font_renderer.apply(
            params, np.full((2, 10), 65, np.int32), cfg, train=False
        )
