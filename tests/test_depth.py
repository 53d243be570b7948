"""Attention-depth axis (ModelConfig.num_blocks).

The reference model is exactly one attention block (model.py:144-145);
num_blocks=1 must therefore stay bit-identical to every shipped
checkpoint (the golden/parity suites lock that). These tests cover the
NEW depth > 1 path: init/apply shapes, depth-1 invariance, config
round-trip through the npz sidecar and shape inference, gradient flow
through the extra blocks, and the placement CLI's --blocks wiring.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_font_renderer_tpu.config import ModelConfig, replace
from ai_font_renderer_tpu.models import font_renderer, placement


def test_depth1_init_unchanged():
    # Adding the depth axis must not perturb depth-1 init for a given key:
    # extra blocks draw from keys[11], untouched by the depth-1 path.
    key = jax.random.PRNGKey(3)
    params = font_renderer.init_frontend(key, ModelConfig())
    assert not any(k.endswith("_b1") for k in params)
    # Spot-lock two depth-1 weights against their pre-depth values.
    assert float(jnp.sum(params["wq"])) == pytest.approx(
        float(jnp.sum(font_renderer.init_frontend(key, ModelConfig())["wq"]))
    )


def test_depth2_init_and_apply_shapes():
    cfg = replace(ModelConfig(), num_blocks=2)
    params = font_renderer.init_frontend(jax.random.PRNGKey(0), cfg)
    for k in ("wq_b1", "wk_b1", "wv_b1", "wo_b1", "ln_scale_b1", "ln_bias_b1"):
        assert k in params, k
    codes = jnp.zeros((4, 100), jnp.int32)
    feats = font_renderer.features(params, codes, cfg)
    assert feats.shape == (4, 100, cfg.hidden_dim)
    # Block-0 weights are bit-identical to the depth-1 init for the key.
    p1 = font_renderer.init_frontend(jax.random.PRNGKey(0), ModelConfig())
    np.testing.assert_array_equal(np.asarray(p1["wq"]), np.asarray(params["wq"]))


def test_depth2_block_contributes():
    # Zeroing the extra block's LN scale + output proj must change the
    # features — i.e. the block is actually in the graph.
    cfg = replace(ModelConfig(), num_blocks=2)
    params = font_renderer.init_frontend(jax.random.PRNGKey(0), cfg)
    codes = jnp.arange(400, dtype=jnp.int32).reshape(4, 100) % 95 + 32
    f2 = font_renderer.features(params, codes, cfg)
    mutated = dict(params)
    mutated["wo_b1"] = params["wo_b1"] * 0.0
    f2z = font_renderer.features(mutated, codes, cfg)
    assert not np.allclose(np.asarray(f2), np.asarray(f2z))


def test_depth2_gradients_reach_extra_block():
    cfg = replace(ModelConfig(), num_blocks=2)
    params = placement.init(jax.random.PRNGKey(0), cfg, lines=5)
    codes = jnp.ones((8, 100), jnp.int32) * 65
    mids = jnp.zeros((8, 100, 2))
    vis = jnp.ones((8, 100), bool)
    grads = jax.grad(placement.loss_fn)(
        params, codes, mids, vis, cfg, train=True, key=jax.random.PRNGKey(1)
    )
    g = np.asarray(grads["wq_b1"])
    assert np.isfinite(g).all() and np.abs(g).max() > 0


def test_depth_train_dropout_keys_distinct():
    # Under train=True the extra block draws its own dropout key; two
    # different seeds must give different (stochastic) features.
    cfg = replace(ModelConfig(), num_blocks=2)
    params = font_renderer.init_frontend(jax.random.PRNGKey(0), cfg)
    codes = jnp.ones((4, 100), jnp.int32) * 70
    fa = font_renderer.features(
        params, codes, cfg, train=True, key=jax.random.PRNGKey(1)
    )
    fb = font_renderer.features(
        params, codes, cfg, train=True, key=jax.random.PRNGKey(2)
    )
    assert not np.allclose(np.asarray(fa), np.asarray(fb))


def test_depth_config_roundtrip(tmp_path):
    from ai_font_renderer_tpu.utils.checkpoint import (
        load_params_with_config,
        save_params,
    )

    cfg = replace(ModelConfig(), num_blocks=3, embedding_dim=64, num_heads=8)
    params = placement.init(jax.random.PRNGKey(0), cfg, lines=5)
    path = str(tmp_path / "depth3.npz")
    save_params(params, path, mcfg=cfg)
    loaded, lcfg = load_params_with_config(path)
    assert lcfg.num_blocks == 3
    assert lcfg.embedding_dim == 64
    assert "wq_b2" in loaded


def test_depth_shape_inference_fallback(tmp_path):
    # npz without the sidecar (old writer) -> infer_model_config counts
    # wq_b* keys.
    cfg = replace(ModelConfig(), num_blocks=2)
    params = font_renderer.init_frontend(jax.random.PRNGKey(0), cfg)
    inferred = font_renderer.infer_model_config(
        {**params, "fc1_w": params["fc1_w"]}
    )
    assert inferred.num_blocks == 2
    d1 = font_renderer.init_frontend(jax.random.PRNGKey(0), ModelConfig())
    assert font_renderer.infer_model_config(dict(d1)).num_blocks == 1


def test_placement_cli_blocks_flag(tmp_path):
    import argparse

    from ai_font_renderer_tpu.train import placement_cli

    ap = argparse.ArgumentParser()
    placement_cli.add_args(ap)
    args = ap.parse_args(["--blocks", "2", "--embed-dim", "64"])
    pcfg = placement_cli._placement_config(args, ap)
    assert pcfg.num_blocks == 2
    assert pcfg.embedding_dim == 64
    assert pcfg.num_heads == 8  # 8-dim heads preserved


def test_placement_cli_blocks_conflict(tmp_path):
    import argparse

    from ai_font_renderer_tpu.train import placement_cli
    from ai_font_renderer_tpu.utils.checkpoint import save_params

    cfg = replace(ModelConfig(), num_blocks=2)
    params = placement.init(jax.random.PRNGKey(0), cfg, lines=5)
    path = str(tmp_path / "d2.npz")
    save_params(params, path, mcfg=cfg)

    ap = argparse.ArgumentParser()
    placement_cli.add_args(ap)
    # Matching flag: fine. Conflicting flag: parser error (SystemExit).
    ok = ap.parse_args(["--init-from", path, "--blocks", "2"])
    assert placement_cli._placement_config(ok, ap).num_blocks == 2
    bad = ap.parse_args(["--init-from", path, "--blocks", "3"])
    with pytest.raises(SystemExit):
        placement_cli._placement_config(bad, ap)


def test_depth_full_model_apply():
    # Depth also composes with the full sheet model (linear decoder).
    cfg = replace(ModelConfig(), num_blocks=2)
    params = font_renderer.init(jax.random.PRNGKey(0), cfg)
    codes = jnp.ones((2, 100), jnp.int32) * 65
    sheets = font_renderer.apply(params, codes, cfg)
    assert sheets.shape == (2, 80, 240)
    assert dataclasses.asdict(cfg)["num_blocks"] == 2
