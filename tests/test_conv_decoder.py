"""Conv-decoder model family: the position-equivariant sheet decoder.

Replaces the reference's 6400x19200 linear dictionary (model.py:152) with a
shared-weight conv upsampling pyramid — the structural fix for proportional
layouts (RESULTS.md: the linear head underfits Montserrat at val 0.0169).
Also covers the training-only leaky clamp that keeps gradients alive when
wide variants saturate the [0,1] output clamp.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_font_renderer_tpu.config import ModelConfig, TrainConfig, replace
from ai_font_renderer_tpu.models import font_renderer
from ai_font_renderer_tpu.train import step as train_step_mod
from ai_font_renderer_tpu.utils.checkpoint import load_params, save_params


@pytest.fixture(scope="module")
def cfg():
    return ModelConfig(decoder="conv")


@pytest.fixture(scope="module")
def params(cfg):
    return font_renderer.init(jax.random.PRNGKey(0), cfg)


def test_param_count_tiny(params):
    # The whole point: a position-equivariant decoder needs no
    # per-(slot, pixel) dictionary. ~460x smaller than the 122.9M linear.
    n = font_renderer.param_count(params)
    assert n < 500_000
    assert "out_w" not in params and "dec_w0" in params


def test_plan_hits_sheet_exactly(cfg):
    plan = font_renderer._decoder_plan(cfg)
    assert plan[-1][:2] == (cfg.sheet_height, cfg.sheet_width)
    # Monotone upsampling from the latent grid.
    hs = [cfg.decoder_grid[0]] + [p[0] for p in plan]
    ws = [cfg.decoder_grid[1]] + [p[1] for p in plan]
    assert hs == sorted(hs) and ws == sorted(ws)


def test_grid_must_tile_max_length():
    bad = ModelConfig(decoder="conv", decoder_grid=(7, 13))
    with pytest.raises(ValueError, match="decoder_grid"):
        font_renderer.init(jax.random.PRNGKey(0), bad)


def test_forward_shape_range_and_white_start(params, cfg):
    codes = jnp.zeros((3, 100), jnp.int32).at[:, :10].set(65)
    out = font_renderer.apply(params, codes, cfg)
    assert out.shape == (3, cfg.sheet_height, cfg.sheet_width)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
    # dec_out_b starts at 1.0: the init prediction sits at the all-white
    # baseline (sheets are ~97% background), not mid-gray.
    assert float(out.mean()) > 0.95


def test_deterministic_inference(params, cfg):
    codes = jnp.zeros((2, 100), jnp.int32).at[:, :4].set(70)
    a = font_renderer.apply(params, codes, cfg)
    b = font_renderer.apply(params, codes, cfg)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_step_learns(cfg):
    tcfg = TrainConfig(batch_size=4)
    state = train_step_mod.init_state(jax.random.PRNGKey(1), cfg, tcfg)
    codes = jnp.zeros((4, 100), jnp.int32).at[:, :8].set(66)
    # Target far from the all-white init so progress is unambiguous.
    targets = jnp.zeros((4, 80, 240), jnp.float32)
    losses = []
    for i in range(6):
        state, loss = train_step_mod.train_step(
            state, codes, targets, jnp.float32(1e-3),
            jax.random.PRNGKey(i), cfg, tcfg,
        )
        losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0]


def test_checkpoint_roundtrip(params, cfg, tmp_path):
    path = str(tmp_path / "conv.npz")
    save_params(params, path)
    restored = load_params(path)
    assert set(restored) == set(params)
    codes = jnp.zeros((1, 100), jnp.int32).at[:, :3].set(72)
    a = font_renderer.apply(params, codes, cfg)
    b = font_renderer.apply(restored, codes, cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_fused_path_rejects_conv_decoder(cfg):
    with pytest.raises(ValueError, match="fused_dw_adamw"):
        train_step_mod.init_fused_state(jax.random.PRNGKey(0), cfg, TrainConfig())


def test_quantize_rejects_conv_decoder(params):
    from ai_font_renderer_tpu.ops.quantized import quantize_params

    with pytest.raises(ValueError, match="out_w"):
        quantize_params(params)


def test_equivariance_of_decoder_stage(params, cfg):
    """Shifting the latent grid one column shifts the ink by one cell.

    This is the property the linear head lacks. Drive conv_decode directly
    with a one-hot latent: moving the hot slot one grid column must produce
    (borders aside) a horizontally translated sheet.
    """
    gh, gw = cfg.decoder_grid
    cell_w = cfg.sheet_width // gw
    h = cfg.hidden_dim
    flat_a = np.zeros((1, cfg.max_length * h), np.float32)
    flat_b = np.zeros_like(flat_a)
    slot = 2 * gw + 5  # row 2, col 5 — interior, away from borders
    flat_a[0, slot * h : (slot + 1) * h] = 1.0
    flat_b[0, (slot + 1) * h : (slot + 2) * h] = 1.0
    out_a = np.asarray(font_renderer.conv_decode(params, jnp.asarray(flat_a), cfg))
    out_b = np.asarray(font_renderer.conv_decode(params, jnp.asarray(flat_b), cfg))
    # Compare away from the sheet's left/right borders.
    shifted = np.roll(out_a, cell_w, axis=2)
    np.testing.assert_allclose(
        shifted[:, :, 4 * cell_w : -4 * cell_w],
        out_b[:, :, 4 * cell_w : -4 * cell_w],
        atol=1e-4,
    )


def test_infer_model_config(params, cfg):
    # Conv checkpoint: decoder family + channel plan recovered from shapes.
    inferred = font_renderer.infer_model_config(params)
    assert inferred.decoder == "conv"
    assert inferred.decoder_channels == cfg.decoder_channels
    assert inferred.embedding_dim == cfg.embedding_dim
    # Linear checkpoint: stays linear with reference dims.
    lin = font_renderer.init(jax.random.PRNGKey(0), ModelConfig())
    assert font_renderer.infer_model_config(lin) == ModelConfig()
    # Wide variant: embed 64 infers 8 heads (8-dim head convention).
    hc = ModelConfig(embedding_dim=64, num_heads=8, hidden_dim=160)
    wide = font_renderer.infer_model_config(font_renderer.init(jax.random.PRNGKey(0), hc))
    assert (wide.embedding_dim, wide.num_heads, wide.hidden_dim) == (64, 8, 160)


class TestPixelShuffleVariant:
    CFG = ModelConfig(decoder="conv_ps")

    def test_plan_and_params(self):
        plan = font_renderer._decoder_plan_ps(self.CFG)
        # Factors multiply to the full upsampling ratio on each axis.
        fy = fx = 1
        for sfy, sfx, _, _ in plan:
            fy, fx = fy * sfy, fx * sfx
        assert (fy, fx) == (80 // 5, 240 // 20)
        params = font_renderer.init(jax.random.PRNGKey(0), self.CFG)
        # Same order of magnitude as the resize variant (factors fold into
        # kernel output channels).
        assert font_renderer.param_count(params) < 2_000_000
        # Every conv's output width is MXU-friendly (>= 64 lanes).
        i = 0
        while f"dec_w{i}" in params:
            assert params[f"dec_w{i}"].shape[3] >= 64
            i += 1

    def test_forward_and_train(self):
        params = font_renderer.init(jax.random.PRNGKey(0), self.CFG)
        codes = jnp.zeros((2, 100), jnp.int32).at[:, :6].set(67)
        out = font_renderer.apply(params, codes, self.CFG)
        assert out.shape == (2, 80, 240)
        assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0
        tcfg = TrainConfig(batch_size=2)
        state = train_step_mod.init_state(jax.random.PRNGKey(1), self.CFG, tcfg)
        targets = jnp.zeros((2, 80, 240), jnp.float32)
        losses = []
        for i in range(6):
            state, loss = train_step_mod.train_step(
                state, codes, targets, jnp.float32(1e-3),
                jax.random.PRNGKey(i), self.CFG, tcfg,
            )
            losses.append(float(loss))
        assert losses[-1] < 0.5 * losses[0]

    def test_infer_distinguishes_variants(self):
        ps = font_renderer.init(jax.random.PRNGKey(0), self.CFG)
        got = font_renderer.infer_model_config(ps)
        assert got.decoder == "conv_ps"
        assert got.decoder_channels == self.CFG.decoder_channels
        rz = font_renderer.init(jax.random.PRNGKey(0), ModelConfig(decoder="conv"))
        assert font_renderer.infer_model_config(rz).decoder == "conv"

    def test_grid_must_divide_sheet(self):
        bad = ModelConfig(
            decoder="conv_ps", max_length=100, decoder_grid=(4, 25),
        )
        with pytest.raises(ValueError, match="divide the sheet"):
            font_renderer.init(jax.random.PRNGKey(0), bad)


def test_infer_forces_linear_against_conv_base():
    # A linear checkpoint must override a conv-decoder base config (the
    # render path would otherwise KeyError on dec_in_w).
    lin = font_renderer.init(jax.random.PRNGKey(0), ModelConfig())
    inferred = font_renderer.infer_model_config(lin, ModelConfig(decoder="conv"))
    assert inferred.decoder == "linear"
    codes = jnp.zeros((1, 100), jnp.int32)
    out = font_renderer.apply(lin, codes, inferred)
    assert out.shape == (1, 80, 240)


def test_infer_rederives_grid_for_nondefault_max_length():
    base = ModelConfig(
        decoder="conv", max_length=60, decoder_grid=(5, 12),
        sheet_height=80, sheet_width=240,
    )
    params = font_renderer.init(jax.random.PRNGKey(0), base)
    inferred = font_renderer.infer_model_config(params)  # default base grid (5,20)
    gh, gw = inferred.decoder_grid
    assert gh * gw == 60  # tiles the inferred max_length (reshape-safe)
    assert 2 <= gh <= 10  # aspect heuristic: near-square cells, not (1, 60)
    # The inferred config must actually run (the stale (5,20) grid would
    # fail init validation and scramble conv_decode's reshape).
    codes = jnp.zeros((1, 60), jnp.int32)
    out = font_renderer.apply(params, codes, inferred)
    assert out.shape == (1, 80, 240)


def test_incompatible_flag_combos_raise(cfg):
    from ai_font_renderer_tpu.models.font_renderer import apply as fr_apply

    bad = ModelConfig(use_pallas_output=True, leaky_clamp=0.01)
    params = font_renderer.init(jax.random.PRNGKey(0), ModelConfig())
    with pytest.raises(ValueError, match="use_pallas_output"):
        fr_apply(params, jnp.zeros((1, 100), jnp.int32), bad)
    with pytest.raises(ValueError, match="leaky_clamp"):
        train_step_mod.init_fused_state(
            jax.random.PRNGKey(0), ModelConfig(leaky_clamp=0.01), TrainConfig()
        )


def test_leaky_clamp_train_only():
    cfg = ModelConfig(leaky_clamp=0.01)
    x = jnp.array([-2.0, 0.5, 3.0])
    y_train = font_renderer._clamp(x, cfg, train=True)
    y_eval = font_renderer._clamp(x, cfg, train=False)
    np.testing.assert_allclose(np.asarray(y_train), [-0.02, 0.5, 1.02], atol=1e-7)
    np.testing.assert_allclose(np.asarray(y_eval), [0.0, 0.5, 1.0], atol=1e-7)
    # Default is reference-exact.
    y_def = font_renderer._clamp(x, ModelConfig(), train=True)
    np.testing.assert_allclose(np.asarray(y_def), [0.0, 0.5, 1.0], atol=1e-7)


def test_leaky_clamp_keeps_saturated_gradient_alive():
    """A fully saturated output has zero gradient under the hard clamp but a
    restoring gradient under the leaky clamp — the failure mode that froze
    the 16000-wide Montserrat run at the all-white MSE."""
    cfg_hard = ModelConfig(decoder="conv")
    cfg_leaky = replace(cfg_hard, leaky_clamp=0.01)
    params = font_renderer.init(jax.random.PRNGKey(0), cfg_leaky)
    # Push the output bias far past saturation: every pixel pre-clamp > 1.
    params = {**params, "dec_out_b": jnp.full((1,), 5.0)}
    codes = jnp.zeros((2, 100), jnp.int32).at[:, :5].set(65)
    targets = jnp.zeros((2, 80, 240), jnp.float32)

    def loss(p, cfg):
        pred = font_renderer.apply(
            p, codes, cfg, train=True, key=jax.random.PRNGKey(0)
        )
        return jnp.mean((pred - targets) ** 2)

    g_hard = jax.grad(loss)(params, cfg_hard)["dec_out_b"]
    g_leaky = jax.grad(loss)(params, cfg_leaky)["dec_out_b"]
    assert float(jnp.abs(g_hard).max()) == 0.0
    assert float(jnp.abs(g_leaky).max()) > 0.0
