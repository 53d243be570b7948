"""Implicit glyph family tests: glyph/SDF targets, SIREN + multifont fits."""

import jax
import numpy as np
import pytest

from ai_font_renderer_tpu.config import FIRACODE_PATH, MONTSERRAT_PATH
from ai_font_renderer_tpu.fontgen.glyphs import (
    coverage_to_sdf,
    rasterize_charset,
    sdf_charset,
)
from ai_font_renderer_tpu.models import multifont as mf
from ai_font_renderer_tpu.models import siren
from ai_font_renderer_tpu.train.implicit import train_multifont, train_siren

CHARSET = "ABCO"  # tiny charset keeps CPU tests quick


class TestGlyphTargets:
    def test_raster_shapes_and_ink(self):
        t = rasterize_charset(FIRACODE_PATH, CHARSET, cell=32)
        assert t.shape == (4, 32, 32)
        assert (t.max(axis=(1, 2)) > 0.9).all()  # every glyph has solid ink
        # Centered-ish: ink present in the middle rows.
        assert (t[:, 12:20, :].sum(axis=(1, 2)) > 0).all()

    def test_sdf_signs(self):
        t = rasterize_charset(FIRACODE_PATH, "I", cell=32)[0]
        sdf = coverage_to_sdf(t)
        assert sdf[t > 0.9].max() < 0.0  # inside ink: negative
        assert sdf[0, 0] > 3.0  # far corner: positive, several px
        # |grad| of a distance field is ~1 along rows crossing the glyph.
        row = sdf[16]
        g = np.abs(np.diff(row))
        assert g.max() < 1.5

    def test_sdf_charset_batch(self):
        s = sdf_charset(FIRACODE_PATH, CHARSET, cell=24)
        assert s.shape == (4, 24, 24)
        assert np.isfinite(s).all()


class TestSiren:
    def test_atlas_shapes(self):
        cfg = siren.SirenConfig(n_chars=4, cell=16, hidden_dim=32, n_layers=2)
        params = siren.init(jax.random.PRNGKey(0), cfg)
        atlas = siren.render_atlas(params, cfg)
        assert atlas.shape == (4, 16, 16)
        assert float(atlas.min()) >= 0.0 and float(atlas.max()) <= 1.0

    def test_fit_reduces_loss_and_reconstructs(self):
        cfg = siren.SirenConfig(n_chars=4, cell=16, hidden_dim=64, n_layers=3)
        params, losses, targets = train_siren(
            FIRACODE_PATH, cfg, CHARSET, steps=300, lr=1e-3
        )
        losses = np.asarray(losses)
        assert losses[-1] < losses[0] * 0.25
        atlas = np.asarray(siren.render_atlas(params, cfg))
        mse = np.mean((atlas - targets) ** 2)
        assert mse < 0.05  # coarse reconstruction after a short fit


class TestMultiFont:
    def test_fit_both_fonts(self):
        cfg = mf.MultiFontConfig(
            n_fonts=2, n_chars=4, cell=16, hidden_dim=64, n_layers=3
        )
        params, losses, targets = train_multifont(
            [FIRACODE_PATH, MONTSERRAT_PATH], cfg, CHARSET, steps=300, lr=1e-3
        )
        losses = np.asarray(losses)
        assert losses[-1] < losses[0] * 0.25
        atlas = np.asarray(mf.render_atlas(params, cfg))
        assert atlas.shape == (2, 4, 16, 16)
        # The two fonts must produce *different* glyphs (font conditioning
        # does something).
        assert np.abs(atlas[0] - atlas[1]).mean() > 0.01

    def test_sdf_mode(self):
        cfg = mf.MultiFontConfig(
            n_fonts=1, n_chars=4, cell=16, hidden_dim=32, n_layers=2, mode="sdf"
        )
        params, losses, targets = train_multifont(
            [FIRACODE_PATH], cfg, CHARSET, steps=120, lr=1e-3
        )
        atlas = np.asarray(mf.render_atlas(params, cfg))
        assert np.isfinite(atlas).all()
        losses = np.asarray(losses)
        assert losses[-1] < losses[0]


def test_render_atlas_chunked_matches_full():
    cfg = siren.SirenConfig(n_chars=10, cell=16, hidden_dim=32, n_layers=2)
    params = siren.init(jax.random.PRNGKey(1), cfg)
    full = np.asarray(siren.render_atlas(params, cfg))
    chunked = np.asarray(siren.render_atlas_chunked(params, cfg, chunk=4))
    np.testing.assert_allclose(chunked, full, atol=1e-6)
