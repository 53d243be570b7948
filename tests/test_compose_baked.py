"""compose_baked: bilinear sampling of a pre-baked SIREN bank.

The fast neural-render path (render/implicit_sheet.py:compose_baked)
must approximate the exact per-window MLP eval (compose) with error
that vanishes as the bake supersample grows, and must share the exact
compositing geometry (same windows, same scatter, same masks).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ai_font_renderer_tpu.config import FIRACODE_PATH, SheetSpec
from ai_font_renderer_tpu.fontgen.ttf import TrueTypeFont
from ai_font_renderer_tpu.models import siren
from ai_font_renderer_tpu.render.implicit_sheet import (
    bake_bank,
    build_layout,
    compose,
    compose_baked,
    place_glyphs,
)

STRINGS = ["HELLO WORLD", "The quick brown fox", "a b c"]


def _setup(cell=32):
    cfg = siren.SirenConfig(n_chars=95, cell=cell, hidden_dim=32, n_layers=2)
    params = siren.init(jax.random.PRNGKey(0), cfg)
    font = TrueTypeFont.load(FIRACODE_PATH)
    lay = build_layout(font, SheetSpec(), cell=cell)
    ids, origins, valid = place_glyphs(STRINGS, font, lay)
    return cfg, params, lay, jnp.asarray(ids), jnp.asarray(origins), jnp.asarray(valid)


def test_baked_converges_to_exact():
    cfg, params, lay, ids, origins, valid = _setup()
    exact = np.asarray(compose(params, ids, origins, valid, cfg, lay))
    errs = []
    for ss in (2, 8):
        baked = bake_bank(params, cfg, supersample=ss)
        approx = np.asarray(
            compose_baked(baked, ids, origins, valid, cfg, lay, ss)
        )
        errs.append(np.abs(approx - exact).mean())
    # Error strictly shrinks with supersample and is small at ss=8.
    assert errs[1] < errs[0]
    assert errs[1] < 5e-3, errs


def test_baked_respects_masks():
    cfg, params, lay, ids, origins, valid = _setup()
    baked = bake_bank(params, cfg, supersample=2)
    none = compose_baked(
        baked, ids, origins, jnp.zeros_like(valid), cfg, lay, 2
    )
    # All-invalid -> pure white sheets.
    assert float(jnp.min(none)) == 1.0


def test_bake_bank_shape():
    cfg, params, lay, *_ = _setup(cell=16)
    baked = bake_bank(params, cfg, supersample=4)
    assert baked.shape == (95, 64, 64)


def test_phased_converges_to_exact():
    from ai_font_renderer_tpu.render.implicit_sheet import (
        bake_bank_phased,
        compose_phased,
    )

    cfg, params, lay, ids, origins, valid = _setup()
    exact = np.asarray(compose(params, ids, origins, valid, cfg, lay))
    errs = []
    for P in (2, 16):
        baked = bake_bank_phased(params, cfg, lay, phases=P)
        assert baked.shape == (95, P, P, lay.win, lay.win)
        approx = np.asarray(
            compose_phased(baked, ids, origins, valid, cfg, lay, P)
        )
        errs.append(np.abs(approx - exact).mean())
    assert errs[1] < errs[0]
    assert errs[1] < 5e-3, errs


def test_phased_onehot_matches_take():
    from ai_font_renderer_tpu.render.implicit_sheet import (
        bake_bank_phased,
        compose_phased,
    )

    cfg, params, lay, ids, origins, valid = _setup()
    baked = bake_bank_phased(params, cfg, lay, phases=4)
    a = np.asarray(compose_phased(baked, ids, origins, valid, cfg, lay, 4))
    b = np.asarray(
        compose_phased(baked, ids, origins, valid, cfg, lay, 4, onehot=True)
    )
    # The one-hot fetch runs the table read as a bf16 GEMM: identical
    # selection, bf16 rounding of the coverage values only.
    assert np.abs(a - b).max() < 1e-2
    np.testing.assert_allclose(a, b, atol=1e-2)


def test_phased_matmul_matches_scatter():
    from ai_font_renderer_tpu.render.implicit_sheet import (
        bake_bank_phased,
        compose_phased,
    )

    cfg, params, lay, ids, origins, valid = _setup()
    baked = bake_bank_phased(params, cfg, lay, phases=8)
    sc = np.asarray(compose_phased(baked, ids, origins, valid, cfg, lay, 8))
    mm = np.asarray(
        compose_phased(
            baked, ids, origins, valid, cfg, lay, 8, composite="matmul"
        )
    )
    # Same blocks, same placements; the matmul path rounds coverage to
    # bf16 inside the positioning GEMMs.
    assert np.abs(mm - sc).max() < 2e-2
    np.testing.assert_allclose(mm, sc, atol=2e-2)
    # And with half the sheet invalidated, the two paths still agree —
    # the valid mask is applied pre-GEMM.
    v2 = valid.at[:, ::2].set(False)
    sc2 = np.asarray(compose_phased(baked, ids, origins, v2, cfg, lay, 8))
    mm2 = np.asarray(
        compose_phased(baked, ids, origins, v2, cfg, lay, 8, composite="matmul")
    )
    assert np.abs(mm2 - sc2).max() < 2e-2


def test_phased_respects_masks():
    from ai_font_renderer_tpu.render.implicit_sheet import (
        bake_bank_phased,
        compose_phased,
    )

    cfg, params, lay, ids, origins, valid = _setup()
    baked = bake_bank_phased(params, cfg, lay, phases=2)
    none = compose_phased(
        baked, ids, origins, jnp.zeros_like(valid), cfg, lay, 2
    )
    assert float(jnp.min(none)) == 1.0
