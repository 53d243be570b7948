"""Implicit-flagship hybrid: SIREN glyph bank composed into text sheets.

Covers render/implicit_sheet.py — layout geometry, the single-call
composition, fidelity against the bitmap pipeline's ground truth, and
arbitrary-resolution output (the capability the fixed 80x240 linear head
cannot express)."""

import jax
import numpy as np
import pytest

from ai_font_renderer_tpu.config import FIRACODE_PATH, SheetSpec
from ai_font_renderer_tpu.fontgen import bake_atlas
from ai_font_renderer_tpu.fontgen.dataset import synthesize_ground_truth
from ai_font_renderer_tpu.fontgen.ttf import TrueTypeFont
from ai_font_renderer_tpu.models import siren
from ai_font_renderer_tpu.render.implicit_sheet import (
    build_layout,
    place_glyphs,
    render_implicit_sheets,
)
from ai_font_renderer_tpu.train.implicit import train_siren

CHARSET = " ABCDEFGHIJKLMNOPQRSTUVWXYZ"


@pytest.fixture(scope="module")
def trained():
    cfg = siren.SirenConfig(n_chars=len(CHARSET), cell=32, hidden_dim=64, n_layers=3)
    params, losses, _ = train_siren(
        FIRACODE_PATH, cfg, charset=CHARSET, steps=800, lr=3e-4
    )
    assert float(losses[-1]) < 0.05  # the bank itself learned glyphs
    return params, cfg


def test_layout_geometry():
    font = TrueTypeFont.load(FIRACODE_PATH)
    spec = SheetSpec()
    lay = build_layout(font, spec, cell=32, scale=1.0)
    assert (lay.height, lay.width) == (80, 240)
    lay3 = build_layout(font, spec, cell=32, scale=3.0)
    assert (lay3.height, lay3.width) == (240, 720)
    # Window scales with output resolution.
    assert lay3.win > 2 * lay.win


def test_placement_matches_monospace_grid():
    font = TrueTypeFont.load(FIRACODE_PATH)
    spec = SheetSpec()
    lay = build_layout(font, spec, cell=32)
    ids, origins, valid = place_glyphs(["AB A"], font, lay, spec, CHARSET)
    assert valid[0].sum() == 3  # spaces place no glyph
    assert ids[0, 0] == CHARSET.index("A") and ids[0, 1] == CHARSET.index("B")
    adv = font.advance(font.glyph_id(ord("A"))) * spec.font_size / font.units_per_em
    # Monospace: consecutive window origins advance by exactly one advance.
    np.testing.assert_allclose(
        origins[0, 1, 0] - origins[0, 0, 0], adv, atol=1e-5
    )
    # Third glyph skips the space: two advances from the second.
    np.testing.assert_allclose(
        origins[0, 2, 0] - origins[0, 1, 0], 2 * adv, atol=1e-5
    )
    # Same baseline for a single line.
    assert origins[0, 0, 1] == origins[0, 1, 1] == origins[0, 2, 1]


def test_unknown_chars_advance_like_spaces():
    font = TrueTypeFont.load(FIRACODE_PATH)
    spec = SheetSpec()
    lay = build_layout(font, spec, cell=32)
    # '?' is outside CHARSET: it must advance the pen (like the measuring
    # AdvanceTable does) while placing no glyph.
    ids_q, org_q, val_q = place_glyphs(["A?B"], font, lay, spec, CHARSET)
    ids_s, org_s, val_s = place_glyphs(["A B"], font, lay, spec, CHARSET)
    assert val_q[0].sum() == val_s[0].sum() == 2
    np.testing.assert_allclose(org_q[0, :2], org_s[0, :2], atol=1e-6)


def test_composed_sheet_close_to_bitmap_truth(trained):
    params, cfg = trained
    strings = ["THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG"]
    out = render_implicit_sheets(params, strings, FIRACODE_PATH, cfg, charset=CHARSET)
    gt = synthesize_ground_truth(bake_atlas(FIRACODE_PATH), strings)
    mse = float(np.mean((out - gt) ** 2))
    white = float(np.mean((1.0 - gt) ** 2))
    # Composition must beat the all-white baseline decisively — the bound
    # is loose because the bank trains briefly at 32px cells in this test.
    assert mse < 0.45 * white, (mse, white)


def test_arbitrary_resolution(trained):
    params, cfg = trained
    out1 = render_implicit_sheets(params, ["HELLO"], FIRACODE_PATH, cfg, charset=CHARSET)
    out3 = render_implicit_sheets(
        params, ["HELLO"], FIRACODE_PATH, cfg, scale=3.0, charset=CHARSET
    )
    assert out3.shape == (1, 240, 720)
    # Ink fraction is resolution-invariant (same glyphs, same coverage).
    ink1 = float((1 - out1).mean())
    ink3 = float((1 - out3).mean())
    assert abs(ink1 - ink3) < 0.25 * max(ink1, 1e-6)
    # Downsampled 3x render agrees with the native render where there is ink.
    ds = out3.reshape(1, 80, 3, 240, 3).mean(axis=(2, 4))
    assert float(np.mean((ds - out1) ** 2)) < 0.02


def test_compose_differentiable_in_bank_and_origins():
    """Joint pixel fine-tune contract (tools/train_placement.py
    --finetune-joint): the sheet MSE must differentiate through compose()
    into BOTH the window origins (placement side) and the SIREN bank
    params (glyph fields), with finite, nonzero gradients for each."""
    import jax.numpy as jnp

    from ai_font_renderer_tpu.render.implicit_sheet import compose

    font = TrueTypeFont.load(FIRACODE_PATH)
    spec = SheetSpec()
    cfg = siren.SirenConfig(
        n_chars=len(CHARSET), cell=16, hidden_dim=32, n_layers=2
    )
    lay = build_layout(font, spec, cell=cfg.cell)
    params = siren.init(jax.random.PRNGKey(0), cfg)
    ids, origins, valid = place_glyphs(["AB A"], font, lay, spec, CHARSET)
    ids, valid = jnp.asarray(ids), jnp.asarray(valid)
    gt = jnp.zeros((1, lay.height, lay.width))

    def loss(bank, orig):
        sheets = compose(bank, ids, orig, valid, cfg, lay)
        return jnp.mean((sheets - gt) ** 2)

    g_bank, g_orig = jax.grad(loss, argnums=(0, 1))(
        params, jnp.asarray(origins)
    )
    leaves = jax.tree_util.tree_leaves(g_bank)
    assert leaves and all(bool(jnp.isfinite(g).all()) for g in leaves)
    # The glyph-field gradient reaches every parameter tensor of the bank.
    assert all(float(jnp.abs(g).sum()) > 0 for g in leaves)
    assert bool(jnp.isfinite(g_orig).all())
    assert float(jnp.abs(g_orig).sum()) > 0


def test_empty_and_all_space_strings(trained):
    params, cfg = trained
    out = render_implicit_sheets(params, ["", "     "], FIRACODE_PATH, cfg, charset=CHARSET)
    np.testing.assert_array_equal(np.asarray(out), np.ones_like(out))


def test_kerned_placement_matches_engine_targets():
    """place_glyphs reproduces placement_targets' positions on the KERNED
    proportional font — the invariant placement.py's docstring claims
    ("identical numbers to implicit_sheet.place_glyphs"). Before the
    round-4 fix, place_glyphs ignored GPOS kerning in both the wrap
    measure and the pen walk, so the Montserrat engine-layout oracle was
    laid out differently from the kerned ground truth."""
    from ai_font_renderer_tpu.config import MONTSERRAT_PATH, PRINTABLE_ASCII
    from ai_font_renderer_tpu.fontgen.layout import AdvanceTable
    from ai_font_renderer_tpu.models.placement import placement_targets
    from ai_font_renderer_tpu.render.implicit_sheet import font_kerning

    spec = SheetSpec()
    charset = PRINTABLE_ASCII
    font = TrueTypeFont.load(MONTSERRAT_PATH)
    kern = font_kerning(MONTSERRAT_PATH, charset, spec)
    assert kern is not None and len(kern) > 0  # Montserrat kerns pairs
    adv = np.array(
        [
            font.advance(font.glyph_id(ord(c))) * spec.font_size / font.units_per_em
            for c in charset
        ]
    )
    table = AdvanceTable(charset, adv, kern)
    # Kerned pairs (AV, To, Ya, WA) plus a string long enough to wrap so a
    # kerned measure() can change the break decision.
    strings = [
        "AVATAR WAVE TOYOTA",
        "LAYAWAY PAYLOAD VAT TAVERN WAYWARD AVOCADO VOYAGE",
    ]
    mids, vis = placement_targets(strings, table, spec)

    lay = build_layout(font, spec, cell=32)
    ids, origins, valid = place_glyphs(strings, font, lay, spec, charset, kern)
    for si in range(len(strings)):
        tgt = mids[si][vis[si]]  # visible slots in original order
        got_x = origins[si][valid[si], 0] + lay.cell_x_center * lay.r
        got_y = origins[si][valid[si], 1] + lay.cell_baseline * lay.r
        assert len(tgt) == valid[si].sum()
        np.testing.assert_allclose(got_x, tgt[:, 0], atol=1e-4)
        np.testing.assert_allclose(got_y, tgt[:, 1], atol=1e-4)
    # And the kerning is load-bearing: the unkerned layout differs.
    _, unkerned, _ = place_glyphs(strings, font, lay, spec, charset)
    assert np.abs(unkerned - origins).max() > 0.1
