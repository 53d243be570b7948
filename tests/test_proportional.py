"""Proportional-font (Montserrat) layout + synthesis tests."""

import numpy as np
import pytest

from ai_font_renderer_tpu.config import MONTSERRAT_PATH, FIRACODE_PATH, SheetSpec
from ai_font_renderer_tpu.fontgen.proportional import (
    bake_prop_atlas,
    encode_prop_grids,
    layout_prop_grid,
    synthesize_prop_host,
    synthesize_prop_sheets,
)


@pytest.fixture(scope="module")
def atlas():
    # Small sheet keeps the variant table light for CPU tests.
    return bake_prop_atlas(MONTSERRAT_PATH, SheetSpec(width=120, height=40, max_chars=40))


def test_bake_geometry(atlas):
    assert atlas.stride >= 1
    assert atlas.n_slots * atlas.stride >= atlas.spec.width
    assert atlas.table.shape[0] > 1
    assert not atlas.inked[0]  # space
    assert atlas.table[0].sum() == 0  # variant 0 is blank


def test_proportional_advances_differ(atlas):
    adv = atlas.advance_table()
    assert adv.advances_px[adv.char_index("W")] > adv.advances_px[adv.char_index("I")]
    assert not adv.is_monospace


def test_layout_places_every_inked_char(atlas):
    grid = layout_prop_grid("WIN", atlas)
    assert (grid != 0).sum() == 3
    # Distinct glyphs -> distinct variants.
    assert len({int(v) for v in grid[grid != 0]}) == 3


def test_no_slot_collisions_narrow_chars(atlas):
    # Repeated narrowest glyphs must each get their own coarse slot.
    grid = layout_prop_grid("IIIIIIIIII", atlas)
    assert (grid != 0).sum() == 10


def test_sheets_render_ink(atlas):
    grids = encode_prop_grids(["WAVE TO ME", "III WWW"], atlas)
    sheets = synthesize_prop_host(atlas, grids)
    assert sheets.shape == (2, 40, 120)
    assert (sheets < 0.5).any(axis=(1, 2)).all()
    assert sheets.max() == 1.0


def test_device_matches_host(atlas):
    import jax.numpy as jnp

    grids = encode_prop_grids(["MONTSERRAT", "QUICK FOX"], atlas)
    host = synthesize_prop_host(atlas, grids)
    dev = np.asarray(synthesize_prop_sheets(atlas, grids, dtype=jnp.float32))
    np.testing.assert_array_equal(np.round(dev * 255), np.round(host * 255))


def test_width_scales_with_text(atlas):
    # 'W' sheet should use more horizontal ink span than 'I' sheet.
    g = encode_prop_grids(["WWW", "III"], atlas)
    s = synthesize_prop_host(atlas, g)
    ink_w = [(s[i] < 0.9).any(axis=0).sum() for i in range(2)]
    assert ink_w[0] > ink_w[1] * 1.5


def test_monospace_font_also_works(tmp_path):
    # The proportional path must subsume monospace fonts (G = advance floor).
    atlas = bake_prop_atlas(FIRACODE_PATH, SheetSpec(width=120, height=40, max_chars=40))
    grid = layout_prop_grid("ABC", atlas)
    assert (grid != 0).sum() == 3
    sheets = synthesize_prop_host(atlas, grid[None])
    assert (sheets[0] < 0.5).any()


class TestKerning:
    def test_kerned_pairs_shift_layout(self):
        from ai_font_renderer_tpu.fontgen.proportional import bake_prop_atlas
        spec = SheetSpec(width=120, height=40, max_chars=40)
        a_kern = bake_prop_atlas(MONTSERRAT_PATH, spec, use_kerning=True)
        a_plain = bake_prop_atlas(MONTSERRAT_PATH, spec, use_kerning=False)
        # Kerned 'AV' measures narrower than the raw advance sum.
        assert a_kern.advance_table().measure("AV") < a_plain.advance_table().measure("AV")
        # Kerning pulls the rendered run leftward: narrower ink extent.
        sk = synthesize_prop_host(a_kern, layout_prop_grid("AVAVAVAV", a_kern)[None])[0]
        sp = synthesize_prop_host(a_plain, layout_prop_grid("AVAVAVAV", a_plain)[None])[0]
        extent = lambda s: np.where((s < 0.9).any(axis=0))[0].max()
        assert extent(sk) < extent(sp)

    def test_monospace_has_no_kerning(self):
        from ai_font_renderer_tpu.fontgen.kerning import KerningTable
        kt = KerningTable(FIRACODE_PATH, "ABCDEFGHIJKLMNOPQRSTUVWXYZ ", 12.0)
        assert len(kt) == 0

    def test_kerning_values_sane(self):
        from ai_font_renderer_tpu.fontgen.kerning import KerningTable
        kt = KerningTable(MONTSERRAT_PATH, "ATVWYLaovy", 12.0)
        assert len(kt) > 0
        # All pair adjustments are small fractions of the em.
        for v in kt.pairs_px.values():
            assert abs(v) < 3.0
        assert kt.get("A", "V") < 0.0  # classic negative pair


def test_slot_collision_guard_keeps_both_glyphs():
    """Fp-edge regression: when the q==Q round-up leaves glyph i's anchor in
    the slot glyph i+1's anchor also maps to (possible only through float
    error in the accumulated pen, or an atlas whose stride exceeds a step),
    the layout must shift glyph i+1 to the next slot rather than overwrite
    glyph i (ADVICE round 1). Crafted atlas: stride 3 with a 2.5px advance
    forces the collision deterministically."""
    import numpy as np
    from ai_font_renderer_tpu.config import SheetSpec
    from ai_font_renderer_tpu.fontgen.proportional import (
        PropAtlas,
        layout_prop_grid,
    )

    atlas = PropAtlas(
        table=np.zeros((1000, 1, 4), np.float32),
        charset="ABC",
        spec=SheetSpec(width=60, height=12, max_chars=20),
        # A's 2.9375 advance puts B at the exact round-up threshold
        # (frac 15/16 with Q=8 -> anchor 3, slot 1); B's 2.5 advance puts C
        # at anchor 5 -> also slot 1.
        advances_px=np.array([2.9375, 2.5, 2.5]),
        inked=np.array([True, True, True]),
        ink_index=np.array([0, 1, 2]),
        kerning=None,
        n_lines=1,
        n_slots=20,
        stride=3,
        q_subpixel=8,
        cell_h=1,
        cell_w=4,
        ascent_rows=0,
        bearing_x=0,
        y0=np.array([0]),
    )
    grid = layout_prop_grid("ABC", atlas)
    placed = np.nonzero(grid[0])[0]
    assert len(placed) == 3  # no glyph silently dropped
    assert list(placed) == [0, 1, 2]  # C shifted to the next slot edge
