"""GSUB shaping tests: FiraCode calt ligatures, Montserrat liga, corpus safety.

The reference shapes through HarfBuzz behind node-canvas
(generate_font.ts:100-141); these tests pin our shaper's behavior on the
substitutions those fonts actually define.
"""

import numpy as np
import pytest

from ai_font_renderer_tpu.config import (
    FIRACODE_PATH,
    MONTSERRAT_PATH,
    SheetSpec,
)
from ai_font_renderer_tpu.fontgen.raster import flatten_glyph
from ai_font_renderer_tpu.fontgen.shaped import ShapedRenderer, render_shaped_sheets
from ai_font_renderer_tpu.fontgen.shaping import GsubShaper
from ai_font_renderer_tpu.fontgen.ttf import TrueTypeFont


@pytest.fixture(scope="module")
def fira():
    font = TrueTypeFont.load(FIRACODE_PATH)
    return font, GsubShaper(font)


@pytest.fixture(scope="module")
def mont():
    font = TrueTypeFont.load(MONTSERRAT_PATH)
    return font, GsubShaper(font)


def _ink_width(font, gid):
    """Horizontal ink extent of a glyph in px at 12pt, or 0 if blank."""
    segs = flatten_glyph(font.glyph(gid), 12.0 / font.units_per_em)
    if not len(segs):
        return 0.0
    xs = np.concatenate([segs[:, 0], segs[:, 2]])
    return float(xs.max() - xs.min())


class TestFiraCodeCalt:
    """FiraCode implements ligatures as calt type-6 chains over spacers."""

    def test_default_features_enabled(self, fira):
        _, sh = fira
        assert len(sh.enabled) > 50  # the 101 calt lookups + ccmp

    @pytest.mark.parametrize("s", ["->", "=>", "!=", "===", "<=>", "::", "www"])
    def test_ligature_sequences_substitute(self, fira, s):
        font, sh = fira
        raw = [font.glyph_id(ord(c)) for c in s]
        shaped = sh.shape(s)
        assert shaped != raw, f"{s!r} should trigger calt substitution"
        # Monospace invariant: FiraCode keeps the cell count (spacers).
        assert len(shaped) == len(raw)

    def test_ligature_draws_across_cells(self, fira):
        """'===' becomes two blank spacers + one glyph ~3 cells wide."""
        font, sh = fira
        shaped = sh.shape("===")
        widths = [_ink_width(font, g) for g in shaped]
        assert widths[0] == 0.0 and widths[1] == 0.0  # spacers: no ink
        assert widths[2] > 2 * 7.2  # spans >2 monospace cells (7.2px each)

    def test_not_equal_has_slash(self, fira):
        """'!=' must not render as '=' — the ligature carries extra ink."""
        font, sh = fira
        shaped = sh.shape("!=")
        eq_gid = font.glyph_id(ord("="))
        assert shaped[-1] != eq_gid
        assert _ink_width(font, shaped[-1]) > _ink_width(font, eq_gid)

    def test_corpus_strings_unaffected(self, fira):
        """The A-Z+space training corpus triggers no FiraCode rules, so the
        unshaped einsum synthesis path stays exact."""
        from ai_font_renderer_tpu.fontgen.textgen import generate_corpus

        font, sh = fira
        for s in generate_corpus(50) + ["HELLO WORLD", "WWWWWWWW", "A Z"]:
            raw = [font.glyph_id(ord(c)) for c in s]
            assert sh.shape(s) == raw, f"corpus string {s!r} was reshaped"

    def test_plain_lowercase_words_unaffected(self, fira):
        font, sh = fira
        for s in ["abc", "hello world", "quick brown fox"]:
            raw = [font.glyph_id(ord(c)) for c in s]
            assert sh.shape(s) == raw


class TestMontserratLiga:
    """Montserrat uses classic type-4 liga lookups (fi/fl)."""

    def test_fi_fl_ligatures(self, mont):
        font, sh = mont
        fi = sh.shape("fi")
        fl = sh.shape("fl")
        assert len(fi) == 1 and len(fl) == 1
        assert fi[0] != font.glyph_id(ord("f")) and fi[0] != fl[0]

    def test_greedy_inside_word(self, mont):
        _, sh = mont
        # 'office' -> o f [fi] c e: ligature applies mid-word, greedily.
        assert len(sh.shape("office")) == 5

    def test_uppercase_unaffected(self, mont):
        font, sh = mont
        raw = [font.glyph_id(ord(c)) for c in "AVATAR"]
        assert sh.shape("AVATAR") == raw


class TestShapedRenderer:
    def test_ligature_renders_ink_in_spacer_cells(self):
        """In 'a->b' the arrow ligature's ink must span the two cells the
        '-' and '>' occupied — proof the wide glyph actually lands."""
        r = ShapedRenderer(FIRACODE_PATH)
        sheet = r.render("a->b")
        cell = 7.2  # FiraCode advance at 12px
        # Columns of cells 1 and 2 (the '-' and '>' slots).
        region = sheet[:20, int(cell) : int(3 * cell)]
        assert (region < 0.7).sum() > 10  # arrow ink present

    def test_unligated_string_matches_unshaped_truth(self):
        """For pure A-Z text the shaped path and the atlas einsum path are
        the same rasterization (same wrap, same pen walk) up to subpixel
        phase quantization in the atlas variants."""
        from ai_font_renderer_tpu.fontgen import bake_atlas
        from ai_font_renderer_tpu.fontgen.dataset import synthesize_ground_truth

        spec = SheetSpec()
        strings = ["HELLO WORLD", "THE QUICK BROWN FOX JUMPS"]
        shaped = render_shaped_sheets(FIRACODE_PATH, strings, spec)
        atlas = bake_atlas(FIRACODE_PATH, spec)
        truth = np.asarray(synthesize_ground_truth(atlas, strings))
        mse = float(np.mean((shaped - truth) ** 2))
        assert mse < 5e-3, f"shaped vs atlas truth MSE {mse}"

    def test_montserrat_kerned_render(self):
        """Proportional + kerning + shaping all compose: AV renders narrower
        than the unkerned advance sum predicts."""
        r = ShapedRenderer(MONTSERRAT_PATH)
        sheet = r.render("AVAVAV")
        assert (sheet < 0.5).any()

    def test_empty_and_space_strings(self):
        sheets = render_shaped_sheets(FIRACODE_PATH, ["", "   "])
        assert np.all(sheets == 1.0)  # pure white, no crash
