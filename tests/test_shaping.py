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


class TestSyntheticLookupTypes358:
    """GSUB lookup types 3 (AlternateSubst), 5 (ContextSubst fmts 1-3),
    and 8 (ReverseChainSingleSubst) — unused by the bundled fonts, so
    exercised on hand-built binary subtables (OpenType spec layouts)."""

    @staticmethod
    def _cov(gids):
        import struct
        return struct.pack(f">HH{len(gids)}H", 1, len(gids), *gids)

    @pytest.fixture(scope="class")
    def sh(self):
        return GsubShaper(TrueTypeFont.load(FIRACODE_PATH))

    def test_type3_alternate_takes_first(self, sh):
        import struct
        # fmt, covOff, altSetCount=2, altSetOffs[2], altsets, coverage
        alt0 = struct.pack(">HHH", 2, 100, 101)   # 2 alternates for gid 10
        alt1 = struct.pack(">HH", 1, 200)         # 1 alternate for gid 20
        off_alt0 = 10  # header: fmt + covOff + count + 2 offsets
        off_alt1 = off_alt0 + len(alt0)
        off_cov = off_alt1 + len(alt1)
        blob = (
            struct.pack(">HHHHH", 1, off_cov, 2, off_alt0, off_alt1)
            + alt0 + alt1 + self._cov([10, 20])
        )
        parsed = sh._parse_subtable(blob, 3, 0, set())
        assert parsed == (3, {10: [100, 101], 20: [200]})
        sh._lookups[990] = (3, [parsed])
        assert sh._apply_over(990, [10, 20, 30]) == [100, 200, 30]

    def test_type5_fmt3_context(self, sh):
        import struct
        sh._lookups[991] = (1, [(1, {1: 99})])  # nested single-subst 1->99
        cov_a, cov_b = self._cov([1]), self._cov([2])
        off_a = 6 + 2 * 2 + 4  # header + covOffs + 1 record
        off_b = off_a + len(cov_a)
        blob = (
            struct.pack(">HHHHHHH", 3, 2, 1, off_a, off_b, 0, 991)
            + cov_a + cov_b
        )
        nested = set()
        parsed = sh._parse_subtable(blob, 5, 0, nested)
        assert nested == {991}
        assert parsed[0] == 63 and parsed[1][0] == [] and parsed[1][2] == []
        sh._lookups[992] = (5, [parsed])
        assert sh._apply_over(992, [1, 2, 3]) == [99, 2, 3]
        assert sh._apply_over(992, [1, 3, 2]) == [1, 3, 2]  # context unmet

    def test_type5_fmt1_rules(self, sh):
        import struct
        sh._lookups[991] = (1, [(1, {1: 99})])
        # SubRule: glyphCount=2, substCount=1, input=[2], rec (0, 991)
        rule = struct.pack(">HHHHH", 2, 1, 2, 0, 991)
        ruleset = struct.pack(">HH", 1, 4) + rule  # count=1, off=4
        off_rs = 8
        off_cov = off_rs + len(ruleset)
        blob = (
            struct.pack(">HHHH", 1, off_cov, 1, off_rs)
            + ruleset + self._cov([1])
        )
        parsed = sh._parse_subtable(blob, 5, 0, set())
        assert parsed[0] == 61
        assert parsed[1][1] == [((), (2,), (), [(0, 991)])]
        sh._lookups[993] = (5, [parsed])
        assert sh._apply_over(993, [1, 2]) == [99, 2]
        assert sh._apply_over(993, [1, 5]) == [1, 5]

    def test_type5_fmt2_class_rules(self, sh):
        import struct
        sh._lookups[991] = (1, [(1, {1: 99})])
        # ClassDef fmt1: glyphs 1..2 -> classes 7, 8
        cd = struct.pack(">HHHHH", 1, 1, 2, 7, 8)
        # SubClassRule: glyphCount=2, substCount=1, classes=[8], rec (0,991)
        rule = struct.pack(">HHHHH", 2, 1, 8, 0, 991)
        ruleset = struct.pack(">HH", 1, 4) + rule
        # header: fmt, covOff, cdOff, setCount=9, offs[9] (class 7 only)
        n_sets = 9
        head = 8 + 2 * n_sets
        off_cd = head
        off_rs = off_cd + len(cd)
        off_cov = off_rs + len(ruleset)
        offs = [0] * n_sets
        offs[7] = off_rs
        blob = (
            struct.pack(f">HHHH{n_sets}H", 2, off_cov, off_cd, n_sets, *offs)
            + cd + ruleset + self._cov([1])
        )
        parsed = sh._parse_subtable(blob, 5, 0, set())
        assert parsed[0] == 62
        sh._lookups[994] = (5, [parsed])
        assert sh._apply_over(994, [1, 2]) == [99, 2]   # class 7 then 8
        assert sh._apply_over(994, [1, 1]) == [1, 1]    # second is class 7

    def test_type8_reverse_chain(self, sh):
        import struct
        # cov [5,6] -> subs [50,60]; backtrack cov {9}; no lookahead
        cov_bt = self._cov([9])
        off_bt = 16  # header: 6 u16 fields + 2 substitute gids
        off_cov = off_bt + len(cov_bt)
        blob = (
            struct.pack(">HHHHHHHH", 1, off_cov, 1, off_bt, 0, 2, 50, 60)
            + cov_bt + self._cov([5, 6])
        )
        parsed = sh._parse_subtable(blob, 8, 0, set())
        assert parsed[0] == 8
        sh._lookups[995] = (8, [parsed])
        # gids[0]=9 matches backtrack for position 1 only.
        assert sh._apply_over(995, [9, 5, 6]) == [9, 50, 6]
        assert sh._apply_over(995, [5, 6]) == [5, 6]  # no backtrack match
        # Reverse order: later positions substitute first; a substituted
        # glyph becomes the backtrack context for earlier positions only
        # in logical order (backtrack looks left).
        assert sh._apply_over(995, [9, 5, 9, 6]) == [9, 50, 9, 60]
