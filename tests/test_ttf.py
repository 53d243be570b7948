"""TTF parser tests against the bundled fonts."""

import numpy as np
import pytest

from ai_font_renderer_tpu.config import FIRACODE_PATH, MONTSERRAT_PATH, PRINTABLE_ASCII
from ai_font_renderer_tpu.fontgen.ttf import TrueTypeFont


@pytest.fixture(scope="module")
def firacode():
    return TrueTypeFont.load(FIRACODE_PATH)


@pytest.fixture(scope="module")
def montserrat():
    return TrueTypeFont.load(MONTSERRAT_PATH)


def test_firacode_metrics(firacode):
    assert firacode.units_per_em == 1950
    assert firacode.num_glyphs > 1000
    assert firacode.ascent > 0 and firacode.descent < 0


def test_firacode_monospace(firacode):
    advances = {firacode.advance(firacode.glyph_id(ord(c))) for c in PRINTABLE_ASCII}
    assert advances == {1200}


def test_montserrat_proportional(montserrat):
    adv_i = montserrat.advance(montserrat.glyph_id(ord("I")))
    adv_w = montserrat.advance(montserrat.glyph_id(ord("W")))
    assert adv_w > adv_i


def test_all_printable_ascii_mapped(firacode, montserrat):
    for font in (firacode, montserrat):
        for c in PRINTABLE_ASCII:
            assert font.glyph_id(ord(c)) != 0, f"unmapped char {c!r}"


def test_space_is_empty(firacode):
    glyph = firacode.glyph(firacode.glyph_id(ord(" ")))
    assert glyph.is_empty


def test_letter_outline_sane(firacode):
    glyph = firacode.glyph(firacode.glyph_id(ord("A")))
    assert not glyph.is_empty
    assert glyph.y_max > glyph.y_min
    assert glyph.x_max <= 1200 + 100  # roughly within the advance
    for contour in glyph.contours:
        assert len(contour) >= 3


def test_composite_glyphs_decode(montserrat):
    # Accented glyphs are composites in most fonts; ensure decode path works.
    for cp in [0xC0, 0xC9, 0xD6]:  # À É Ö
        gid = montserrat.glyph_id(cp)
        if gid:
            glyph = montserrat.glyph(gid)
            assert not glyph.is_empty
            return
    pytest.skip("no composite glyphs mapped in test range")
