"""Light hinting emulation (fontgen/hinting.py) vs FreeType.

Calibration facts these tests pin (measured against PIL's FreeType 2.14,
see RESULTS.md): blue-zone tops expand up (FiraCode cap 8.48px -> 9,
x-height 6.49 -> 7), bottoms down (descender -2.63 -> -3), overshoot
apexes join their zone, internal stem edges round to the nearest line,
baselines round half-down — and the emulation must cut the raw FreeType
delta roughly in half on real strings (the fidelity regression)."""

import numpy as np
import pytest
from PIL import Image, ImageDraw, ImageFont

from ai_font_renderer_tpu.config import FIRACODE_PATH, SheetSpec
from ai_font_renderer_tpu.fontgen.hinting import BlueZones, hint_segments
from ai_font_renderer_tpu.fontgen.raster import flatten_glyph, rasterize_segments
from ai_font_renderer_tpu.fontgen.shaped import ShapedRenderer
from ai_font_renderer_tpu.fontgen.ttf import TrueTypeFont

SPEC = SheetSpec()


@pytest.fixture(scope="module")
def font():
    return TrueTypeFont.load(FIRACODE_PATH)


@pytest.fixture(scope="module")
def zones(font):
    return BlueZones.from_font(font, SPEC.font_size / font.units_per_em)


def test_blue_zones_expand_to_grid(zones):
    z = dict((round(a, 2), b) for a, b in zones.zones)
    assert z[0.0] == 0.0  # baseline
    assert z[8.48] == 9.0  # cap height: ceil
    assert z[6.49] == 7.0  # x-height: ceil
    assert z[-2.63] == -3.0  # descender: floor


def test_zone_capture_takes_overshoots(zones):
    assert zones.capture(8.63) == 9.0  # O apex joins the cap zone
    assert zones.capture(-0.15) == 0.0  # bowl bottoms join the baseline
    assert zones.capture(4.0) is None  # mid-glyph is nobody's zone


def test_hinted_H_matches_freetype_rows(font, zones):
    """The canonical probe: hinted H must reproduce FreeType's crisp rows
    (cap top at integer row, one-row crossbar) to ~1e-4 MSE."""
    scale = SPEC.font_size / font.units_per_em
    gid = font.glyph_id(ord("H"))
    segs = hint_segments(flatten_glyph(font.glyph(gid), scale), zones)
    W, H, base = 12, 18, 13.0
    d = np.empty_like(segs)
    d[:, 0] = segs[:, 0] + 1.0
    d[:, 2] = segs[:, 2] + 1.0
    d[:, 1] = base - segs[:, 1]
    d[:, 3] = base - segs[:, 3]
    ours = rasterize_segments(d.astype(np.float64), W, H)
    ft = ImageFont.truetype(FIRACODE_PATH, 12)
    im = Image.new("L", (W, H), 255)
    ImageDraw.Draw(im).text((1.0, base), "H", font=ft, fill=0, anchor="ls")
    theirs = 1.0 - np.asarray(im, np.float32) / 255.0
    assert float(np.mean((ours - theirs) ** 2)) < 5e-4


def test_hinting_halves_freetype_delta():
    """Regression bound on real strings: raw MSE vs FreeType with hinting
    must stay well under the unhinted raw MSE (measured 0.0046 vs 0.0113
    on the 15 test strings; bound at 65%)."""
    from ai_font_renderer_tpu.cli import TEST_STRINGS

    strings = TEST_STRINGS[:6]
    ft = ImageFont.truetype(FIRACODE_PATH, 12)
    helper = ShapedRenderer(FIRACODE_PATH, SPEC)
    from ai_font_renderer_tpu.fontgen.layout import wrap_text

    pil = []
    for s in strings:
        lines = wrap_text(
            s[: SPEC.max_chars],
            helper._advances_for(s),
            SPEC.width - 2 * SPEC.padding,
        )
        im = Image.new("L", (SPEC.width, SPEC.height), 255)
        d = ImageDraw.Draw(im)
        for l, line in enumerate(lines):
            d.text(
                (SPEC.padding, (l + 1) * SPEC.line_height),
                line,
                font=ft,
                fill=0,
                anchor="ls",
            )
        pil.append(np.asarray(im, np.float32) / 255.0)
    un = ShapedRenderer(FIRACODE_PATH, SPEC).render_batch(strings)
    hi = ShapedRenderer(FIRACODE_PATH, SPEC, hinted=True).render_batch(strings)
    mse_u = float(np.mean([(a - b) ** 2 for a, b in zip(un, pil)]))
    mse_h = float(np.mean([(a - b) ** 2 for a, b in zip(hi, pil)]))
    assert mse_h < 0.65 * mse_u, (mse_h, mse_u)


def test_hinting_leaves_dataset_contract_alone():
    """hinted=False (the default everywhere) must keep byte-identical
    output — the golden-locked dataset definition does not change."""
    a = ShapedRenderer(FIRACODE_PATH, SPEC).render_batch(["HINT FREE"])
    b = ShapedRenderer(FIRACODE_PATH, SPEC, hinted=False).render_batch(
        ["HINT FREE"]
    )
    np.testing.assert_array_equal(a, b)
