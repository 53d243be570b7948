"""Rasterizer tests: analytic coverage properties + native/python agreement."""

import numpy as np
import pytest

from ai_font_renderer_tpu.config import FIRACODE_PATH
from ai_font_renderer_tpu.fontgen import native
from ai_font_renderer_tpu.fontgen.raster import (
    flatten_glyph,
    rasterize_glyph,
    rasterize_segments,
)
from ai_font_renderer_tpu.fontgen.ttf import TrueTypeFont


def _square(x0, y0, x1, y1):
    """Closed clockwise-in-device-space rectangle as segments."""
    return np.array(
        [
            [x0, y0, x1, y0],
            [x1, y0, x1, y1],
            [x1, y1, x0, y1],
            [x0, y1, x0, y0],
        ],
        np.float32,
    )


def test_unit_square_exact_coverage():
    cov = rasterize_segments(_square(1.0, 1.0, 3.0, 3.0), 5, 5)
    expected = np.zeros((5, 5), np.float32)
    expected[1:3, 1:3] = 1.0
    np.testing.assert_allclose(cov, expected, atol=1e-6)


def test_half_pixel_coverage():
    cov = rasterize_segments(_square(0.5, 0.0, 1.5, 1.0), 3, 1)
    np.testing.assert_allclose(cov[0], [0.5, 0.5, 0.0], atol=1e-6)


def test_subpixel_translation_conserves_area():
    base = _square(1.0, 1.0, 3.0, 2.5)
    a = rasterize_segments(base, 6, 5).sum()
    for dx, dy in [(0.3, 0.0), (0.0, 0.7), (0.63, 0.29)]:
        shifted = base.copy()
        shifted[:, [0, 2]] += dx
        shifted[:, [1, 3]] += dy
        b = rasterize_segments(shifted, 6, 5).sum()
        assert abs(a - b) < 1e-5  # analytic AA conserves total ink


def test_triangle_area():
    tri = np.array(
        [[0, 0, 4, 0], [4, 0, 0, 4], [0, 4, 0, 0]],
        np.float32,
    )
    cov = rasterize_segments(tri, 6, 6)
    assert abs(cov.sum() - 8.0) < 1e-5  # area of the 4x4 right triangle


def test_winding_direction_invariance():
    sq = _square(1.0, 1.0, 3.0, 3.0)
    reversed_sq = sq[::-1, [2, 3, 0, 1]]  # reverse each segment + order
    a = rasterize_segments(sq, 5, 5)
    b = rasterize_segments(reversed_sq, 5, 5)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_clipping_left_and_right():
    cov = rasterize_segments(_square(-2.0, 0.0, 2.0, 1.0), 3, 1)
    np.testing.assert_allclose(cov[0], [1.0, 1.0, 0.0], atol=1e-6)
    cov = rasterize_segments(_square(1.0, 0.0, 10.0, 1.0), 3, 1)
    np.testing.assert_allclose(cov[0], [0.0, 1.0, 1.0], atol=1e-6)


def test_glyph_renders_ink():
    font = TrueTypeFont.load(FIRACODE_PATH)
    scale = 12.0 / font.units_per_em
    cov = rasterize_glyph(font.glyph(font.glyph_id(ord("A"))), scale, 10, 14, 0.5, 10.0)
    assert cov.max() > 0.9  # solid strokes reach full coverage
    assert 5.0 < cov.sum() < 40.0  # plausible ink area for a 12px letter
    assert cov.min() == 0.0


def test_hole_in_O_is_white():
    font = TrueTypeFont.load(FIRACODE_PATH)
    scale = 12.0 / font.units_per_em
    cov = rasterize_glyph(font.glyph(font.glyph_id(ord("O"))), scale, 10, 14, 0.5, 10.0)
    # Counter (inner contour) must cut a hole: the glyph center is empty
    # (baseline at y=10, cap height ~8.6px -> center around row 5-6, col 3-4).
    assert cov[5:7, 3:5].max() < 0.2
    # ... while the rims above and below are inked.
    assert cov[2, 3:5].max() > 0.5 and cov[9, 3:5].max() > 0.5


@pytest.mark.skipif(not native.native_available(), reason="no C++ toolchain")
def test_native_matches_python():
    font = TrueTypeFont.load(FIRACODE_PATH)
    scale = 12.0 / font.units_per_em
    all_segs, offsets = [], [0]
    for ch in "AQW@g&":
        segs = flatten_glyph(font.glyph(font.glyph_id(ord(ch))), scale)
        dev = np.empty_like(segs)
        dev[:, 0] = segs[:, 0] + 0.37
        dev[:, 1] = 10.61 - segs[:, 1]
        dev[:, 2] = segs[:, 2] + 0.37
        dev[:, 3] = 10.61 - segs[:, 3]
        all_segs.append(dev)
        offsets.append(offsets[-1] + len(dev))
    segments = np.concatenate(all_segs)
    got = native.rasterize_batch(segments, np.array(offsets, np.int64), 10, 15)
    for i in range(len(offsets) - 1):
        want = rasterize_segments(segments[offsets[i] : offsets[i + 1]], 10, 15)
        np.testing.assert_allclose(got[i], want, atol=2e-5)
