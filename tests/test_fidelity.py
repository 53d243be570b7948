"""Cross-rasterizer fidelity bounds vs an INDEPENDENT renderer.

Pillow's FreeType 2.14 + Raqm (HarfBuzz) plays the role Cairo/node-canvas
plays for the reference (generate_font.ts:100-141): an external oracle for
our analytic rasterizer + shaping + kerning. Full numbers in RESULTS.md
(tools/fidelity_study.py); these tests pin regression bounds.

Residual model: FreeType hints (grid-fits) stems at 12px, displacing edges
by up to 1px — raw per-pixel MSE therefore floors around 0.01; a 3x3 blur
on both sides removes the sub-pixel displacement and exposes structural
agreement (~30 dB PSNR).
"""

import numpy as np
import pytest
from PIL import Image, ImageDraw, ImageFont

from ai_font_renderer_tpu.config import FIRACODE_PATH, MONTSERRAT_PATH, SheetSpec
from ai_font_renderer_tpu.fontgen import bake_atlas
from ai_font_renderer_tpu.fontgen.dataset import synthesize_ground_truth
from ai_font_renderer_tpu.fontgen.layout import wrap_text
from ai_font_renderer_tpu.fontgen.shaped import ShapedRenderer
from ai_font_renderer_tpu.fontgen.textgen import generate_corpus

SPEC = SheetSpec()


def pil_render(font_path, text, spec=SPEC):
    ft = ImageFont.truetype(
        font_path, int(spec.font_size), layout_engine=ImageFont.Layout.RAQM
    )
    helper = ShapedRenderer(font_path, spec)
    lines = wrap_text(
        text[: spec.max_chars],
        helper._advances_for(text),
        spec.width - 2 * spec.padding,
    )
    im = Image.new("L", (spec.width, spec.height), 255)
    d = ImageDraw.Draw(im)
    for l, line in enumerate(lines):
        d.text(
            (spec.padding, (l + 1) * spec.line_height),
            line,
            font=ft,
            fill=0,
            anchor="ls",
        )
    return np.asarray(im, np.float32) / 255.0


def blur3(x):
    k = np.ones(3) / 3.0
    x = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, x)
    return np.apply_along_axis(lambda c: np.convolve(c, k, "same"), 0, x)


def test_corpus_truth_matches_freetype_harfbuzz():
    """Training ground truth vs FreeType+HarfBuzz on 20 corpus sheets."""
    strings = generate_corpus(20)
    atlas = bake_atlas(FIRACODE_PATH, SPEC)
    ours = np.asarray(synthesize_ground_truth(atlas, strings))
    mses, bmses = [], []
    for o, s in zip(ours, strings):
        p = pil_render(FIRACODE_PATH, s)
        mses.append(float(np.mean((o - p) ** 2)))
        bmses.append(float(np.mean((blur3(o) - blur3(p)) ** 2)))
    assert np.mean(mses) < 0.015, f"raw MSE {np.mean(mses)}"
    assert np.mean(bmses) < 0.0025, f"blurred MSE {np.mean(bmses)}"


def test_kerning_closes_gap_to_harfbuzz():
    """Our GPOS kerning must move Montserrat renders toward HarfBuzz."""
    s = "AVATAR WAY TO VALUE"
    p = pil_render(MONTSERRAT_PATH, s)
    on = ShapedRenderer(MONTSERRAT_PATH, SPEC).render(s)
    off = ShapedRenderer(MONTSERRAT_PATH, SPEC, kern=False, shape=False).render(s)
    assert np.mean((on - p) ** 2) < 0.6 * np.mean((off - p) ** 2)


def test_shaping_closes_gap_to_harfbuzz():
    """Our GSUB ligatures must move FiraCode renders toward HarfBuzz."""
    s = "x => y === z"
    p = blur3(pil_render(FIRACODE_PATH, s))
    on = blur3(ShapedRenderer(FIRACODE_PATH, SPEC).render(s))
    off = blur3(ShapedRenderer(FIRACODE_PATH, SPEC, shape=False).render(s))
    assert np.mean((on - p) ** 2) < np.mean((off - p) ** 2)
