"""Cross-rasterizer fidelity study: our analytic AA vs FreeType/HarfBuzz.

The reference's ground truth is Cairo behind node-canvas
(generate_font.ts:100-141). Round 1 defined fidelity against our own
rasterizer (self-referential); this study closes the loop with an
INDEPENDENT renderer: Pillow's FreeType 2.14 with the Raqm layout engine —
i.e. real HarfBuzz shaping + kerning + FreeType hinted rasterization, the
same stack Cairo text uses.

Geometry matched to the dataset contract: 240x80 sheet, 12px font, baseline
at (line+1)*14.4, pen from x=0, our reference-exact word wrap.

Metrics per string set:
  * per-pixel MSE / PSNR (raw disagreement, includes hinting displacement)
  * 3x3-blurred MSE / PSNR (hinting shifts stems by <=1px; blurring both
    sides quantifies structural agreement beneath that displacement)

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/fidelity_study.py
"""

from __future__ import annotations

import numpy as np
from PIL import Image, ImageDraw, ImageFont

from ai_font_renderer_tpu.config import (
    FIRACODE_PATH,
    MONTSERRAT_PATH,
    SheetSpec,
)
from ai_font_renderer_tpu.fontgen import bake_atlas
from ai_font_renderer_tpu.fontgen.dataset import synthesize_ground_truth
from ai_font_renderer_tpu.fontgen.shaped import ShapedRenderer
from ai_font_renderer_tpu.fontgen.textgen import generate_corpus
from ai_font_renderer_tpu.fontgen.layout import wrap_text

TEST_STRINGS = None  # filled from cli module to avoid duplication


def pil_render(font_path, text, spec, engine=ImageFont.Layout.RAQM):
    """FreeType+Raqm render with the dataset geometry and our wrap."""
    ft = ImageFont.truetype(font_path, int(spec.font_size), layout_engine=engine)
    r = ShapedRenderer(font_path, spec)  # for the advance table / wrap only
    text = text[: spec.max_chars]
    lines = wrap_text(text, r._advances_for(text), spec.width - 2 * spec.padding)
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


def metrics(a, b):
    mse = float(np.mean((a - b) ** 2))
    bm = float(np.mean((blur3(a) - blur3(b)) ** 2))
    return mse, -10 * np.log10(max(mse, 1e-12)), bm, -10 * np.log10(max(bm, 1e-12))


def study(name, ours_list, pil_list):
    per = [metrics(o, p) for o, p in zip(ours_list, pil_list)]
    mse = np.array([m[0] for m in per])
    bmse = np.array([m[2] for m in per])
    print(
        f"{name:44s} n={len(per):3d}  MSE {mse.mean():.5f} "
        f"(max {mse.max():.5f}, PSNR {-10*np.log10(mse.mean()):.1f} dB)  "
        f"blur3 MSE {bmse.mean():.5f} (PSNR {-10*np.log10(bmse.mean()):.1f} dB)"
    )
    return mse.mean()


def main():
    from ai_font_renderer_tpu.cli import TEST_STRINGS

    spec = SheetSpec()
    corpus = generate_corpus(100)

    # --- FiraCode: the flagship training ground truth --------------------
    atlas = bake_atlas(FIRACODE_PATH, spec)
    shaped = ShapedRenderer(FIRACODE_PATH, spec)

    hinted = ShapedRenderer(FIRACODE_PATH, spec, hinted=True)

    for label, strings in [
        ("FiraCode 15 adversarial test strings", list(TEST_STRINGS)),
        ("FiraCode 100 corpus samples", corpus),
    ]:
        ours_atlas = np.asarray(synthesize_ground_truth(atlas, strings))
        pil = [pil_render(FIRACODE_PATH, s, spec) for s in strings]
        study(f"{label} [atlas truth vs FT+HB]", list(ours_atlas), pil)
        ours_sh = shaped.render_batch(strings)
        m_u = study(f"{label} [shaped vs FT+HB]", list(ours_sh), pil)
        ours_h = hinted.render_batch(strings)
        m_h = study(f"{label} [shaped+HINTED vs FT+HB]", list(ours_h), pil)
        print(
            f"  -> hinting emulation reduces the FreeType delta by "
            f"{100*(1-m_h/m_u):.0f}%"
        )

    # --- FiraCode ligatures: shaping must move us TOWARD HarfBuzz --------
    liga_strings = ["a->b != c", "x => y === z", "www <=> :: !="]
    pil = [pil_render(FIRACODE_PATH, s, spec) for s in liga_strings]
    sh_on = ShapedRenderer(FIRACODE_PATH, spec).render_batch(liga_strings)
    sh_off = ShapedRenderer(FIRACODE_PATH, spec, shape=False).render_batch(
        liga_strings
    )
    m_on = study("FiraCode ligature strings [shaped]", list(sh_on), pil)
    m_off = study("FiraCode ligature strings [shaping OFF]", list(sh_off), pil)
    print(f"  -> shaping reduces HarfBuzz delta by {100*(1-m_on/m_off):.0f}%")

    # --- Montserrat: kerning must move us TOWARD HarfBuzz ----------------
    kern_strings = ["AVATAR WAY TO VALUE", "Yo Two Ave LTA", "office fly fin"]
    pil = [pil_render(MONTSERRAT_PATH, s, spec) for s in kern_strings]
    k_on = ShapedRenderer(MONTSERRAT_PATH, spec).render_batch(kern_strings)
    k_off = ShapedRenderer(MONTSERRAT_PATH, spec, kern=False, shape=False).render_batch(
        kern_strings
    )
    m_on = study("Montserrat kerned strings [shape+kern]", list(k_on), pil)
    m_off = study("Montserrat kerned strings [both OFF]", list(k_off), pil)
    print(f"  -> shaping+kerning reduces HarfBuzz delta by {100*(1-m_on/m_off):.0f}%")


if __name__ == "__main__":
    main()
