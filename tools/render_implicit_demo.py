"""Implicit-flagship hybrid demo: train the SIREN bank, compose sheets.

Trains the flagship-quality implicit glyph bank (64px cells, full printable
ASCII), renders the 15 adversarial test strings as composed sheets at 1x
(80x240, comparable to the bitmap pipeline) and 4x (320x960 — the
arbitrary-resolution capability the fixed linear head cannot express),
records fidelity vs the bitmap pipeline's ground truth and composition
throughput, and saves BMPs.

Usage: python tools/render_implicit_demo.py [steps]
Artifacts in extended_runs/implicit_sheets/; prints one JSON line.
"""

from __future__ import annotations

import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ai_font_renderer_tpu.cli import TEST_STRINGS
from ai_font_renderer_tpu.config import FIRACODE_PATH, PRINTABLE_ASCII
from ai_font_renderer_tpu.fontgen import bake_atlas
from ai_font_renderer_tpu.fontgen.bmp import write_bmp
from ai_font_renderer_tpu.fontgen.dataset import synthesize_ground_truth
from ai_font_renderer_tpu.fontgen.ttf import TrueTypeFont
from ai_font_renderer_tpu.models import siren
from ai_font_renderer_tpu.render.implicit_sheet import (
    build_layout,
    compose,
    place_glyphs,
    render_implicit_sheets,
)
from ai_font_renderer_tpu.train.implicit import train_siren

OUT = "extended_runs/implicit_sheets"


def main() -> None:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    t0 = time.time()
    cfg = siren.SirenConfig(n_chars=len(PRINTABLE_ASCII))
    params, losses, _ = train_siren(FIRACODE_PATH, cfg, steps=steps)
    glyph_mse = float(losses[-1])
    train_s = time.time() - t0

    os.makedirs(OUT, exist_ok=True)
    sheets1 = render_implicit_sheets(params, TEST_STRINGS, FIRACODE_PATH, cfg)
    gt = synthesize_ground_truth(bake_atlas(FIRACODE_PATH), TEST_STRINGS)
    fid_mse = float(np.mean((sheets1 - gt) ** 2))
    sheets4 = render_implicit_sheets(
        params, TEST_STRINGS, FIRACODE_PATH, cfg, scale=4.0
    )
    for i, (s1, s4) in enumerate(zip(sheets1, sheets4)):
        write_bmp(os.path.join(OUT, f"string_{i}.bmp"), s1)
        write_bmp(os.path.join(OUT, f"string_{i}_4x.bmp"), s4)

    # Composition throughput at 1x (chained timing: perturb instance
    # origins from the previous output, end with a scalar fetch).
    font = TrueTypeFont.load(FIRACODE_PATH)
    lay = build_layout(font, cell=cfg.cell)
    batch = [("HELLO WORLD " * 9)[: 10 + (i * 7) % 90] for i in range(256)]
    ids, origins, valid = place_glyphs(batch, font, lay)
    ids, origins, valid = jnp.asarray(ids), jnp.asarray(origins), jnp.asarray(valid)
    n_glyphs = int(valid.sum())

    @jax.jit
    def chain(orig, carry):
        out = compose(params, ids, orig + carry * 1e-6, valid, cfg, lay)
        return out, out[:, 0, 0].mean()

    out, carry = chain(origins, jnp.float32(0.0))
    jax.block_until_ready(out)
    iters = 20
    best = float("inf")
    for _ in range(3):
        t1 = time.perf_counter()
        c = jnp.float32(0.0)
        for _ in range(iters):
            out, c = chain(origins, c)
        float(c)
        best = min(best, time.perf_counter() - t1)
    gps = n_glyphs * iters / best

    print(
        json.dumps(
            {
                "config": "implicit-hybrid (SIREN bank + composed sheets)",
                "glyph_mse": round(glyph_mse, 8),
                "train_s": round(train_s, 1),
                "test_strings_mse_vs_truth": round(fid_mse, 8),
                "test_strings_psnr_db": round(
                    10.0 * np.log10(1.0 / max(fid_mse, 1e-12)), 2
                ),
                "compose_glyphs_per_sec": round(gps, 1),
                "scales_rendered": [1.0, 4.0],
                "wall_s": round(time.time() - t0, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
