"""Config-5 benchmark: SDF implicit model over the full printable-Unicode
charset of FiraCode, rendered as one batched atlas on device.

Trains the SDF-head implicit model (short budget by default), then measures
atlas-render glyphs/sec with the chained honest-timing method. Prints one
JSON line.

Run: python tools/bench_sdf_atlas.py [--steps 2000] [--cell 64]
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import jax
import jax.numpy as jnp

from ai_font_renderer_tpu.config import FIRACODE_PATH
from ai_font_renderer_tpu.fontgen.glyphs import unicode_charset
from ai_font_renderer_tpu.models import siren
from ai_font_renderer_tpu.train.implicit import train_siren


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--cell", type=int, default=64)
    ap.add_argument("--limit", type=int, default=None, help="cap charset size")
    args = ap.parse_args()

    charset = unicode_charset(FIRACODE_PATH, limit=args.limit)
    n = len(charset)
    print(f"# printable-unicode charset: {n} glyphs")

    cfg = siren.SirenConfig(
        n_chars=n, cell=args.cell, hidden_dim=128, n_layers=4, mode="sdf"
    )
    t0 = time.time()
    params, losses, _targets = train_siren(
        FIRACODE_PATH, cfg, charset, steps=args.steps, lr=5e-4, glyph_batch=256
    )
    train_s = time.time() - t0
    final_loss = float(losses[-1])

    # Batched atlas render in bounded glyph chunks; scalar fetch per window
    # keeps the timing honest.
    out = siren.render_atlas_chunked(params, cfg)
    float(out.mean())
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = siren.render_atlas_chunked(params, cfg)
    float(out.mean())
    dt = (time.perf_counter() - t0) / iters
    glyphs_per_sec = n / dt

    print(
        json.dumps(
            {
                "metric": "sdf_unicode_atlas_glyphs_per_sec",
                "value": round(glyphs_per_sec, 1),
                "unit": "glyphs/sec",
                "charset_size": n,
                "cell": args.cell,
                "train_seconds": round(train_s, 1),
                "final_sdf_mse": round(final_loss, 6),
            }
        )
    )


if __name__ == "__main__":
    main()
