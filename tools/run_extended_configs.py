"""Train + evaluate the extended configs (BASELINE.json 2-5) on TPU.

Produces artifacts under extended_runs/:
  * montserrat/   — flagship model trained on the Montserrat corpus,
                    test-string renders (config 2)
  * siren/        — implicit coverage MLP at 64x64, atlas sample (config 3)
  * multifont/    — font-conditioned model on both TTFs (config 4)
  * sdf_unicode/  — SDF head over the full printable-Unicode charset,
                    atlas render throughput (config 5)

Each section prints one JSON line; budgets are sized for a combined run of
roughly 15 minutes.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ai_font_renderer_tpu.config import (
    FIRACODE_PATH,
    MONTSERRAT_PATH,
    ModelConfig,
    TrainConfig,
)
from ai_font_renderer_tpu.fontgen.bmp import write_bmp

OUT = "extended_runs"


def section_montserrat(epochs=25):
    from ai_font_renderer_tpu.cli import TEST_STRINGS
    from ai_font_renderer_tpu.fontgen.dataset import build_device_dataset_prop
    from ai_font_renderer_tpu.fontgen.proportional import bake_prop_atlas
    from ai_font_renderer_tpu.render import render_strings
    from ai_font_renderer_tpu.train import train
    from ai_font_renderer_tpu.utils.checkpoint import save_params

    t0 = time.time()
    atlas = bake_prop_atlas(MONTSERRAT_PATH)
    ds = build_device_dataset_prop(atlas, num_samples=150000)
    mcfg = ModelConfig()
    tcfg = TrainConfig(num_epochs=epochs, eval_every=10**9, checkpoint_every=0)
    r = train(ds, mcfg, tcfg, log=lambda *_: None)
    d = f"{OUT}/montserrat"
    render_strings(r.params, TEST_STRINGS, d, mcfg)
    save_params(r.params, f"{d}/font_renderer_montserrat.npz")
    print(
        json.dumps(
            {
                "config": "montserrat-flagship",
                "epochs": epochs,
                "best_val_loss": round(r.best_val_loss, 6),
                "wall_s": round(time.time() - t0, 1),
            }
        ),
        flush=True,
    )


def section_siren(steps=3000):
    from ai_font_renderer_tpu.config import PRINTABLE_ASCII
    from ai_font_renderer_tpu.models import siren
    from ai_font_renderer_tpu.train.implicit import train_siren

    t0 = time.time()
    cfg = siren.SirenConfig(n_chars=95, cell=64, hidden_dim=128, n_layers=4)
    params, losses, targets = train_siren(
        FIRACODE_PATH, cfg, PRINTABLE_ASCII, steps=steps, lr=5e-4
    )
    atlas = np.asarray(siren.render_atlas(params, cfg))
    mse = float(np.mean((atlas - targets) ** 2))
    d = f"{OUT}/siren"
    os.makedirs(d, exist_ok=True)
    # Sample sheet: A-Z tiled 4 rows x 8 cols.
    idx = [ord(c) - 32 for c in "ABCDEFGHIJKLMNOPQRSTUVWXYZ"]
    tile = np.ones((4 * 64, 8 * 64), np.float32)
    for k, i in enumerate(idx[:32]):
        r, c = divmod(k, 8)
        tile[r * 64 : (r + 1) * 64, c * 64 : (c + 1) * 64] = 1.0 - atlas[i]
    write_bmp(f"{d}/atlas_sample.bmp", tile)
    print(
        json.dumps(
            {
                "config": "siren-implicit-64",
                "steps": steps,
                "final_train_mse": round(float(losses[-1]), 6),
                "atlas_mse": round(mse, 6),
                "wall_s": round(time.time() - t0, 1),
            }
        ),
        flush=True,
    )


def section_multifont(steps=4000):
    from ai_font_renderer_tpu.config import PRINTABLE_ASCII
    from ai_font_renderer_tpu.models import multifont as mf
    from ai_font_renderer_tpu.train.implicit import train_multifont

    t0 = time.time()
    cfg = mf.MultiFontConfig(
        n_fonts=2, n_chars=95, cell=64, hidden_dim=128, n_layers=4
    )
    params, losses, targets = train_multifont(
        [FIRACODE_PATH, MONTSERRAT_PATH], cfg, PRINTABLE_ASCII, steps=steps, lr=5e-4
    )
    atlas = np.asarray(mf.render_atlas(params, cfg))
    mse = float(np.mean((atlas.reshape(targets.shape) - targets) ** 2))
    d = f"{OUT}/multifont"
    os.makedirs(d, exist_ok=True)
    # Side-by-side: 'ABCDEF' in both fonts.
    idx = [ord(c) - 32 for c in "ABCDEF"]
    tile = np.ones((2 * 64, 6 * 64), np.float32)
    for f in range(2):
        for k, i in enumerate(idx):
            tile[f * 64 : (f + 1) * 64, k * 64 : (k + 1) * 64] = 1.0 - atlas[f, i]
    write_bmp(f"{d}/two_fonts_sample.bmp", tile)
    print(
        json.dumps(
            {
                "config": "multifont-2ttf",
                "steps": steps,
                "atlas_mse": round(mse, 6),
                "wall_s": round(time.time() - t0, 1),
            }
        ),
        flush=True,
    )


def section_sdf_unicode(steps=2000):
    from ai_font_renderer_tpu.fontgen.glyphs import unicode_charset
    from ai_font_renderer_tpu.models import siren
    from ai_font_renderer_tpu.train.implicit import train_siren

    t0 = time.time()
    charset = unicode_charset(FIRACODE_PATH)
    n = len(charset)
    cfg = siren.SirenConfig(
        n_chars=n, cell=64, hidden_dim=128, n_layers=4, mode="sdf"
    )
    params, losses, _ = train_siren(
        FIRACODE_PATH, cfg, charset, steps=steps, lr=5e-4, glyph_batch=256
    )
    train_s = time.time() - t0

    out = siren.render_atlas_chunked(params, cfg)
    float(out.mean())
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = siren.render_atlas_chunked(params, cfg)
    float(out.mean())
    dt = (time.perf_counter() - t0) / iters
    d = f"{OUT}/sdf_unicode"
    os.makedirs(d, exist_ok=True)
    atlas = np.asarray(out)
    # Zero-level-set preview of a few glyphs (coverage ~ sdf<0).
    idx = [ord(c) - 32 for c in "AQ@"]
    tile = np.concatenate([(atlas[i] < 0).astype(np.float32) for i in idx], axis=1)
    write_bmp(f"{d}/sdf_levelset_sample.bmp", 1.0 - tile)
    print(
        json.dumps(
            {
                "config": "sdf-unicode-atlas",
                "charset_size": n,
                "steps": steps,
                "final_sdf_mse": round(float(losses[-1]), 6),
                "atlas_glyphs_per_sec": round(n / dt, 1),
                "train_wall_s": round(train_s, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sections",
        default="siren,multifont,sdf_unicode,montserrat",
        help="comma-separated subset to run",
    )
    args = ap.parse_args()
    os.makedirs(OUT, exist_ok=True)
    table = {
        "siren": section_siren,
        "multifont": section_multifont,
        "sdf_unicode": section_sdf_unicode,
        "montserrat": section_montserrat,
    }
    for name in args.sections.split(","):
        table[name.strip()]()
    print("# extended configs complete")
