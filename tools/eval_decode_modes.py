"""Val-position metrics per placement decode mode (TPU).

The long-budget placement runs (RESULTS.md) pinned val WORST position
error at ~1 sheet width: isolated mispredicted line breaks. The hard and
monotone decodes (models/placement.py apply ``hard``/``monotone``) attack
exactly that failure, but the runs' metrics.jsonl only logs the soft
decode. This tool reproduces each run's own val protocol — 100k-sample
LCG corpus, seed-42 permutation, first 4096 of the 20% val split,
engine targets via placement_targets — and reports RMSE / worst / error
tail / decoded-line accuracy for soft vs hard vs monotone decode, so the
decode's effect is measured on the same numbers the runs report.

Usage: python tools/eval_decode_modes.py RUN_DIR [RUN_DIR ...]
       [--samples 100000] [--val 4096]
Font is inferred from the directory name (montserrat/firacode).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax.numpy as jnp
import numpy as np

from ai_font_renderer_tpu.config import (
    FIRACODE_PATH,
    MONTSERRAT_PATH,
    PRINTABLE_ASCII,
    SheetSpec,
)
from ai_font_renderer_tpu.fontgen.layout import encode_codes
from ai_font_renderer_tpu.fontgen.textgen import generate_corpus
from ai_font_renderer_tpu.models import placement
from ai_font_renderer_tpu.utils.checkpoint import load_params_with_config
from train_placement import build_table


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dirs", nargs="+")
    ap.add_argument("--samples", type=int, default=100000)
    ap.add_argument("--val", type=int, default=4096)
    args = ap.parse_args()

    spec = SheetSpec()
    lh = spec.line_height
    cache: dict[str, tuple] = {}
    for run_dir in args.run_dirs:
        font = "montserrat" if "montserrat" in run_dir else "firacode"
        if font not in cache:
            font_path = MONTSERRAT_PATH if font == "montserrat" else FIRACODE_PATH
            table = build_table(
                font_path, spec, PRINTABLE_ASCII, kerned=font == "montserrat"
            )
            strings = generate_corpus(args.samples)
            mids, vis, line_t, contrib = placement.placement_targets(
                strings, table, spec, full=True
            )
            perm = np.random.default_rng(42).permutation(args.samples)
            vi = perm[: args.samples // 5][: args.val]
            cache[font] = (
                jnp.asarray(encode_codes(strings, spec.max_chars)[vi]),
                mids[vi],
                vis[vi],
                line_t[vi],
            )
        codes, mids, vis, line_t = cache[font]
        for name in ("placement.npz", "placement_finetuned.npz"):
            path = os.path.join(run_dir, name)
            if not os.path.exists(path):
                continue
            pp, pcfg = load_params_with_config(path)
            L = placement.head_lines(pp)
            tgt = np.clip(line_t, 0, max(L - 1, 0))
            for mode, kw in (
                ("soft", {}),
                ("hard", {"hard": True}),
                ("mono", {"monotone": True}),
            ):
                xy, logit = placement.apply(
                    pp, codes, pcfg, train=False, **kw
                )
                xy = np.asarray(xy)
                err = np.sqrt(np.sum((xy - mids) ** 2, -1))[vis]
                rec = {
                    "run": run_dir,
                    "checkpoint": name,
                    "mode": mode,
                    "val_rmse_px": float(np.sqrt(np.mean(err**2))),
                    "val_worst_px": float(err.max()),
                    "val_p99_px": float(np.percentile(err, 99)),
                    "frac_err_gt_half_line": float(
                        np.mean(err > 0.5 * lh)
                    ),
                }
                if L:
                    # Accuracy of the DECODED line (y / line_height - 1)
                    # on visible slots — for mono this scores the
                    # Viterbi path, not the raw argmax.
                    dec = np.clip(
                        np.round(xy[..., 1] / lh).astype(np.int32) - 1,
                        0,
                        L - 1,
                    )
                    rec["val_line_acc"] = float(
                        np.mean((dec == tgt)[vis])
                    )
                print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
