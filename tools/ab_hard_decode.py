"""A/B the hard (discrete) placement decode against the soft one (TPU).

For each trained placement run directory (tools/train_placement.py
layout: siren.npz + placement.npz + placement_finetuned.npz), renders the
15 adversarial TEST_STRINGS fully neurally both ways and reports the
end-to-end render MSE vs the bitmap pipeline's ground truth — the same
eval the runs themselves log, so "soft" here reproduces the run's
`end_to_end_neural_render_mse` for the finetuned checkpoint.

Motivation (RESULTS.md structured-head runs): the soft decode is an
expectation over the predicted break structure — residual hedging in the
line distribution leaks fractional advances into x and fractional
baselines into y. apply(hard=True) commits to the argmax structure
(models/placement.py), which is only available at eval time because it
is not differentiable.

Usage: python tools/ab_hard_decode.py RUN_DIR [RUN_DIR ...]
Font is inferred from the directory name (montserrat/firacode).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ai_font_renderer_tpu.cli import TEST_STRINGS
from ai_font_renderer_tpu.config import (
    FIRACODE_PATH,
    MONTSERRAT_PATH,
    SheetSpec,
)
from ai_font_renderer_tpu.fontgen.atlas import bake_atlas
from ai_font_renderer_tpu.fontgen.dataset import synthesize_ground_truth
from ai_font_renderer_tpu.render.implicit_sheet import render_learned_sheets
from ai_font_renderer_tpu.utils.checkpoint import (
    load_params_with_config,
    load_siren,
)


def main() -> None:
    run_dirs = sys.argv[1:]
    if not run_dirs:
        print(__doc__)
        raise SystemExit(1)
    spec = SheetSpec()
    gt_cache: dict[str, np.ndarray] = {}
    for run_dir in run_dirs:
        font = "montserrat" if "montserrat" in run_dir else "firacode"
        font_path = MONTSERRAT_PATH if font == "montserrat" else FIRACODE_PATH
        if font not in gt_cache:
            if font == "montserrat":
                from ai_font_renderer_tpu.fontgen.proportional import (
                    bake_prop_atlas,
                )

                atlas = bake_prop_atlas(font_path)
            else:
                atlas = bake_atlas(font_path)
            gt = np.asarray(
                synthesize_ground_truth(atlas, TEST_STRINGS), np.float32
            )
            if gt.max() > 1.5:
                gt = gt / 255.0
            gt_cache[font] = gt
        gt = gt_cache[font]
        # Joint fine-tune runs (--finetune-joint) tune the bank too; the
        # run's own e2e eval used the tuned bank, so prefer it.
        bank = os.path.join(run_dir, "siren_finetuned.npz")
        if not os.path.exists(bank):
            bank = os.path.join(run_dir, "siren.npz")
        sp, scfg, charset = load_siren(bank)
        for name in ("placement.npz", "placement_finetuned.npz"):
            path = os.path.join(run_dir, name)
            if not os.path.exists(path):
                continue
            pp, pcfg = load_params_with_config(path)
            rec = {"run": run_dir, "checkpoint": name, "font": font}
            for mode, kw in (
                ("soft", {}),
                ("hard", {"hard": True}),
                ("mono", {"monotone": True}),
            ):
                sheets = render_learned_sheets(
                    sp, pp, TEST_STRINGS, font_path, scfg, pcfg, spec,
                    charset=charset, **kw,
                )
                rec[f"e2e_render_mse_{mode}"] = float(
                    np.mean((sheets - gt) ** 2)
                )
            rec["hard_vs_soft_pct"] = 100.0 * (
                rec["e2e_render_mse_hard"] / rec["e2e_render_mse_soft"] - 1.0
            )
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
