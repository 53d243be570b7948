"""Converge the Montserrat flagship config (VERDICT round-1, item 8).

Runs the proportional-layout Montserrat corpus (150k sheets, GPOS kerning,
GSUB liga shaping in layout) through the full flagship training recipe —
plateau LR schedule + early stop, exactly like the FiraCode run that reached
val 0.005157 at 737 epochs — instead of the 25-epoch taste from round 1.

Artifacts land in extended_runs/montserrat_converged/: metrics.jsonl (poll
this, not stdout), config.txt/training_results.txt manifests, periodic eval
renders, final weights npz. Prints one JSON summary line at the end.
"""

from __future__ import annotations

import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

from ai_font_renderer_tpu.cli import TEST_STRINGS
from ai_font_renderer_tpu.config import MONTSERRAT_PATH, ModelConfig, TrainConfig
from ai_font_renderer_tpu.fontgen.dataset import build_device_dataset_prop
from ai_font_renderer_tpu.fontgen.proportional import bake_prop_atlas
from ai_font_renderer_tpu.render import render_strings
from ai_font_renderer_tpu.train import train
from ai_font_renderer_tpu.utils.checkpoint import save_params

OUT = "extended_runs/montserrat_converged"


def main() -> None:
    t0 = time.time()
    atlas = bake_prop_atlas(MONTSERRAT_PATH)
    ds = build_device_dataset_prop(atlas, num_samples=150000)
    print(f"[montserrat] dataset resident in {time.time() - t0:.1f}s", flush=True)

    mcfg = ModelConfig()
    tcfg = TrainConfig(eval_every=50, checkpoint_every=100)
    r = train(
        ds,
        mcfg,
        tcfg,
        output_dir=OUT,
        eval_strings=TEST_STRINGS,
        checkpoint_dir=f"{OUT}/ckpt",
    )
    render_strings(r.params, TEST_STRINGS, OUT, mcfg)
    save_params(r.params, f"{OUT}/font_renderer_montserrat.npz")
    print(
        json.dumps(
            {
                "config": "montserrat-flagship-converged",
                "final_epoch": r.final_epoch,
                "best_val_loss": round(r.best_val_loss, 6),
                "early_stopped": r.early_stopped,
                "wall_s": round(time.time() - t0, 1),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
