"""High-capacity Montserrat variant: the demonstrated fix for the
proportional-layout underfit (RESULTS.md).

The parity-architecture run (tools/run_montserrat_converged.py) plateaus at
val 0.0169 with train ~= val — underfitting, because the flagship's
6400-dim bottleneck cannot represent glyph dictionaries at every kerned
x-offset. This non-parity config widens the frontend (embed 64, 8 heads,
fc1 160 -> flat 16000, out GEMM 16000x19200 = 307M params) and trains the
same corpus with the same recipe, capped at --epochs (default 400).

Artifacts in extended_runs/montserrat_hc/.
"""

from __future__ import annotations

import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import sys
import time

from ai_font_renderer_tpu.cli import TEST_STRINGS
from ai_font_renderer_tpu.config import MONTSERRAT_PATH, ModelConfig, TrainConfig
from ai_font_renderer_tpu.fontgen.dataset import build_device_dataset_prop
from ai_font_renderer_tpu.fontgen.proportional import bake_prop_atlas
from ai_font_renderer_tpu.render import render_strings
from ai_font_renderer_tpu.train import train
from ai_font_renderer_tpu.utils.checkpoint import save_params

OUT = "extended_runs/montserrat_hc"


def main() -> None:
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    # The 16000-wide output layer saturates the (0,1) clamp all-white in
    # the first epochs and freezes at the all-white MSE (0.026839) with
    # zero gradient — measured at BOTH lr 1e-3 and 5e-4 (early-stopped at
    # epoch 70 with best == epoch 0). The fix is the training-only leaky
    # clamp below, which keeps a restoring gradient on saturated pixels.
    lr = float(sys.argv[2]) if len(sys.argv) > 2 else 5e-4
    t0 = time.time()
    atlas = bake_prop_atlas(MONTSERRAT_PATH)
    ds = build_device_dataset_prop(atlas, num_samples=150000)
    print(f"[montserrat-hc] dataset resident in {time.time() - t0:.1f}s", flush=True)

    mcfg = ModelConfig(
        embedding_dim=64,
        num_heads=8,
        hidden_dim=160,
        bf16_frontend=True,
        bits_dropout=True,
        leaky_clamp=0.01,
    )
    tcfg = TrainConfig(
        num_epochs=epochs, learning_rate=lr, eval_every=50, checkpoint_every=200
    )
    r = train(
        ds,
        mcfg,
        tcfg,
        output_dir=OUT,
        eval_strings=TEST_STRINGS,
        checkpoint_dir=f"{OUT}/ckpt",
    )
    render_strings(r.params, TEST_STRINGS, OUT, mcfg)
    save_params(r.params, f"{OUT}/font_renderer_montserrat_hc.npz")
    print(
        json.dumps(
            {
                "config": "montserrat-hc (embed 64, heads 8, fc1 160, 307M)",
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
