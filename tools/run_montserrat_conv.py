"""Montserrat with the conv decoder: the structural fix, demonstrated.

The parity architecture underfits proportional layout (val 0.0169,
train == val — the 6400x19200 linear head is a per-(slot, pixel) glyph
dictionary and kerned x-offsets explode the dictionary), and the brute-force
16000-wide variant dies in clamp saturation without a leaky clamp
(extended_runs/montserrat_hc). This run keeps the flagship's exact frontend
(embed 32, 4 heads, fc1 64) and swaps only the decoder for the
position-equivariant conv pyramid — 266k params, ~460x fewer than parity.

Usage: python tools/run_montserrat_conv.py [epochs] [lr] [decoder] [--resume]
``decoder``: conv (resize+conv) or conv_ps (pixel-shuffle, MXU-friendly).
``--resume``: continue from the run's latest checkpoint (format-v2 restore
with best-weights snapshot and replay-consistent shuffles).
Artifacts in extended_runs/montserrat_<decoder>/.
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
from ai_font_renderer_tpu.models.font_renderer import param_count
from ai_font_renderer_tpu.render import render_strings
from ai_font_renderer_tpu.train import train
from ai_font_renderer_tpu.utils.checkpoint import save_params

def main() -> None:
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    resume = "--resume" in flags
    wide = "--wide" in flags  # 2x channel plan (~4M params) for capacity probes
    epochs = int(args[0]) if len(args) > 0 else 1000
    lr = float(args[1]) if len(args) > 1 else 1e-3
    decoder = args[2] if len(args) > 2 else "conv"
    out = f"extended_runs/montserrat_{decoder}" + ("_wide" if wide else "")
    t0 = time.time()
    atlas = bake_prop_atlas(MONTSERRAT_PATH)
    ds = build_device_dataset_prop(atlas, num_samples=150000)
    print(f"[montserrat-conv] dataset resident in {time.time() - t0:.1f}s", flush=True)

    mcfg = ModelConfig(
        decoder=decoder,
        bf16_frontend=True,
        bits_dropout=True,
        leaky_clamp=0.01,
        decoder_channels=(
            (256, 256, 128, 64, 32) if wide else ModelConfig.decoder_channels
        ),
    )
    tcfg = TrainConfig(
        num_epochs=epochs, learning_rate=lr, eval_every=25, checkpoint_every=100
    )
    r = train(
        ds,
        mcfg,
        tcfg,
        output_dir=out,
        eval_strings=TEST_STRINGS,
        checkpoint_dir=f"{out}/ckpt",
        resume=resume,
    )
    render_strings(r.params, TEST_STRINGS, out, mcfg)
    save_params(r.params, f"{out}/font_renderer_montserrat_{decoder}.npz")
    print(
        json.dumps(
            {
                "config": f"montserrat-{decoder} (parity frontend + {decoder} decoder)",
                "params": param_count(r.params),
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
