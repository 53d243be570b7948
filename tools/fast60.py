"""Fast-profile experiments: best val loss within a ~60s training budget.

Builds the full 150k-sample device dataset once, then trains the flagship
model under several cosine schedules with a fixed epoch budget, reporting
val loss and pure-train wall time for each. Reference points from the
converged plateau run (500-epoch budget, ~18 min): val 0.0095 @ 27 flat-LR
epochs, plateau floor ~0.00548.

Run: python tools/fast60.py [--epochs 25] [--budget-s 60]
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

from ai_font_renderer_tpu.config import (
    FIRACODE_PATH,
    ModelConfig,
    TrainConfig,
    replace,
)
from ai_font_renderer_tpu.fontgen import bake_atlas
from ai_font_renderer_tpu.fontgen.dataset import build_device_dataset
from ai_font_renderer_tpu.train import train


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=25)
    ap.add_argument("--samples", type=int, default=150000)
    args = ap.parse_args()

    atlas = bake_atlas(FIRACODE_PATH)
    print("building dataset...", flush=True)
    ds = build_device_dataset(atlas, args.samples)
    mcfg = ModelConfig()

    configs = [
        ("plateau-flat", dict(schedule="plateau")),
        ("cosine-1e3", dict(schedule="cosine", peak_learning_rate=1e-3)),
        ("cosine-2e3", dict(schedule="cosine", peak_learning_rate=2e-3)),
        ("cosine-3e3", dict(schedule="cosine", peak_learning_rate=3e-3)),
    ]
    results = []
    for name, kw in configs:
        tcfg = TrainConfig(
            num_epochs=args.epochs,
            num_samples=args.samples,
            eval_every=10**9,  # no mid-run renders: pure train time
            checkpoint_every=0,
            **kw,
        )
        t0 = time.time()
        r = train(ds, mcfg, tcfg, log=lambda *_: None)
        wall = time.time() - t0
        train_s = sum(h["seconds"] for h in r.history)
        print(
            json.dumps(
                {
                    "config": name,
                    "epochs": args.epochs,
                    "best_val_loss": round(r.best_val_loss, 6),
                    "train_wall_s": round(train_s, 1),
                    "total_wall_s": round(wall, 1),
                }
            ),
            flush=True,
        )
        results.append((name, r.best_val_loss))
    best = min(results, key=lambda x: x[1])
    print(f"# best: {best[0]} val={best[1]:.6f}")


if __name__ == "__main__":
    main()
