"""Summarize a training run's metrics.jsonl: best val, timings, LR path.

Usage: python tools/summarize_run.py RUN_DIR [RUN_DIR ...]
Prints one JSON line per run (host-only; no jax import).
"""

from __future__ import annotations

import json
import os
import sys


def summarize(run_dir: str) -> dict:
    path = os.path.join(run_dir, "metrics.jsonl")
    rows = [json.loads(l) for l in open(path) if l.strip()]
    best = min(rows, key=lambda r: r["val_loss"])
    steady = [r["seconds"] for r in rows[1:]] or [rows[0]["seconds"]]
    return {
        "run": run_dir,
        "epochs": len(rows),
        "best_val_loss": round(best["val_loss"], 8),
        "best_epoch": best["epoch"],
        "final_val_loss": round(rows[-1]["val_loss"], 8),
        "final_lr": rows[-1]["lr"],
        "epoch_seconds_median": round(sorted(steady)[len(steady) // 2], 3),
        "total_train_s": round(sum(r["seconds"] for r in rows), 1),
    }


def main() -> None:
    for d in sys.argv[1:]:
        print(json.dumps(summarize(d)))


if __name__ == "__main__":
    main()
