"""Export a run's metrics.jsonl to TensorBoard event files.

The training loop writes one JSON line per epoch (utils/metrics.py) — the
structured record the reference lacks (its observability is stdout prints,
model.py:348-360). This tool converts any run directory's metrics.jsonl
into TensorBoard scalars using torch's bundled SummaryWriter (no extra
dependencies; torch ships in this environment).

Usage:
    python tools/metrics_to_tensorboard.py RUN_DIR [RUN_DIR ...]
    tensorboard --logdir RUN_DIR/tb

Every numeric field in each record becomes a scalar tagged train/<field>,
stepped by the record's epoch (falling back to line number).
"""

from __future__ import annotations

import json
import os
import sys


def export(run_dir: str) -> str:
    path = os.path.join(run_dir, "metrics.jsonl")
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    from torch.utils.tensorboard import SummaryWriter

    out = os.path.join(run_dir, "tb")
    writer = SummaryWriter(log_dir=out)
    n = 0
    with open(path) as f:
        for lineno, line in enumerate(f):
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            step = int(rec.get("epoch", lineno))
            for key, val in rec.items():
                if key == "epoch" or isinstance(val, bool):
                    continue
                if isinstance(val, (int, float)):
                    writer.add_scalar(f"train/{key}", val, step)
            n += 1
    writer.close()
    print(f"{run_dir}: {n} epochs -> {out}")
    return out


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        raise SystemExit(1)
    for run_dir in sys.argv[1:]:
        export(run_dir)


if __name__ == "__main__":
    main()
