"""Head-to-head harness, OUR side: train on the identical disk dataset.

Loads the same afr-fontgen-exported dataset the reference trainer consumed
(tools/h2h_reference.py) through the reference file contract
(fontgen/dataset.py:load_string_dataset = helpers.py:125-181 semantics) and
trains with the reference's own hyperparameters: batch 256, AdamW(1e-3,
wd 5e-4, betas (0.9, 0.99)), ReduceLROnPlateau(0.7/20), early stop 70,
80/20 split — so the only variables are the framework and the hardware.

Usage:
    python tools/h2h_ours.py DATA_DIR NUM_SAMPLES EPOCHS BATCH OUT_DIR
"""

from __future__ import annotations

import os
import sys
import time


def main() -> None:
    data_dir, num_samples, epochs, batch, out_dir = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        int(sys.argv[4]),
        sys.argv[5],
    )
    from ai_font_renderer_tpu.config import ModelConfig, TrainConfig
    from ai_font_renderer_tpu.fontgen.dataset import device_dataset_from_disk
    from ai_font_renderer_tpu.train import train

    t0 = time.time()
    ds = device_dataset_from_disk(data_dir, num_samples)
    print(f"[h2h] dataset loaded+resident in {time.time() - t0:.1f}s")

    mcfg = ModelConfig()
    tcfg = TrainConfig(
        num_epochs=epochs,
        batch_size=batch,
        num_samples=num_samples,
        eval_every=5,
    )
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    result = train(ds, mcfg, tcfg, output_dir=out_dir)
    wall = time.time() - t0
    print(
        f"[h2h] ours: best val {result.best_val_loss:.6f} after "
        f"{result.final_epoch} epochs in {wall:.1f}s "
        f"(early_stopped={result.early_stopped})"
    )


if __name__ == "__main__":
    main()
