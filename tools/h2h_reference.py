"""Head-to-head harness: run the REFERENCE trainer on an afr-exported dataset.

Imports /root/reference/model.py unmodified and calls its
``train_attention_model`` (model.py:209-384) on a dataset produced by
``afr fontgen`` — the two frameworks then train on byte-identical disk data
(data.txt + {i}.bmp, the reference's own file contract, helpers.py:125-181).
Module-level constants are monkeypatched only to bound the run (epoch cap,
output dir); every training hyperparameter is left at the reference's values.

Usage:
    python tools/h2h_reference.py DATA_DIR NUM_SAMPLES EPOCHS BATCH OUT_DIR

Writes the reference's own config.txt/training_results.txt into OUT_DIR and
tees its stdout (the per-epoch loss prints) to OUT_DIR/train_log.txt for the
parity table in RESULTS.md.
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
        os.path.abspath(sys.argv[5]),
    )
    os.makedirs(out_dir, exist_ok=True)
    sys.path.insert(0, "/root/reference")
    os.chdir(out_dir)  # reference writes OUTPUT_DIR and epoch renders to cwd

    import model as ref  # noqa: E402  (reference import: seeds, device pick)
    from helpers import load_string_dataset  # noqa: E402

    ref.NUM_EPOCHS = epochs
    ref.NUM_SAMPLES = num_samples
    ref.OUTPUT_DIR = out_dir

    class Tee:
        def __init__(self, *streams):
            self.streams = streams

        def write(self, s):
            for st in self.streams:
                st.write(s)
                st.flush()

        def flush(self):
            for st in self.streams:
                st.flush()

    log = open(os.path.join(out_dir, "train_log.txt"), "w")
    sys.stdout = Tee(sys.__stdout__, log)

    t0 = time.time()
    dataset = load_string_dataset(
        data_dir=data_dir,
        num_samples=num_samples,
        sheet_height=ref.SHEET_HEIGHT,
        sheet_width=ref.SHEET_WIDTH,
    )
    print(f"[h2h] dataset loaded in {time.time() - t0:.1f}s")

    model = ref.AttentionFontRenderer(max_length=ref.MAX_CHARS_PER_SHEET).to(
        ref.device
    )
    t0 = time.time()
    ref.train_attention_model(model, dataset, batch)
    print(f"[h2h] reference training wall-clock: {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
