#!/usr/bin/env python
"""Run a StableHLO render artifact with ZERO framework code.

This file is the deployment-side proof of the `afr export` contract
(utils/export.py): it imports only `jax` and `numpy` — never
`ai_font_renderer_tpu` — and still renders strings to BMP files. The
whole input/output contract travels in the artifact's avals:
int32[b, max_length] codes in, uint8[b, H, W] sheets out, batch dim
symbolic. Compare: the reference's saved weights need its Python model
class to execute (reference helpers.py:76-105).

Usage:
    python tools/run_exported_standalone.py ARTIFACT OUT_DIR STRING...

Copy this single file next to an artifact on any machine with jax
installed for a platform the artifact lists (afr export --platforms)
and it works — that is the claim it exists to keep honest
(tests/test_export.py runs it in a subprocess with the repo package
masked out).
"""

import os
import struct
import sys

import numpy as np


def encode(strings, max_length):
    """Strings -> int32[b, max_length] ASCII codes, zero-padded/truncated.

    This is the reference's own wire encoding (ord() + zero pad,
    reference helpers.py:57-59) — ~5 lines, no framework needed.
    """
    out = np.zeros((len(strings), max_length), dtype=np.int32)
    for i, s in enumerate(strings):
        # Mask to 7 bits like the framework's encode_codes: codes >= 128
        # would otherwise clamp inside the artifact's embedding gather
        # and silently diverge from `afr render --exported`.
        codes = [ord(c) & 0x7F for c in s[:max_length]]
        out[i, : len(codes)] = codes
    return out


def write_bmp_gray(path, img):
    """uint8[H, W] -> 24-bit BGR top-down BMP (the reference byte format)."""
    h, w = img.shape
    row = (w * 3 + 3) & ~3
    size = 54 + row * h
    with open(path, "wb") as f:
        f.write(b"BM" + struct.pack("<IHHI", size, 0, 0, 54))
        f.write(struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 24, 0, row * h, 2835, 2835, 0, 0))
        pad = b"\x00" * (row - w * 3)
        for y in range(h):
            f.write(np.repeat(img[y], 3).tobytes() + pad)


def main(argv):
    if len(argv) < 3:
        print(__doc__)
        return 1
    artifact, out_dir, strings = argv[0], argv[1], argv[2:] or ["HELLO WORLD"]

    from jax import export as jax_export

    with open(artifact, "rb") as f:
        exported = jax_export.deserialize(f.read())
    (in_aval,) = exported.in_avals
    max_length = int(in_aval.shape[1])

    sheets = np.asarray(exported.call(encode(strings, max_length)))
    os.makedirs(out_dir, exist_ok=True)
    for i, sheet in enumerate(sheets):
        write_bmp_gray(os.path.join(out_dir, f"string_{i}.bmp"), sheet)
    print(f"standalone: rendered {len(sheets)} sheets {sheets.shape[1:]} to {out_dir}/")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
