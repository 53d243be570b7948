"""Golden regression locks on the dataset definition.

These hashes pin the *meaning* of the training data: the corpus strings
(bit-exact LCG reproduction of the reference generator), the baked glyph
atlas (8-bit quantized), and the synthesized sheets. Any change to the
rasterizer, layout, phases, or compositing that alters a single 8-bit pixel
level anywhere fails here — intentional changes must update the hashes and
say why in the commit.
"""

import hashlib

import numpy as np

from ai_font_renderer_tpu.config import FIRACODE_PATH
from ai_font_renderer_tpu.fontgen import (
    bake_atlas,
    encode_grids,
    generate_corpus,
    synthesize_sheets_host,
)

CORPUS16_SHEETS_SHA = (
    "1a02fab08632dda345b8a928ae742ef97862fc53ba8ef9d4867de66b5f50349d"
)
CORPUS16_STRINGS_SHA = (
    "15bb8b4435d3d7ec14f6a2b33f1fb3c01cf20d231addd5e5d24ac22fd53a6df2"
)
ATLAS_SHA = "fbdbe1be9bab654e65b47d173ac724acde1b839b2518691e6a90f7f5c264b153"


def test_corpus_strings_locked():
    texts = generate_corpus(16)
    h = hashlib.sha256("\n".join(texts).encode()).hexdigest()
    assert h == CORPUS16_STRINGS_SHA


def test_atlas_locked():
    atlas = bake_atlas(FIRACODE_PATH)
    u8 = np.round(atlas.table * 255).astype(np.uint8)
    assert hashlib.sha256(u8.tobytes()).hexdigest() == ATLAS_SHA


def test_synthesized_sheets_locked():
    atlas = bake_atlas(FIRACODE_PATH)
    texts = generate_corpus(16)
    grids = encode_grids(
        texts, atlas.advance_table(), atlas.spec, atlas.n_lines, atlas.n_slots
    )
    sheets = synthesize_sheets_host(atlas, grids)
    u8 = np.round(sheets * 255).astype(np.uint8)
    assert hashlib.sha256(u8.tobytes()).hexdigest() == CORPUS16_SHEETS_SHA
