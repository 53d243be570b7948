"""Data pipeline: TTF parsing, rasterization, text corpus, sheet synthesis.

Replaces the reference's Bun/node-canvas generator (generate_font.ts) and
PIL-based loader (helpers.py:107-181) with a first-party TTF->tensor path
whose sheets are synthesized on the TPU itself.
"""

from .atlas import GlyphAtlas, bake_atlas
from .bmp import encode_bmp, read_bmp, write_bmp
from .glyphs import rasterize_charset, sdf_charset, unicode_charset
from .kerning import KerningTable
from .layout import AdvanceTable, encode_codes, encode_grids, wrap_text
from .proportional import (
    PropAtlas,
    bake_prop_atlas,
    encode_prop_grids,
    synthesize_prop_sheets,
)
from .sheets import (
    SynthOps,
    make_synth_ops,
    synthesize_sheets,
    synthesize_sheets_host,
)
from .textgen import generate_corpus, generate_text
from .ttf import TrueTypeFont

__all__ = [
    "GlyphAtlas",
    "bake_atlas",
    "encode_bmp",
    "read_bmp",
    "write_bmp",
    "rasterize_charset",
    "sdf_charset",
    "unicode_charset",
    "KerningTable",
    "AdvanceTable",
    "encode_codes",
    "encode_grids",
    "wrap_text",
    "PropAtlas",
    "bake_prop_atlas",
    "encode_prop_grids",
    "synthesize_prop_sheets",
    "SynthOps",
    "make_synth_ops",
    "synthesize_sheets",
    "synthesize_sheets_host",
    "generate_corpus",
    "generate_text",
    "TrueTypeFont",
]
