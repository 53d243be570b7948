"""Native corpus generator: bit-exactness lock vs the Python implementation."""

import numpy as np
import pytest

from ai_font_renderer_tpu.config import FIRACODE_PATH, SheetSpec
from ai_font_renderer_tpu.fontgen import bake_atlas
from ai_font_renderer_tpu.fontgen import native
from ai_font_renderer_tpu.fontgen.layout import encode_codes, encode_grids
from ai_font_renderer_tpu.fontgen.textgen import generate_corpus

pytestmark = pytest.mark.skipif(
    not native.corpus_available(), reason="no C++ toolchain"
)


@pytest.mark.parametrize("spec", [SheetSpec(), SheetSpec(width=60, height=20, max_chars=24)])
def test_native_matches_python_bit_exact(spec):
    atlas = bake_atlas(FIRACODE_PATH, spec)
    n = 2000
    got_codes, got_grids = native.generate_corpus_grids(
        n,
        42,
        10,
        100,
        float(atlas.advance_px),
        spec.width,
        atlas.n_lines,
        atlas.n_slots,
        spec.max_chars,
    )
    texts = generate_corpus(n)
    want_codes = encode_codes(texts, spec.max_chars)
    want_grids = encode_grids(
        texts, atlas.advance_table(), spec, atlas.n_lines, atlas.n_slots
    )
    np.testing.assert_array_equal(got_codes, want_codes)
    np.testing.assert_array_equal(got_grids, want_grids)


def test_build_layouts_uses_native_and_caches(tmp_path):
    from ai_font_renderer_tpu.fontgen.dataset import build_layouts

    atlas = bake_atlas(FIRACODE_PATH)
    c1, g1 = build_layouts(atlas, 100, cache_dir=str(tmp_path))
    c2, g2 = build_layouts(atlas, 100, cache_dir=str(tmp_path))  # cache hit
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(g1, g2)
    texts = generate_corpus(100)
    np.testing.assert_array_equal(c1, encode_codes(texts, 100))
