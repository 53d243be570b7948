"""Sheet synthesis tests: device einsum path vs numpy oracle, BMP codec."""

import jax.numpy as jnp
import numpy as np
import pytest

from ai_font_renderer_tpu.config import FIRACODE_PATH
from ai_font_renderer_tpu.fontgen import (
    bake_atlas,
    encode_grids,
    generate_corpus,
    make_synth_ops,
    synthesize_sheets,
    synthesize_sheets_host,
)
from ai_font_renderer_tpu.fontgen.bmp import encode_bmp, read_bmp


@pytest.fixture(scope="module")
def atlas():
    return bake_atlas(FIRACODE_PATH)


@pytest.fixture(scope="module")
def grids(atlas):
    texts = generate_corpus(8) + ["THE QUICK BROWN FOX", " " * 20]
    return encode_grids(
        texts, atlas.advance_table(), atlas.spec, atlas.n_lines, atlas.n_slots
    )


def test_host_synthesis_properties(atlas, grids):
    sheets = synthesize_sheets_host(atlas, grids)
    assert sheets.shape == (len(grids), 80, 240)
    assert sheets.min() >= 0.0 and sheets.max() <= 1.0
    # Text sheets have ink; the all-space sheet is pure white.
    assert (sheets[:-1] < 0.5).any(axis=(1, 2)).all()
    assert (sheets[-1] == 1.0).all()


def test_device_matches_host_oracle(atlas, grids):
    ops = make_synth_ops(atlas, jnp.float32)
    dev = np.asarray(synthesize_sheets(ops, jnp.asarray(grids)))
    host = synthesize_sheets_host(atlas, grids)
    # f32 path runs at Precision.HIGHEST: the 8-bit quantization levels are
    # bit-exact vs the numpy oracle (raw floats may differ by 1 ulp because
    # XLA computes /255 as multiply-by-reciprocal).
    np.testing.assert_array_equal(np.round(dev * 255), np.round(host * 255))
    np.testing.assert_allclose(dev, host, atol=1e-6)


def test_device_bf16_close_to_oracle(atlas, grids):
    ops = make_synth_ops(atlas, jnp.bfloat16)
    dev = np.asarray(synthesize_sheets(ops, jnp.asarray(grids)))
    host = synthesize_sheets_host(atlas, grids)
    assert np.abs(dev - host).max() <= 2.0 / 255.0 + 1e-6


def test_sheets_are_8bit_quantized(atlas, grids):
    sheets = synthesize_sheets_host(atlas, grids)
    np.testing.assert_allclose(sheets * 255, np.round(sheets * 255), atol=1e-4)


def test_deterministic(atlas, grids):
    ops = make_synth_ops(atlas)
    a = np.asarray(synthesize_sheets(ops, jnp.asarray(grids)))
    b = np.asarray(synthesize_sheets(ops, jnp.asarray(grids)))
    np.testing.assert_array_equal(a, b)


def test_bmp_roundtrip(atlas, grids):
    sheet = synthesize_sheets_host(atlas, grids[:1])[0]
    decoded = read_bmp(encode_bmp(sheet))
    np.testing.assert_allclose(decoded, sheet, atol=1e-6)


def test_bmp_format_matches_reference_layout(atlas, grids):
    # Byte-level contract of generate_font.ts:6-62.
    sheet = synthesize_sheets_host(atlas, grids[:1])[0]
    b = encode_bmp(sheet)
    assert b[:2] == b"BM"
    assert int.from_bytes(b[10:14], "little") == 54  # pixel offset
    assert int.from_bytes(b[14:18], "little") == 40  # BITMAPINFOHEADER
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    assert (w, h) == (240, -80)  # negative height = top-down
    assert int.from_bytes(b[28:30], "little") == 24  # bits per pixel
    row_size = (240 * 3 + 3) // 4 * 4
    assert len(b) == 54 + row_size * 80
