"""Render-path tests: batched == per-string, file outputs, atlas chunking."""

import os

import jax
import numpy as np
import pytest

from ai_font_renderer_tpu.config import ModelConfig
from ai_font_renderer_tpu.fontgen.bmp import read_bmp
from ai_font_renderer_tpu.models import font_renderer
from ai_font_renderer_tpu.render import render_atlas, render_batch, render_strings

MCFG = ModelConfig(max_length=24, sheet_height=20, sheet_width=60)


@pytest.fixture(scope="module")
def params():
    return font_renderer.init(jax.random.PRNGKey(3), MCFG)


def test_batched_equals_individual(params):
    strings = ["HELLO", "WORLD", "A"]
    batched = render_batch(params, strings, MCFG)
    for i, s in enumerate(strings):
        single = render_batch(params, [s], MCFG)[0]
        # Identical up to GEMM accumulation order (batch-shape dependent).
        np.testing.assert_allclose(batched[i], single, atol=2e-5)


def test_render_strings_writes_bmps(params, tmp_path, capsys):
    out = str(tmp_path / "r")
    paths = render_strings(params, ["AB", "CD"], out, MCFG)
    assert paths == [os.path.join(out, "string_0.bmp"), os.path.join(out, "string_1.bmp")]
    img = read_bmp(paths[0])
    assert img.shape == (20, 60)
    # Written BMP quantizes the model output to 8 bits.
    direct = render_batch(params, ["AB"], MCFG)[0]
    np.testing.assert_allclose(img, np.round(direct * 255) / 255, atol=1e-6)
    assert "Saved 2 rendered strings" in capsys.readouterr().out


def test_truncation_warning(params, tmp_path, capsys):
    long_string = "X" * 40  # > max_length 24
    render_strings(params, [long_string], str(tmp_path / "t"), MCFG)
    assert "truncated to 24 characters" in capsys.readouterr().out


def test_render_atlas_chunking(params):
    # 10 strings with chunk 4 -> 3 chunks incl. padded tail; result exact.
    strings = [f"S{i}" for i in range(10)]
    chunked = np.asarray(render_atlas(params, strings, MCFG, chunk=4))
    direct = render_batch(params, strings, MCFG)
    assert chunked.shape == (10, 20, 60)
    np.testing.assert_allclose(chunked, direct, atol=1e-6)


def test_render_batch_u8_matches_float_quantization():
    """Device-side uint8 quantization (the serving fetch path) agrees with
    host-side round(clip(x)*255) of the float render."""
    import jax
    import numpy as np
    from ai_font_renderer_tpu.config import ModelConfig
    from ai_font_renderer_tpu.models import font_renderer
    from ai_font_renderer_tpu.render.render import render_batch, render_batch_u8_async

    mcfg = ModelConfig()
    params = font_renderer.init(jax.random.PRNGKey(3), mcfg)
    strings = ["HELLO WORLD", "", "A" * 100]
    f = render_batch(params, strings, mcfg)
    u8 = np.asarray(render_batch_u8_async(params, strings, mcfg))
    assert u8.dtype == np.uint8
    host = np.round(np.clip(f, 0, 1) * 255).astype(np.uint8)
    # Identical up to ties at the .5 rounding boundary.
    assert np.mean(u8 != host) < 1e-3
    assert np.abs(u8.astype(int) - host.astype(int)).max() <= 1
