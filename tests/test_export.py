"""StableHLO deployment artifacts (utils/export.py, `afr export`).

The artifact must be self-contained: executing it needs neither the
checkpoint nor ModelConfig (contract carried in the avals), and its
uint8 outputs must match the in-process render path exactly.
"""

import os

import jax
import numpy as np
import pytest

from ai_font_renderer_tpu import cli
from ai_font_renderer_tpu.config import ModelConfig
from ai_font_renderer_tpu.models import font_renderer
from ai_font_renderer_tpu.render.render import render_batch
from ai_font_renderer_tpu.utils.export import (
    export_render,
    exported_contract,
    load_exported,
    render_exported,
)

TINY = ModelConfig(
    embedding_dim=8,
    num_heads=2,
    hidden_dim=8,
    max_length=12,
    sheet_height=8,
    sheet_width=16,
)


@pytest.fixture(scope="module")
def tiny_params():
    return font_renderer.init(jax.random.PRNGKey(0), TINY)


def test_roundtrip_matches_render_path(tiny_params, tmp_path):
    path = str(tmp_path / "tiny.hlo")
    n = export_render(tiny_params, TINY, path, platforms=("cpu",))
    assert n == os.path.getsize(path) and n > 0
    exported = load_exported(path)
    assert exported_contract(exported) == (12, 8, 16)
    strings = ["HELLO", "AB", ""]
    got = render_exported(exported, strings)
    want = render_batch(tiny_params, strings, TINY)
    # The artifact quantizes on the u8 grid (the serving wire format).
    np.testing.assert_array_equal(
        np.round(got * 255), np.round(np.clip(want, 0, 1) * 255)
    )


def test_symbolic_batch_dim(tiny_params, tmp_path):
    """One artifact serves any batch size (b is symbolic, not baked)."""
    path = str(tmp_path / "tiny.hlo")
    export_render(tiny_params, TINY, path, platforms=("cpu",))
    exported = load_exported(path)
    for n in (1, 4, 7):
        assert render_exported(exported, ["X"] * n).shape == (n, 8, 16)


def test_int8_params_export(tiny_params, tmp_path):
    """The quantized serving bundle exports too, and is smaller."""
    from ai_font_renderer_tpu.ops.quantized import quantize_params

    f32_path = str(tmp_path / "f32.hlo")
    i8_path = str(tmp_path / "i8.hlo")
    n_f32 = export_render(tiny_params, TINY, f32_path, platforms=("cpu",))
    qparams = quantize_params(tiny_params)
    n_i8 = export_render(qparams, TINY, i8_path, platforms=("cpu",))
    assert n_i8 < n_f32
    got = render_exported(load_exported(i8_path), ["HELLO"])
    from ai_font_renderer_tpu.ops.quantized import apply_quantized_int8
    from ai_font_renderer_tpu.fontgen.layout import encode_codes

    import jax.numpy as jnp

    codes = jnp.asarray(encode_codes(["HELLO"], TINY.max_length))
    want = np.asarray(apply_quantized_int8(qparams, codes, TINY))
    np.testing.assert_array_equal(
        np.round(got * 255), np.round(np.clip(want, 0, 1) * 255)
    )


def test_cli_export_then_render(tiny_params, tmp_path):
    """`afr export` then `afr render --exported` — no weights needed for
    the render step (the artifact is the whole deployment)."""
    from ai_font_renderer_tpu.utils.checkpoint import save_params

    weights = str(tmp_path / "w.npz")
    save_params(tiny_params, weights, mcfg=TINY)
    artifact = str(tmp_path / "w.hlo")
    rc = cli.main(
        [
            "export",
            "--weights",
            weights,
            "--out",
            artifact,
            "--platforms",
            "cpu",
        ]
    )
    assert rc == 0 and os.path.exists(artifact)
    out = str(tmp_path / "renders")
    rc = cli.main(["render", "HI", "--exported", artifact, "--out", out])
    assert rc == 0
    bmp = os.path.join(out, "string_0.bmp")
    assert os.path.exists(bmp)
    from ai_font_renderer_tpu.fontgen.bmp import read_bmp

    assert read_bmp(bmp).shape == (8, 16)


def test_conv_ps_decoder_exports(tmp_path):
    """Exports dispatch on the checkpoint format: a conv_ps decoder
    (no out_w; dec_w* pyramid) serializes and matches its render path."""
    cfg = ModelConfig(decoder="conv_ps")
    params = font_renderer.init(jax.random.PRNGKey(1), cfg)
    path = str(tmp_path / "convps.hlo")
    export_render(params, cfg, path, platforms=("cpu",))
    exported = load_exported(path)
    assert exported_contract(exported) == (100, 80, 240)
    got = render_exported(exported, ["CONV PS"])
    want = render_batch(params, ["CONV PS"], cfg)
    np.testing.assert_array_equal(
        np.round(got * 255), np.round(np.clip(want, 0, 1) * 255)
    )


def test_standalone_runner_needs_no_framework(tiny_params, tmp_path):
    """tools/run_exported_standalone.py renders from the artifact in a
    subprocess where ai_font_renderer_tpu is NOT importable — the
    deployment contract is the artifact plus jax, nothing else."""
    import subprocess
    import sys

    path = str(tmp_path / "tiny.hlo")
    export_render(tiny_params, TINY, path, platforms=("cpu",))
    tool = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "run_exported_standalone.py",
    )
    # Minimal env: no PYTHONPATH (drops both the repo and the axon
    # sitecustomize), cwd away from the repo so the package can't be
    # found implicitly.
    env = {
        "PATH": os.environ.get("PATH", ""),
        "HOME": os.environ.get("HOME", "/root"),
        "JAX_PLATFORMS": "cpu",
    }
    probe = subprocess.run(
        [sys.executable, "-c", "import ai_font_renderer_tpu"],
        env=env, cwd=str(tmp_path), capture_output=True,
    )
    assert probe.returncode != 0, "package must be masked for this test"
    out_dir = str(tmp_path / "standalone")
    res = subprocess.run(
        [sys.executable, tool, path, out_dir, "HI", "YO"],
        env=env, cwd=str(tmp_path), capture_output=True, text=True,
    )
    assert res.returncode == 0, res.stderr
    from ai_font_renderer_tpu.fontgen.bmp import read_bmp

    for i, s in enumerate(["HI", "YO"]):
        sheet = read_bmp(os.path.join(out_dir, f"string_{i}.bmp"))
        assert sheet.shape == (8, 16)
        want = render_exported(load_exported(path), [s])[0]
        np.testing.assert_allclose(sheet, want, atol=1 / 255 + 1e-6)


CHARSET = " ABCDEFGHIJKLMNOPQRSTUVWXYZ"


def _tiny_neural(lines=0):
    from ai_font_renderer_tpu.models import placement, siren

    scfg = siren.SirenConfig(
        n_chars=len(CHARSET), cell=16, embed_dim=8, hidden_dim=16, n_layers=2
    )
    sp = siren.init(jax.random.PRNGKey(2), scfg)
    pp = placement.init(jax.random.PRNGKey(3), TINY, lines=lines)
    return pp, sp, scfg


def test_neural_export_matches_learned_render(tmp_path):
    """The fully neural pipeline (placement + SIREN + composition)
    exports to the SAME artifact contract and matches
    render_learned_sheets exactly on the u8 grid."""
    from ai_font_renderer_tpu.config import FIRACODE_PATH
    from ai_font_renderer_tpu.render.implicit_sheet import render_learned_sheets
    from ai_font_renderer_tpu.utils.export import export_neural_render

    pp, sp, scfg = _tiny_neural()
    path = str(tmp_path / "neural.hlo")
    n = export_neural_render(
        pp, TINY, sp, scfg, CHARSET, FIRACODE_PATH, path, platforms=("cpu",)
    )
    assert n == os.path.getsize(path) and n > 0
    exported = load_exported(path)
    # Output geometry is the SheetSpec sheet, not the flagship head's.
    assert exported_contract(exported) == (TINY.max_length, 80, 240)
    strings = ["HELLO", "AB A", ""]
    got = render_exported(exported, strings)
    want = render_learned_sheets(
        sp, pp, strings, FIRACODE_PATH, scfg, TINY, charset=CHARSET
    )
    np.testing.assert_array_equal(
        np.round(got * 255), np.round(np.clip(want, 0, 1) * 255)
    )
    # Symbolic batch: the same artifact serves other batch sizes.
    assert render_exported(exported, ["X"] * 5).shape == (5, 80, 240)


def test_neural_export_cli_with_monotone_decode(tmp_path):
    """`afr export --placement --implicit --monotone-placement` bakes the
    line head's Viterbi decode; `afr render --exported` runs it."""
    from ai_font_renderer_tpu.config import FIRACODE_PATH
    from ai_font_renderer_tpu.fontgen.bmp import read_bmp
    from ai_font_renderer_tpu.render.implicit_sheet import render_learned_sheets
    from ai_font_renderer_tpu.utils.checkpoint import save_params, save_siren

    pp, sp, scfg = _tiny_neural(lines=4)
    pnpz = str(tmp_path / "place.npz")
    snpz = str(tmp_path / "bank.npz")
    save_params(pp, pnpz, mcfg=TINY)
    save_siren(sp, scfg, CHARSET, snpz)
    artifact = str(tmp_path / "neural.hlo")
    rc = cli.main(
        [
            "export", "--placement", pnpz, "--implicit", snpz,
            "--font", FIRACODE_PATH, "--out", artifact,
            "--platforms", "cpu", "--monotone-placement",
        ]
    )
    assert rc == 0 and os.path.exists(artifact)
    out = str(tmp_path / "renders")
    rc = cli.main(["render", "HI WORLD", "--exported", artifact, "--out", out])
    assert rc == 0
    got = read_bmp(os.path.join(out, "string_0.bmp")).astype(np.float32)
    want = render_learned_sheets(
        sp, pp, ["HI WORLD"], FIRACODE_PATH, scfg, TINY,
        charset=CHARSET, monotone=True,
    )[0]
    np.testing.assert_allclose(got, want, atol=1 / 255 + 1e-6)


def test_neural_export_requires_bank(tmp_path):
    rc = cli.main(
        ["export", "--placement", str(tmp_path / "p.npz"), "--out", "x.hlo"]
    )
    assert rc == 1


def test_cli_export_missing_weights(tmp_path):
    rc = cli.main(
        ["export", "--weights", str(tmp_path / "nope.npz"), "--out", "x.hlo"]
    )
    assert rc == 1


def test_cli_render_missing_artifact(tmp_path):
    rc = cli.main(
        ["render", "HI", "--exported", str(tmp_path / "nope.hlo"),
         "--out", str(tmp_path / "o")]
    )
    assert rc == 1


def test_neural_export_warns_on_ignored_precision_flags(tmp_path, capsys):
    """--int8/--fast only exist for the flagship export; combining them
    with --placement warns instead of silently ignoring (ADVICE r3)."""
    from ai_font_renderer_tpu.config import FIRACODE_PATH
    from ai_font_renderer_tpu.utils.checkpoint import save_params, save_siren

    pp, sp, scfg = _tiny_neural()
    pnpz = str(tmp_path / "place.npz")
    snpz = str(tmp_path / "bank.npz")
    save_params(pp, pnpz, mcfg=TINY)
    save_siren(sp, scfg, CHARSET, snpz)
    artifact = str(tmp_path / "neural.hlo")
    rc = cli.main(
        [
            "export", "--placement", pnpz, "--implicit", snpz,
            "--font", FIRACODE_PATH, "--out", artifact,
            "--platforms", "cpu", "--int8",
        ]
    )
    assert rc == 0 and os.path.exists(artifact)
    assert "ignored for --placement" in capsys.readouterr().out
