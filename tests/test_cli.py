"""CLI contract tests (model.py:425-454 behaviors)."""

import os

import numpy as np
import pytest

from ai_font_renderer_tpu import cli
from ai_font_renderer_tpu.config import ModelConfig


def test_unknown_option_exits_1(capsys):
    rc = cli.main(["--frobnicate"])
    assert rc == 1
    out = capsys.readouterr()
    assert "Available options: --train" in out.out


def test_test_strings_match_reference():
    # The curated eval set (model.py:111-127): 15 strings with the
    # documented adversarial cases.
    assert len(cli.TEST_STRINGS) == 15
    assert "WWWWWWWWWWWWWWWWWWWW" in cli.TEST_STRINGS
    assert "IIIIIIIIIIIIIIIIIIII" in cli.TEST_STRINGS
    assert "EXACTLY TWENTY CHARS" in cli.TEST_STRINGS
    assert " " * 20 in cli.TEST_STRINGS
    assert all(len(s) <= 100 for s in cli.TEST_STRINGS)


def test_fontgen_exports_dataset_contract(tmp_path, monkeypatch):
    out = tmp_path / "train_input"
    rc = cli.main(
        ["fontgen", "--num-samples", "4", "--out", str(out)]
    )
    assert rc == 0
    # File contract of generate_font.ts:216-239.
    data = (out / "data.txt").read_text().splitlines()
    assert len(data) == 4
    assert set("".join(data)) <= set("ABCDEFGHIJKLMNOPQRSTUVWXYZ ")
    for i in range(1, 5):
        assert (out / f"{i}.bmp").exists()
    meta = (out / "dataset_metadata.txt").read_text()
    assert "240x80" in meta and "line 1 corresponds to 1.bmp" in meta
    # BMPs decode and correspond to their strings (ink present for text).
    from ai_font_renderer_tpu.fontgen.bmp import read_bmp

    img = read_bmp(str(out / "1.bmp"))
    assert img.shape == (80, 240)
    assert (img < 0.5).any()


def test_render_subcommand_with_saved_weights(tmp_path):
    import jax

    from ai_font_renderer_tpu.models import font_renderer
    from ai_font_renderer_tpu.utils.checkpoint import save_params

    weights = str(tmp_path / "w.npz")
    params = font_renderer.init(jax.random.PRNGKey(0), ModelConfig())
    save_params(params, weights)
    out = str(tmp_path / "renders")
    rc = cli.main(["render", "HELLO", "WORLD", "--weights", weights, "--out", out])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "string_0.bmp"))
    assert os.path.exists(os.path.join(out, "string_1.bmp"))


def test_default_output_dir_format():
    d = cli.default_output_dir()
    assert d.startswith("train_output_")
    # timestamped %m_%d_%H_%M_%S → 5 underscore-separated numeric fields
    parts = d[len("train_output_"):].split("_")
    assert len(parts) == 5 and all(p.isdigit() for p in parts)


def test_fontgen_montserrat_export(tmp_path):
    from ai_font_renderer_tpu.config import MONTSERRAT_PATH
    from ai_font_renderer_tpu.fontgen.bmp import read_bmp

    out = tmp_path / "ti_mont"
    rc = cli.main(
        ["fontgen", "--num-samples", "2", "--out", str(out), "--font", MONTSERRAT_PATH]
    )
    assert rc == 0
    img = read_bmp(str(out / "1.bmp"))
    assert img.shape == (80, 240)
    assert (img < 0.5).any()  # proportional render has ink


def test_eval_subcommand(tmp_path, capsys):
    import jax, json

    from ai_font_renderer_tpu.models import font_renderer
    from ai_font_renderer_tpu.utils.checkpoint import save_params

    weights = str(tmp_path / "w.npz")
    save_params(font_renderer.init(jax.random.PRNGKey(0), ModelConfig()), weights)
    rc = cli.main(["eval", "--weights", weights, "--num-samples", "64"])
    assert rc == 0
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    assert 0 < rec["val_mse"] < 1.0
    assert rec["val_samples"] > 0


def test_eval_missing_weights():
    rc = cli.main(["eval", "--weights", "/nonexistent.npz"])
    assert rc == 1


def test_render_subcommand_with_conv_weights(tmp_path):
    """A conv_ps checkpoint renders through the CLI with no config hints:
    infer_model_config reconstructs the architecture from shapes."""
    import jax

    from ai_font_renderer_tpu.models import font_renderer
    from ai_font_renderer_tpu.utils.checkpoint import save_params

    weights = str(tmp_path / "conv.npz")
    params = font_renderer.init(
        jax.random.PRNGKey(0), ModelConfig(decoder="conv_ps")
    )
    save_params(params, weights)
    out = str(tmp_path / "renders")
    rc = cli.main(["render", "HI", "--weights", weights, "--out", out])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "string_0.bmp"))


def test_train_flags_reach_configs(monkeypatch, tmp_path):
    """--decoder/--lr/--leaky-clamp/--max-seconds plumb into the configs."""
    seen = {}

    def fake_run_training(
        mcfg, tcfg, output_dir, font, ckpt_dir, resume, mesh_shape=None
    ):
        seen["mcfg"], seen["tcfg"] = mcfg, tcfg

        class R:
            params = {}

        raise SystemExit(0)  # skip save/render

    monkeypatch.setattr(cli, "run_training", fake_run_training)
    with pytest.raises(SystemExit):
        cli.main(
            [
                "--train", "--decoder", "conv_ps", "--lr", "0.0005",
                "--leaky-clamp", "0.02", "--max-seconds", "90",
                "--decoder-channels", "256,256,128,64,32",
                "--output", str(tmp_path / "o"),
            ]
        )
    assert seen["mcfg"].decoder == "conv_ps"
    assert seen["mcfg"].leaky_clamp == 0.02
    assert seen["mcfg"].decoder_channels == (256, 256, 128, 64, 32)
    assert seen["tcfg"].learning_rate == 0.0005
    assert seen["tcfg"].max_train_seconds == 90


def test_mesh_flag_plumbs(monkeypatch, tmp_path):
    """--mesh DATA,MODEL reaches run_training as a (data, model) tuple."""
    seen = {}

    def fake_run_training(
        mcfg, tcfg, output_dir, font, ckpt_dir, resume, mesh_shape=None
    ):
        seen["mesh_shape"] = mesh_shape
        raise SystemExit(0)

    monkeypatch.setattr(cli, "run_training", fake_run_training)
    with pytest.raises(SystemExit):
        cli.main(["--train", "--mesh", "4,2", "--output", str(tmp_path / "o")])
    assert seen["mesh_shape"] == (4, 2)


def test_mesh_flag_malformed():
    assert cli.main(["--train", "--mesh", "3"]) == 1


def test_train_cli_on_mesh_matches_single_device(tmp_path, monkeypatch):
    """`--train --mesh 4,2` trains DP x TP on the 8-device virtual mesh from
    the product surface, and the loss matches the mesh-less run (identical
    data, init, and dropout keys; GSPMD only changes the reduction layout)."""
    import json

    monkeypatch.chdir(tmp_path)  # --train writes font_renderer.npz to CWD

    def run(mesh_args, tag):
        out = str(tmp_path / f"out_{tag}")
        rc = cli.main(
            [
                # 160 samples -> train split 128, so the clamped batch is
                # already a multiple of the 4-wide data axis and the meshed
                # run sees byte-identical batches to the base run.
                "--train", "--samples", "160", "--epochs", "2",
                "--output", out, "--weights", str(tmp_path / f"w_{tag}.npz"),
            ]
            + mesh_args
        )
        assert rc == 0
        lines = [
            json.loads(l)
            for l in open(os.path.join(out, "metrics.jsonl"))
        ]
        return lines[-1]["val_loss"]

    base = run([], "base")
    meshed = run(["--mesh", "4,2"], "mesh")
    assert np.isfinite(base) and np.isfinite(meshed)
    np.testing.assert_allclose(meshed, base, rtol=2e-4)


def test_render_int8_flag(tmp_path):
    """--int8 serves the linear head via the int8xint8 path end-to-end."""
    import jax

    from ai_font_renderer_tpu.models import font_renderer
    from ai_font_renderer_tpu.utils.checkpoint import save_params

    weights = str(tmp_path / "w.npz")
    mcfg = ModelConfig()
    save_params(font_renderer.init(jax.random.PRNGKey(0), mcfg), weights, mcfg)
    out = str(tmp_path / "renders8")
    rc = cli.main(["render", "HELLO", "--weights", weights, "--out", out, "--int8"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "string_0.bmp"))


def test_profile_fast_flag(monkeypatch, tmp_path):
    """--profile fast turns on the measured speed flags; conv decoders
    keep the frontend flags but skip the linear-only handrolled backward."""
    seen = {}

    def fake_run_training(
        mcfg, tcfg, output_dir, font, ckpt_dir, resume, mesh_shape=None
    ):
        seen["mcfg"], seen["tcfg"] = mcfg, tcfg
        raise SystemExit(0)

    monkeypatch.setattr(cli, "run_training", fake_run_training)
    with pytest.raises(SystemExit):
        cli.main(["--train", "--profile", "fast", "--output", str(tmp_path / "o")])
    assert seen["mcfg"].bf16_frontend and seen["mcfg"].bits_dropout
    assert seen["tcfg"].handrolled_bwd

    with pytest.raises(SystemExit):
        cli.main(
            ["--train", "--profile", "fast", "--decoder", "conv_ps",
             "--output", str(tmp_path / "o")]
        )
    assert seen["mcfg"].bf16_frontend
    assert not seen["tcfg"].handrolled_bwd


def test_render_implicit_and_learned_placement(tmp_path):
    """`afr render --implicit BANK [--placement NET] [--scale]` drives the
    hybrid and the fully neural path from the product surface."""
    import jax

    from ai_font_renderer_tpu.config import FIRACODE_PATH
    from ai_font_renderer_tpu.fontgen.bmp import read_bmp
    from ai_font_renderer_tpu.models import placement, siren
    from ai_font_renderer_tpu.utils.checkpoint import save_params, save_siren

    charset = " ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    scfg = siren.SirenConfig(n_chars=len(charset), cell=16, hidden_dim=16, n_layers=2)
    bank = str(tmp_path / "siren.npz")
    save_siren(siren.init(jax.random.PRNGKey(0), scfg), scfg, charset, bank)

    out = str(tmp_path / "r1")
    rc = cli.main(["render", "HI", "--implicit", bank, "--out", out])
    assert rc == 0
    assert read_bmp(os.path.join(out, "string_0.bmp")).shape == (80, 240)

    out2 = str(tmp_path / "r2")
    rc = cli.main(["render", "HI", "--implicit", bank, "--out", out2, "--scale", "2"])
    assert rc == 0
    assert read_bmp(os.path.join(out2, "string_0.bmp")).shape == (160, 480)

    pcfg = ModelConfig(max_length=24)
    net = str(tmp_path / "place.npz")
    save_params(placement.init(jax.random.PRNGKey(1), pcfg), net, mcfg=pcfg)
    out3 = str(tmp_path / "r3")
    rc = cli.main(
        ["render", "HI", "--implicit", bank, "--placement", net, "--out", out3]
    )
    assert rc == 0
    assert read_bmp(os.path.join(out3, "string_0.bmp")).shape == (80, 240)

    # Structured-head checkpoint: the npz carries its own advance/kern
    # tables; the CLI path must auto-detect the head mode (shape/params
    # carried) with no extra flags.
    import numpy as np

    net_s = str(tmp_path / "place_struct.npz")
    save_params(
        placement.init(
            jax.random.PRNGKey(2),
            pcfg,
            lines=5,
            advances=np.full(128, 7.0, np.float32),
        ),
        net_s,
        mcfg=pcfg,
    )
    out4 = str(tmp_path / "r4")
    rc = cli.main(
        ["render", "HI", "--implicit", bank, "--placement", net_s, "--out", out4]
    )
    assert rc == 0
    assert read_bmp(os.path.join(out4, "string_0.bmp")).shape == (80, 240)

    # Discrete eval decodes from the product surface.
    out5 = str(tmp_path / "r5")
    rc = cli.main(
        ["render", "HI", "--implicit", bank, "--placement", net_s,
         "--hard-placement", "--out", out5]
    )
    assert rc == 0
    assert read_bmp(os.path.join(out5, "string_0.bmp")).shape == (80, 240)
    out6 = str(tmp_path / "r6")
    rc = cli.main(
        ["render", "HI", "--implicit", bank, "--placement", net_s,
         "--monotone-placement", "--out", out6]
    )
    assert rc == 0
    assert read_bmp(os.path.join(out6, "string_0.bmp")).shape == (80, 240)

    assert cli.main(["render", "HI", "--implicit", "/nonexistent.npz"]) == 1


def test_render_warns_on_bank_font_mismatch(tmp_path, capsys):
    """A SIREN bank tagged with its training font (save_siren font=) makes
    the render surface warn when composed under a different --font —
    the wrong font's advances/kerning lay out garbage and the sheet
    comes out near-blank (measured: 0.02% ink vs 1.5%). Untagged banks
    (saved before the tag, incl. the committed artifacts) skip the
    check."""
    import jax

    from ai_font_renderer_tpu.config import MONTSERRAT_PATH
    from ai_font_renderer_tpu.models import siren
    from ai_font_renderer_tpu.utils.checkpoint import (
        save_siren,
        siren_font,
    )

    charset = " ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    scfg = siren.SirenConfig(
        n_chars=len(charset), cell=16, hidden_dim=16, n_layers=2
    )
    sp = siren.init(jax.random.PRNGKey(0), scfg)

    tagged = str(tmp_path / "tagged.npz")
    save_siren(sp, scfg, charset, tagged, font=MONTSERRAT_PATH)
    assert siren_font(tagged) == "Montserrat-Regular.ttf"

    untagged = str(tmp_path / "untagged.npz")
    save_siren(sp, scfg, charset, untagged)
    assert siren_font(untagged) is None

    # Mismatch: default --font is FiraCode; the Montserrat-tagged bank warns.
    rc = cli.main(
        ["render", "HI", "--implicit", tagged, "--out", str(tmp_path / "a")]
    )
    assert rc == 0
    assert "WARNING" in capsys.readouterr().out

    # Matching --font: no warning.
    rc = cli.main(
        ["render", "HI", "--implicit", tagged, "--font", MONTSERRAT_PATH,
         "--out", str(tmp_path / "b")]
    )
    assert rc == 0
    assert "WARNING" not in capsys.readouterr().out

    # Untagged bank under any font: no warning (backward compat).
    rc = cli.main(
        ["render", "HI", "--implicit", untagged, "--out", str(tmp_path / "c")]
    )
    assert rc == 0
    assert "WARNING" not in capsys.readouterr().out


def test_render_fast_flag(tmp_path):
    """--fast renders with the bf16 frontend (serving-fast tier)."""
    import jax

    from ai_font_renderer_tpu.models import font_renderer
    from ai_font_renderer_tpu.utils.checkpoint import save_params

    weights = str(tmp_path / "w.npz")
    mcfg = ModelConfig(max_length=16, sheet_height=16, sheet_width=48)
    save_params(font_renderer.init(jax.random.PRNGKey(0), mcfg), weights, mcfg)
    out = str(tmp_path / "rf")
    rc = cli.main(["render", "HELLO", "--weights", weights, "--out", out, "--fast"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "string_0.bmp"))


def test_parse_tcp_forms():
    """--tcp accepts hostname/IPv4/bracketed-IPv6/bare-IPv6 and rejects
    malformed values (ADVICE r3: '[::1]:8080' used to keep the brackets)."""
    from ai_font_renderer_tpu.cli import parse_tcp

    assert parse_tcp("localhost:8080") == ("localhost", 8080)
    assert parse_tcp("127.0.0.1:0") == ("127.0.0.1", 0)
    assert parse_tcp("[::1]:8080") == ("::1", 8080)
    assert parse_tcp("::1:8080") == ("::1", 8080)
    assert parse_tcp("nope") is None
    assert parse_tcp(":8080") is None
    assert parse_tcp("host:port") is None
    # Port range + ASCII-digit validation: out-of-range and Unicode-digit
    # ports fail the usage path instead of raising at bind time.
    assert parse_tcp("host:65535") == ("host", 65535)
    assert parse_tcp("host:65536") is None
    assert parse_tcp("host:8\N{MATHEMATICAL DOUBLE-STRUCK DIGIT ZERO}") is None
    # A bare IPv6 address with NO port must fail the usage path, not
    # split at its last colon and bind to a garbage host.
    assert parse_tcp("::1") is None
    assert parse_tcp("2001:db8::5") is None
    assert parse_tcp(":::8080") == ("::", 8080)  # all-zeros address


def test_help_exits_zero(capsys):
    """`afr --help` is a SUCCESS (exit 0 + help text), not the
    reference's unknown-option usage-error path."""
    from ai_font_renderer_tpu.cli import main

    assert main(["--help"]) == 0
    out = capsys.readouterr().out
    assert "--train" in out and "Available options" not in out
    # Unknown options keep the reference contract: usage + exit 1.
    assert main(["--bogus"]) == 1
    assert "Available options: --train" in capsys.readouterr().out
