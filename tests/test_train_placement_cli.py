"""`afr train-placement`: the neural-layout training product surface.

VERDICT r3 #3: the campaign pipeline (supervised → pixel fine-tune →
joint SIREN+placement) must run from `afr` alone. These tests drive the
subcommand end-to-end on tiny shapes: supervised phase + checkpoint
save, the fine-tune/joint chain against a provided tiny SIREN bank, the
new capacity flags (--embed-dim/--hidden-dim), and dim recovery/conflict
detection on --init-from.
"""

import json
import os

import jax
import numpy as np
import pytest

from ai_font_renderer_tpu import cli
from ai_font_renderer_tpu.config import PRINTABLE_ASCII


def _run(argv):
    return cli.main(["train-placement"] + argv)


def _tiny_bank(path):
    """An untrained tiny SIREN bank over the full charset — the chain
    only needs shapes/charset to match, not glyph quality."""
    from ai_font_renderer_tpu.models import siren
    from ai_font_renderer_tpu.utils.checkpoint import save_siren

    scfg = siren.SirenConfig(
        n_chars=len(PRINTABLE_ASCII), cell=16, embed_dim=8, hidden_dim=16,
        n_layers=2,
    )
    sp = siren.init(jax.random.PRNGKey(0), scfg)
    save_siren(sp, scfg, PRINTABLE_ASCII, str(path))
    return scfg


def test_supervised_phase_and_capacity_checkpoint(tmp_path):
    """Supervised training runs from the CLI; capacity flags change the
    frontend dims and the dims travel in the checkpoint."""
    out = tmp_path / "run"
    rc = _run(
        [
            "--font", "firacode", "--samples", "240", "--batch", "64",
            "--epochs", "1", "--line-head", "5",
            "--embed-dim", "64", "--hidden-dim", "96",
            "--no-e2e", "--out", str(out),
        ]
    )
    assert rc == 0
    lines = [
        json.loads(l) for l in (out / "metrics.jsonl").read_text().splitlines()
    ]
    assert lines[0]["epoch"] == 0 and "val_line_acc" in lines[0]
    from ai_font_renderer_tpu.utils.checkpoint import load_params_with_config

    params, pcfg = load_params_with_config(str(out / "placement.npz"))
    assert pcfg.embedding_dim == 64 and pcfg.hidden_dim == 96
    assert pcfg.num_heads == 8  # embed-dim/8 default ratio preserved
    assert params["embedding"].shape[1] == 64
    assert params["place_w"].shape == (96, 2 + 5)  # line head L=5


def test_finetune_joint_chain_from_cli(tmp_path):
    """--epochs 0 --init-from + --siren-from --finetune-joint: the pure
    fine-tune continuation (the campaign's joint protocol) runs from afr
    and saves both tuned artifacts plus the e2e eval rows."""
    sup = tmp_path / "sup"
    rc = _run(
        [
            "--font", "firacode", "--samples", "240", "--batch", "64",
            "--epochs", "1", "--line-head", "3", "--no-e2e",
            "--out", str(sup),
        ]
    )
    assert rc == 0
    bank = tmp_path / "bank.npz"
    _tiny_bank(bank)
    out = tmp_path / "joint"
    rc = _run(
        [
            "--font", "firacode", "--samples", "240", "--batch", "64",
            "--epochs", "0", "--line-head", "3",
            "--init-from", str(sup / "placement.npz"),
            "--siren-from", str(bank),
            "--finetune-joint", "--finetune-steps", "3",
            "--finetune-samples", "64", "--finetune-schedule", "cosine",
            "--finetune-lr", "5e-5", "--ft-checkpoint-every", "0",
            "--out", str(out),
        ]
    )
    assert rc == 0
    assert (out / "placement_finetuned.npz").exists()
    assert (out / "siren_finetuned.npz").exists()  # joint tunes the bank
    rows = [
        json.loads(l) for l in (out / "metrics.jsonl").read_text().splitlines()
    ]
    e2e = [r for r in rows if "end_to_end_neural_render_mse" in r]
    assert e2e and np.isfinite(e2e[-1]["end_to_end_neural_render_mse"])
    assert np.isfinite(e2e[-1]["engine_layout_oracle_mse"])
    # Joint runs tune the bank, so the tuned bank's own engine-layout
    # oracle is logged alongside the original-bank floor (round 5).
    assert np.isfinite(e2e[-1]["engine_layout_oracle_tuned_mse"])
    ft = [r for r in rows if "finetune_pixel_mse_last" in r]
    assert ft and np.isfinite(ft[-1]["finetune_pixel_mse_last"])


def test_init_from_recovers_and_guards_capacity(tmp_path):
    """--init-from recovers the checkpoint's dims without flags and
    refuses conflicting capacity flags."""
    out = tmp_path / "cap"
    rc = _run(
        [
            "--font", "firacode", "--samples", "240", "--batch", "64",
            "--epochs", "0", "--line-head", "3",
            "--embed-dim", "64", "--hidden-dim", "96",
            "--no-e2e", "--out", str(out),
        ]
    )
    assert rc == 0
    ckpt = str(out / "placement.npz")
    # Dim recovery: continuation with NO capacity flags loads cleanly.
    out2 = tmp_path / "cont"
    rc = _run(
        [
            "--font", "firacode", "--samples", "240", "--batch", "64",
            "--epochs", "0", "--line-head", "3", "--init-from", ckpt,
            "--no-e2e", "--out", str(out2),
        ]
    )
    assert rc == 0
    from ai_font_renderer_tpu.utils.checkpoint import load_params_with_config

    _, pcfg = load_params_with_config(str(out2 / "placement.npz"))
    assert pcfg.embedding_dim == 64 and pcfg.hidden_dim == 96
    # Conflict: explicit flags that disagree with the checkpoint error out.
    with pytest.raises(SystemExit):
        _run(
            [
                "--font", "firacode", "--samples", "240",
                "--epochs", "0", "--line-head", "3", "--init-from", ckpt,
                "--embed-dim", "32", "--no-e2e",
                "--out", str(tmp_path / "bad"),
            ]
        )


def test_finetune_needs_a_full_batch(tmp_path):
    """The fine-tune stage exits cleanly when the train split cannot fill
    one 64-sample jitted batch (it used to pad by duplicating rows, which
    silently skewed the pixel objective on tiny corpora)."""
    sup = tmp_path / "sup"
    rc = _run(
        [
            "--font", "firacode", "--samples", "240", "--batch", "64",
            "--epochs", "1", "--line-head", "3", "--no-e2e",
            "--out", str(sup),
        ]
    )
    assert rc == 0
    bank = tmp_path / "bank.npz"
    _tiny_bank(bank)
    with pytest.raises(SystemExit, match="64 train samples"):
        _run(
            [
                "--font", "firacode", "--samples", "70", "--batch", "64",
                "--epochs", "0", "--line-head", "3",
                "--init-from", str(sup / "placement.npz"),
                "--siren-from", str(bank),
                "--finetune-joint", "--finetune-steps", "1",
                "--finetune-samples", "64", "--ft-checkpoint-every", "0",
                "--out", str(tmp_path / "ft"),
            ]
        )


def test_supervised_needs_a_full_batch(tmp_path):
    """The supervised phase exits cleanly when the train split is smaller
    than one --batch (steps_per_epoch would be 0: every epoch a no-op and
    the random init silently saved as 'trained')."""
    with pytest.raises(SystemExit, match="train samples per step"):
        _run(
            [
                "--font", "firacode", "--samples", "70", "--batch", "1024",
                "--epochs", "1", "--line-head", "3", "--no-e2e",
                "--out", str(tmp_path / "zero"),
            ]
        )
