"""Training tests: scheduler/early-stop parity, optimizer math, e2e smoke."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_font_renderer_tpu.config import (
    FIRACODE_PATH,
    ModelConfig,
    SheetSpec,
    TrainConfig,
)
from ai_font_renderer_tpu.fontgen import bake_atlas
from ai_font_renderer_tpu.fontgen.dataset import build_device_dataset
from ai_font_renderer_tpu.train import (
    EarlyStopping,
    ReduceLROnPlateau,
    init_state,
    train,
    train_epoch,
    train_step,
)


class TestReduceLROnPlateau:
    def test_reduces_after_patience(self):
        s = ReduceLROnPlateau(lr=1.0, factor=0.5, patience=2)
        s.step(1.0)
        for _ in range(2):
            assert s.step(1.0) == 1.0  # within patience
        assert s.step(1.0) == 0.5  # bad epochs (3) > patience (2)

    def test_improvement_resets(self):
        s = ReduceLROnPlateau(lr=1.0, factor=0.5, patience=2)
        s.step(1.0)
        s.step(1.0)
        s.step(0.5)  # improvement
        s.step(0.5)
        s.step(0.5)
        assert s.lr == 1.0  # not yet > patience since reset
        assert s.step(0.5) == 0.5

    def test_relative_threshold(self):
        # torch semantics: improvement must beat best * (1 - 1e-4).
        s = ReduceLROnPlateau(lr=1.0, factor=0.5, patience=0)
        s.step(1.0)
        assert s.step(0.99999) == 0.5  # insignificant -> reduce immediately

    def test_min_lr_floor(self):
        s = ReduceLROnPlateau(lr=1e-6, factor=0.5, patience=0, min_lr=1e-6)
        s.step(1.0)
        assert s.step(1.0) == 1e-6


class TestEarlyStopping:
    def test_stops_after_patience(self):
        e = EarlyStopping(patience=3)
        assert e.update(1.0, "s0")
        for i in range(3):
            assert not e.update(2.0, f"s{i}")
        assert e.should_stop
        assert e.best_state == "s0"

    def test_strict_improvement(self):
        e = EarlyStopping(patience=2)
        e.update(1.0, "a")
        assert not e.update(1.0, "b")  # equal is not better (model.py:340)
        assert e.counter == 1


@pytest.fixture(scope="module")
def tiny_setup():
    # Tiny geometry (20x60 sheet, 24-char cap) keeps the CPU test model at
    # ~2M params instead of 123M; the full-size model trains on TPU and is
    # covered by forward-pass tests + the TPU bench.
    spec = SheetSpec(width=60, height=20, max_chars=24)
    atlas = bake_atlas(FIRACODE_PATH, spec)
    ds = build_device_dataset(atlas, num_samples=96, synth_batch=32)
    mcfg = ModelConfig(max_length=24, sheet_height=20, sheet_width=60)
    tcfg = TrainConfig(batch_size=16, num_samples=96, eval_every=2)
    return ds, mcfg, tcfg


def test_train_step_reduces_loss(tiny_setup):
    ds, mcfg, tcfg = tiny_setup
    state = init_state(jax.random.PRNGKey(0), mcfg, tcfg)
    idx = jnp.arange(16, dtype=jnp.int32)
    codes, targets = ds.gather_batch(idx)
    losses = []
    for i in range(8):
        state, loss = train_step(
            state,
            codes,
            targets,
            jnp.float32(1e-3),
            jax.random.PRNGKey(i),
            mcfg,
            tcfg,
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert all(np.isfinite(losses))


def test_train_epoch_matches_stepwise_structure(tiny_setup):
    ds, mcfg, tcfg = tiny_setup
    state = init_state(jax.random.PRNGKey(0), mcfg, tcfg)
    batch_idx = jnp.arange(96, dtype=jnp.int32).reshape(6, 16)
    state2, loss = train_epoch(
        state,
        ds.codes,
        ds.targets_u8,
        batch_idx,
        jnp.float32(1e-3),
        jax.random.PRNGKey(1),
        mcfg,
        tcfg,
    )
    assert np.isfinite(float(loss))
    # Params actually moved.
    assert float(jnp.abs(state2.params["out_b"]).sum()) > 0


def test_end_to_end_training_smoke(tiny_setup, tmp_path):
    ds, mcfg, tcfg = tiny_setup
    tcfg = TrainConfig(
        batch_size=16,
        num_samples=96,
        num_epochs=6,
        eval_every=3,
        checkpoint_every=0,
    )
    out = str(tmp_path / "run")
    result = train(
        ds, mcfg, tcfg, output_dir=out, eval_strings=["HI"], log=lambda *_: None
    )
    assert result.final_epoch == 6
    assert np.isfinite(result.best_val_loss)
    # Loss goes down over the short run.
    assert result.history[-1]["train_loss"] < result.history[0]["train_loss"]
    # Manifests written with the reference's keys.
    cfg_txt = open(os.path.join(out, "config.txt")).read()
    assert "learning_rate = 0.001" in cfg_txt
    assert "sheet_height = 20" in cfg_txt  # tiny test geometry
    res_txt = open(os.path.join(out, "training_results.txt")).read()
    assert "best_validation_loss" in res_txt
    assert "early_stopped = False" in res_txt
    # Eval renders produced.
    assert os.path.exists(os.path.join(out, "epoch_0", "string_0.bmp"))
    assert os.path.exists(os.path.join(out, "metrics.jsonl"))


def test_checkpoint_resume(tiny_setup, tmp_path):
    ds, mcfg, _ = tiny_setup
    tcfg = TrainConfig(
        batch_size=16, num_samples=96, num_epochs=2, eval_every=10,
        checkpoint_every=1,
    )
    ckdir = str(tmp_path / "ck")
    r1 = train(ds, mcfg, tcfg, checkpoint_dir=ckdir, log=lambda *_: None)
    # Resume continues to a later epoch rather than restarting.
    tcfg2 = TrainConfig(
        batch_size=16, num_samples=96, num_epochs=4, eval_every=10,
        checkpoint_every=1,
    )
    r2 = train(
        ds, mcfg, tcfg2, checkpoint_dir=ckdir, resume=True, log=lambda *_: None
    )
    assert r2.final_epoch == 4
    assert len(r2.history) == 2  # only epochs 2 and 3 ran


def test_resume_replays_uninterrupted_run(tiny_setup, tmp_path):
    """A 2+2-epoch resumed run reproduces an uninterrupted 4-epoch run
    exactly: same shuffles (replayed generator), same optimizer state
    (structure-aware restore), same per-epoch losses. Also checks that
    metrics.jsonl is appended, not truncated, across the resume."""
    ds, mcfg, _ = tiny_setup
    mk = lambda epochs: TrainConfig(
        batch_size=16, num_samples=96, num_epochs=epochs, eval_every=10,
        checkpoint_every=1,
    )
    out_full = str(tmp_path / "full")
    r_full = train(
        ds, mcfg, mk(4), output_dir=out_full,
        checkpoint_dir=str(tmp_path / "ck_full"), log=lambda *_: None,
    )
    ckdir = str(tmp_path / "ck")
    out = str(tmp_path / "split")
    train(ds, mcfg, mk(2), output_dir=out, checkpoint_dir=ckdir,
          log=lambda *_: None)
    r_resumed = train(
        ds, mcfg, mk(4), output_dir=out, checkpoint_dir=ckdir, resume=True,
        log=lambda *_: None,
    )
    full_tail = [(h["train_loss"], h["val_loss"]) for h in r_full.history[2:]]
    resumed = [(h["train_loss"], h["val_loss"]) for h in r_resumed.history]
    np.testing.assert_allclose(resumed, full_tail, rtol=0, atol=0)
    assert r_resumed.best_val_loss == r_full.best_val_loss
    # metrics.jsonl holds all 4 epochs (epochs 0-1 survived the resume).
    lines = open(os.path.join(out, "metrics.jsonl")).read().splitlines()
    assert [int(__import__("json").loads(l)["epoch"]) for l in lines] == [
        0, 1, 2, 3,
    ]


def test_resume_restores_best_weights_snapshot(tiny_setup, tmp_path):
    """A resumed run that runs zero further epochs must return the
    checkpointed BEST weights, not the final-epoch weights (reference
    best-restore semantics, model.py:344,365)."""
    from ai_font_renderer_tpu.train.step import init_state as _init
    from ai_font_renderer_tpu.utils.checkpoint import CheckpointManager

    ds, mcfg, _ = tiny_setup
    tcfg = TrainConfig(batch_size=16, num_samples=96, num_epochs=3)
    state = _init(jax.random.PRNGKey(0), mcfg, tcfg)
    best = jax.tree.map(lambda x: x + 1.0, state.params)  # distinct snapshot
    ck = CheckpointManager(str(tmp_path / "ck"))
    ck.save(
        2,
        {"state": state, "best_params": best},
        {
            "format": 2, "has_best": True, "lr": 1e-3,
            "scheduler_best": 0.5, "scheduler_bad_epochs": 0,
            "best_val_loss": 0.5, "early_counter": 0, "epoch": 2,
        },
    )
    r = train(
        ds, mcfg, tcfg, checkpoint_dir=str(tmp_path / "ck"), resume=True,
        log=lambda *_: None,
    )  # start_epoch=3 == num_epochs: no epochs run
    assert r.history == []
    for k in state.params:
        np.testing.assert_array_equal(
            np.asarray(r.params[k]), np.asarray(best[k])
        )


def test_batch_clamps_to_train_split(tiny_setup):
    """batch_size > train split must clamp to the split, not the dataset
    (96 samples, 80/20 split -> 76 train; batch 90 would crash the epoch
    reshape under the old dataset-level clamp)."""
    ds, mcfg, _ = tiny_setup
    tcfg = TrainConfig(
        batch_size=90, num_samples=96, num_epochs=1, checkpoint_every=0
    )
    r = train(ds, mcfg, tcfg, log=lambda *_: None)
    assert np.isfinite(r.best_val_loss)


@pytest.fixture(scope="module")
def fused_setup():
    # Tile-aligned geometry for the Pallas dW+AdamW kernel: flat K = 16*8 =
    # 128, pixels N = 16*16 = 256 (see ops/fused_dw_adamw.py tile rules).
    spec = SheetSpec(width=16, height=16, max_chars=16)
    atlas = bake_atlas(FIRACODE_PATH, spec)
    ds = build_device_dataset(atlas, num_samples=96, synth_batch=32)
    mcfg = ModelConfig(
        max_length=16, hidden_dim=8, sheet_height=16, sheet_width=16
    )
    return ds, mcfg


def test_fused_loop_trains_and_resumes(fused_setup, tmp_path):
    """End-to-end loop on the fused dW+AdamW path, including checkpoint
    resume of FusedTrainState (mu_w/nu_w/count restored typed)."""
    ds, mcfg = fused_setup
    mk = lambda epochs: TrainConfig(
        batch_size=16, num_samples=96, num_epochs=epochs,
        fused_dw_adamw=True, adam_mu_bf16=False, checkpoint_every=1,
        eval_every=10,
    )
    ckdir = str(tmp_path / "ck")
    r1 = train(ds, mcfg, mk(2), checkpoint_dir=ckdir, log=lambda *_: None)
    assert np.isfinite(r1.best_val_loss)
    r2 = train(
        ds, mcfg, mk(4), checkpoint_dir=ckdir, resume=True,
        log=lambda *_: None,
    )
    assert len(r2.history) == 2  # epochs 2-3 only
    assert r2.best_val_loss <= r1.best_val_loss


class TestCosineSchedule:
    def test_warmup_then_decay(self):
        from ai_font_renderer_tpu.train.schedule import CosineSchedule

        s = CosineSchedule(peak_lr=1e-3, total_epochs=10, warmup_epochs=2)
        assert s.lr_at(0) == pytest.approx(5e-4)
        assert s.lr_at(1) == pytest.approx(1e-3)
        assert s.lr_at(2) == pytest.approx(1e-3)  # cos(0) = 1 -> peak
        assert s.lr_at(9) < 1e-4
        assert s.lr_at(100) == pytest.approx(1e-6, rel=1e-2)

    def test_cosine_training_decays_lr(self, tiny_setup):
        ds, mcfg, _ = tiny_setup
        tcfg = TrainConfig(
            batch_size=16, num_samples=96, num_epochs=4, eval_every=10,
            checkpoint_every=0, schedule="cosine", peak_learning_rate=2e-3,
            warmup_epochs=1,
        )
        r = train(ds, mcfg, tcfg, log=lambda *_: None)
        lrs = [h["lr"] for h in r.history]
        assert lrs[0] == pytest.approx(2e-3)
        assert lrs[-1] < lrs[1]  # decaying after warmup


def test_tensorboard_exporter(tmp_path):
    """metrics.jsonl -> TB event files (tools/metrics_to_tensorboard.py)."""
    pytest.importorskip("torch.utils.tensorboard")
    import json
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from metrics_to_tensorboard import export

    run = tmp_path / "run"
    run.mkdir()
    with open(run / "metrics.jsonl", "w") as f:
        for e in range(3):
            f.write(
                json.dumps(
                    {"epoch": e, "train_loss": 1.0 / (e + 1), "lr": 1e-3}
                )
                + "\n"
            )
    out = export(str(run))
    events = [p for p in os.listdir(out) if p.startswith("events.out")]
    assert events, "no event file written"


def test_time_budget_stops_training(tiny_setup, tmp_path):
    """max_train_seconds: clean stop with best-weights restore after the
    first epoch that exhausts the budget."""
    ds, mcfg, _ = tiny_setup
    tcfg = TrainConfig(
        batch_size=16,
        num_samples=96,
        num_epochs=500,
        eval_every=1000,
        checkpoint_every=0,
        max_train_seconds=0.0,  # exhausted immediately after epoch 0
    )
    result = train(ds, mcfg, tcfg, output_dir=None, log=lambda *_: None)
    assert result.early_stopped
    assert result.final_epoch == 0
    assert np.isfinite(result.best_val_loss)
    assert result.params is not None
