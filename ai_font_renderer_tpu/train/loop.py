"""The training loop: device epochs + host control.

Orchestrates what model.py:209-421 does — 80/20 split, epoch loop with
validation, ReduceLROnPlateau, early stopping with best-weights restore,
periodic eval renders, run manifests — around the fused device epoch of
``step.py``. All numerics run on device; the host only shuffles indices,
steps the scheduler, and logs.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, TrainConfig
from ..fontgen.dataset import DeviceDataset, split_permutation, split_sizes
from ..utils.checkpoint import CheckpointManager
from ..utils.metrics import MetricsLogger, Stopwatch
from . import step as train_step_mod
from .manifests import write_config_manifest, write_results_manifest
from .schedule import CosineSchedule, EarlyStopping, ReduceLROnPlateau


@dataclasses.dataclass
class TrainResult:
    params: dict
    best_val_loss: float
    final_epoch: int
    early_stopped: bool
    final_lr: float
    history: list


def _val_batches(val_idx: np.ndarray, batch_size: int):
    """Pad validation indices to whole batches with zero-weight repeats."""
    n = len(val_idx)
    steps = max(1, -(-n // batch_size))
    padded = np.zeros(steps * batch_size, np.int32)
    padded[:n] = val_idx
    padded[n:] = val_idx[-1] if n else 0
    weights = np.zeros(steps * batch_size, np.float32)
    weights[:n] = 1.0
    return (
        padded.reshape(steps, batch_size),
        weights.reshape(steps, batch_size),
    )


def train(
    dataset: DeviceDataset,
    mcfg: ModelConfig = ModelConfig(),
    tcfg: TrainConfig = TrainConfig(),
    output_dir: str | None = None,
    eval_strings: list[str] | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
    mesh=None,
    log=print,
) -> TrainResult:
    """Train the font renderer; returns best params + run stats.

    ``mesh``: optional jax.sharding.Mesh with ('data','model') axes — the
    corpus replicates, batches shard over 'data', and the output projection
    (99.99% of params) shards over 'model'; GSPMD handles the collectives.
    """
    n = dataset.num_samples
    train_size, val_size = split_sizes(n, tcfg.validation_split)
    # Clamp to the TRAIN split, not the dataset: with e.g. 1200 samples and
    # batch 1024 the train split is 960 and a dataset-level clamp would make
    # the epoch reshape fail.
    batch_size = max(1, min(tcfg.batch_size, train_size))
    if mesh is not None:
        # Batches shard over the 'data' axis; round the (possibly clamped)
        # batch down to a multiple of it so every device gets equal rows —
        # otherwise GSPMD rejects the sharding outright (non-divisible dim).
        data_par = int(mesh.shape.get("data", 1))
        batch_size = max(data_par, (batch_size // data_par) * data_par)
    log(f"Dataset split: {train_size} training samples, {val_size} validation samples")

    perm = split_permutation(n, tcfg.seed)
    train_idx = perm[:train_size].astype(np.int32)
    val_idx = perm[train_size:].astype(np.int32)
    steps_per_epoch = max(1, train_size // batch_size)
    val_batch_idx, val_weights = _val_batches(val_idx, batch_size)
    val_batch_idx = jnp.asarray(val_batch_idx)
    val_weights = jnp.asarray(val_weights)

    if mesh is not None:
        from ..parallel import replicate, shard_batch_idx

        dataset = DeviceDataset(
            codes=replicate(mesh, dataset.codes),
            targets_u8=replicate(mesh, dataset.targets_u8),
        )
        val_batch_idx = shard_batch_idx(mesh, val_batch_idx)
        val_weights = shard_batch_idx(mesh, val_weights)

    if output_dir:
        write_config_manifest(output_dir, mcfg, tcfg, batch_size, n)

    key = jax.random.key(tcfg.seed, impl=tcfg.prng_impl)
    init_key = jax.random.PRNGKey(tcfg.seed)  # param init stays threefry
    use_fused = tcfg.fused_dw_adamw
    if mesh is not None and np.prod(mesh.devices.shape) > 1:
        # Pallas kernels are opaque to GSPMD: sharded operands would be
        # silently gathered onto each device instead of partitioned.
        # Unsupported until the kernels are shard_map'd — fail loudly
        # rather than quietly unsharding.
        if use_fused:
            raise ValueError(
                "fused_dw_adamw is single-device only; train on a mesh "
                "with the standard step (TrainConfig(fused_dw_adamw=False))"
            )
        if mcfg.fused_attention or mcfg.fused_attention_v2:
            raise ValueError(
                "the fused attention kernels do not compose with this "
                "GSPMD sharding path (pallas_call is opaque to it); use "
                "the explicit shard_map DP step instead "
                "(parallel.make_shard_map_train_step — kernels run "
                "per-shard there, tested in test_parallel.py), or train "
                "with fused_attention=False / fused_attention_v2=False"
            )
    state = (
        train_step_mod.init_fused_state(init_key, mcfg, tcfg)
        if use_fused
        else train_step_mod.init_state(init_key, mcfg, tcfg)
    )
    epoch_fn = (
        train_step_mod.train_eval_epoch_fused
        if use_fused
        else train_step_mod.train_eval_epoch
    )
    if mesh is not None:
        from ..parallel import shard_state

        state = shard_state(mesh, state)
    scheduler = ReduceLROnPlateau(
        lr=tcfg.learning_rate,
        factor=tcfg.scheduler_factor,
        patience=tcfg.scheduler_patience,
        min_lr=tcfg.min_learning_rate,
    )
    cosine = (
        CosineSchedule(
            peak_lr=tcfg.peak_learning_rate or tcfg.learning_rate,
            total_epochs=tcfg.num_epochs,
            warmup_epochs=tcfg.warmup_epochs,
            min_lr=tcfg.min_learning_rate,
        )
        if tcfg.schedule == "cosine"
        else None
    )
    early = EarlyStopping(patience=tcfg.early_stopping_patience)
    ckpt = CheckpointManager(checkpoint_dir) if checkpoint_dir else None
    start_epoch = 0
    if ckpt and resume and ckpt.latest_step() is not None:
        step_num = ckpt.latest_step()
        host = ckpt.host_state(step_num)
        if host.get("format", 1) >= 2:
            # Structure- and sharding-aware restore: the template is the
            # freshly initialized (and, under a mesh, already sharded)
            # state, so NamedTuples come back typed and every leaf lands
            # directly on its mesh placement. Works for TrainState and
            # FusedTrainState alike.
            template = {"state": state, "best_params": state.params}
            _, tree, _ = ckpt.restore(step_num, template=template)
            state = tree["state"]
            if host.get("has_best"):
                # Restore the historical best-weights snapshot so a resumed
                # run that never improves still returns the true best
                # (reference semantics, model.py:344,365).
                early.best_state = tree["best_params"]
        else:  # legacy round-1 layout: {"params", "opt_state"}, untyped
            _, tree, _ = ckpt.restore(step_num)
            state = train_step_mod.TrainState(
                tree["params"], _retuple(tree["opt_state"], state.opt_state)
            )
        start_epoch = step_num + 1
        scheduler.lr = host["lr"]
        scheduler.best = host["scheduler_best"]
        scheduler.num_bad_epochs = host["scheduler_bad_epochs"]
        early.best_loss = host["best_val_loss"]
        early.counter = host["early_counter"]
        log(f"Resumed from checkpoint at epoch {step_num}")

    metrics = MetricsLogger(
        f"{output_dir}/metrics.jsonl" if output_dir else None,
        resume=start_epoch > 0,
    )
    shuffle_rng = np.random.default_rng(tcfg.seed + 1)
    # Replay-consistent resume: burn the permutations epochs 0..start_epoch-1
    # consumed so the resumed run draws the same shuffles an uninterrupted
    # run would.
    for _ in range(start_epoch):
        shuffle_rng.permutation(train_size)
    history: list[dict] = []
    lr = scheduler.lr
    epoch = start_epoch - 1
    stopped = False
    watch = Stopwatch()
    train_t0 = time.perf_counter()

    for epoch in range(start_epoch, tcfg.num_epochs):
        if cosine is not None:
            lr = cosine.lr_at(epoch)
        epoch_perm = shuffle_rng.permutation(train_size)[
            : steps_per_epoch * batch_size
        ]
        batch_idx = jnp.asarray(
            train_idx[epoch_perm].reshape(steps_per_epoch, batch_size)
        )
        if mesh is not None:
            from ..parallel import shard_batch_idx

            batch_idx = shard_batch_idx(mesh, batch_idx)
        epoch_key = jax.random.fold_in(key, epoch)
        # Train scan + validation pass fused into one device dispatch.
        state, train_loss, val_loss = epoch_fn(
            state,
            dataset.codes,
            dataset.targets_u8,
            batch_idx,
            val_batch_idx,
            val_weights,
            jnp.float32(lr),
            epoch_key,
            mcfg,
            tcfg,
        )
        val_loss = float(val_loss)
        train_loss = float(train_loss)
        if cosine is None:
            lr = scheduler.step(val_loss)
        # Snapshot best params with a real copy: the next epoch donates the
        # state's buffers, which would invalidate a mere reference.
        is_best = early.update(val_loss, None)
        if is_best:
            early.best_state = jax.tree.map(jnp.copy, state.params)

        seconds = watch.lap()
        history.append(
            {
                "epoch": epoch,
                "train_loss": train_loss,
                "val_loss": val_loss,
                "lr": lr,
                "seconds": seconds,
            }
        )
        metrics.log(
            epoch=epoch,
            train_loss=train_loss,
            val_loss=val_loss,
            lr=lr,
            seconds=seconds,
            samples_per_sec=steps_per_epoch * batch_size / max(seconds, 1e-9),
        )

        if epoch % tcfg.eval_every == 0:
            status = (
                f"Epoch {epoch}, Train Loss: {train_loss:.6f}, "
                f"Val Loss: {val_loss:.6f}, LR: {lr:.6f}"
            )
            if is_best:
                status += " (New Best)"
            log(status)
            if output_dir and eval_strings:
                from ..render.render import render_strings

                render_strings(
                    state.params, eval_strings, f"{output_dir}/epoch_{epoch}", mcfg
                )
        elif is_best:
            log(f"Epoch {epoch}, New best validation loss: {val_loss:.6f}")

        if ckpt and tcfg.checkpoint_every and (
            epoch % tcfg.checkpoint_every == 0 or epoch == tcfg.num_epochs - 1
        ):
            ckpt.save(
                epoch,
                {
                    "state": state,
                    # Best-weights snapshot rides along so resume restores
                    # reference best-restore semantics; falls back to the
                    # current params when no best exists yet (has_best
                    # tells the restore side to ignore it then).
                    "best_params": (
                        early.best_state
                        if early.best_state is not None
                        else state.params
                    ),
                },
                {
                    "format": 2,
                    "has_best": early.best_state is not None,
                    "lr": lr,
                    "scheduler_best": scheduler.best,
                    "scheduler_bad_epochs": scheduler.num_bad_epochs,
                    "best_val_loss": early.best_loss,
                    "early_counter": early.counter,
                    "epoch": epoch,
                },
            )

        if early.should_stop:
            log(
                f"Early stopping at epoch {epoch}, "
                f"Best Val Loss: {early.best_loss:.6f}"
            )
            stopped = True
            break

        if (
            tcfg.max_train_seconds is not None
            and time.perf_counter() - train_t0 >= tcfg.max_train_seconds
        ):
            log(
                f"Time budget ({tcfg.max_train_seconds:.0f}s) reached at "
                f"epoch {epoch}, Best Val Loss: {early.best_loss:.6f}"
            )
            stopped = True
            break

    best_params = (
        early.best_state if early.best_state is not None else state.params
    )
    if not stopped:
        log(f"Training completed, Best Val Loss: {early.best_loss:.6f}")

    final_epoch = epoch + 1 if not stopped else epoch
    if output_dir:
        write_results_manifest(
            output_dir, final_epoch, early.best_loss, lr, stopped
        )
    return TrainResult(
        params=best_params,
        best_val_loss=early.best_loss,
        final_epoch=final_epoch,
        early_stopped=stopped,
        final_lr=lr,
        history=history,
    )


def _retuple(restored, template):
    """Orbax restores NamedTuples as nested lists/dicts; rebuild the original
    optax state structure from the template's treedef."""
    leaves = jax.tree_util.tree_leaves(restored)
    treedef = jax.tree_util.tree_structure(template)
    return jax.tree_util.tree_unflatten(treedef, leaves)
