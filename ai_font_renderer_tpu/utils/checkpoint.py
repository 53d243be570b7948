"""Model persistence + resumable training checkpoints.

Two layers, mirroring and exceeding the reference:

  * :func:`save_params` / :func:`load_params` — single-file npz of model
    weights, the equivalent of the reference's ``font_renderer.pth``
    final-weights save/load (helpers.py:18,76-105). Same contract: save
    after training, load-or-train at startup.
  * :class:`CheckpointManager` — orbax-backed full-state checkpoints
    (params + optimizer state + epoch + host control state), giving
    mid-training resume the reference lacks entirely (a crash there loses
    the run: best weights only ever live in RAM, model.py:344).
"""

from __future__ import annotations

import json
import os
import shutil

import jax
import numpy as np
import orbax.checkpoint as ocp

MODEL_FILENAME = "font_renderer.npz"  # analog of helpers.py:18

# Architecture fields persisted inside the npz as a JSON sidecar entry.
# Runtime knobs (bf16_matmul, fused_attention, ...) are deliberately NOT
# saved: they change execution, not the function the weights define.
_CONFIG_KEY = "__config__"
_CONFIG_FIELDS = (
    "vocab_size",
    "embedding_dim",
    "num_heads",
    "max_length",
    "hidden_dim",
    "num_blocks",
    "sheet_height",
    "sheet_width",
    "decoder",
    "decoder_grid",
    "decoder_channels",
)


def save_params(params: dict, filename: str = MODEL_FILENAME, mcfg=None) -> None:
    """Save model weights to a single npz file (cf. helpers.py:76-79).

    When ``mcfg`` (a ModelConfig) is given, its architecture fields are
    embedded as a ``__config__`` JSON entry so loading never has to guess
    hyperparameters that shapes can't determine (num_heads, decoder_grid).
    Old files without the entry still load (infer_model_config fallback).
    """
    flat = {k: np.asarray(v) for k, v in params.items()}
    if mcfg is not None:
        cfg_json = json.dumps(
            {f: getattr(mcfg, f) for f in _CONFIG_FIELDS}
        )
        flat[_CONFIG_KEY] = np.array(cfg_json)
    d = os.path.dirname(filename)
    if d:
        os.makedirs(d, exist_ok=True)
    if filename.endswith(".pth"):
        from .torch_interop import save_pth

        save_pth(params, filename, mcfg)
        print(f"Model saved to {filename}")
        return
    np.savez(filename, **flat)
    print(f"Model saved to {filename}")


def load_params(filename: str = MODEL_FILENAME) -> dict:
    """Load model weights saved by :func:`save_params` (cf. helpers.py:81-105).

    Also accepts a reference-produced torch state_dict (``*.pth``) via the
    torch interop shim (utils/torch_interop.py).
    """
    params, _ = load_params_with_config(filename, base=None)
    return params


def load_params_with_config(filename: str = MODEL_FILENAME, base="default"):
    """Load weights plus their architecture config -> (params, mcfg | None).

    Priority: the embedded ``__config__`` entry (exact, written by
    save_params), else shape inference via ``infer_model_config`` (which
    must guess num_heads / decoder_grid). ``base=None`` skips config
    recovery entirely and returns (params, None).
    """
    import dataclasses

    from ..config import ModelConfig

    if filename.endswith(".pth"):
        from .torch_interop import load_pth

        params = load_pth(filename)
        cfg_json = None
    else:
        z = np.load(filename)
        cfg_json = (
            str(z[_CONFIG_KEY][()]) if _CONFIG_KEY in z.files else None
        )
        params = {
            k: jax.numpy.asarray(z[k]) for k in z.files if k != _CONFIG_KEY
        }
    print(f"Model loaded from {filename}")
    if base is None:
        return params, None
    base_cfg = ModelConfig() if base == "default" else base
    if cfg_json is not None:
        kw = json.loads(cfg_json)
        for tup_field in ("decoder_grid", "decoder_channels"):
            if tup_field in kw:
                kw[tup_field] = tuple(kw[tup_field])
        return params, dataclasses.replace(base_cfg, **kw)
    from ..models.font_renderer import infer_model_config

    return params, infer_model_config(params, base_cfg)


_SIREN_CONFIG_KEY = "__siren_config__"


def save_siren(
    params: dict, cfg, charset: str, filename: str, font: str | None = None
) -> None:
    """Persist an implicit glyph bank (models/siren.py) with its config.

    One npz: SIREN weights + a JSON entry carrying the SirenConfig fields
    and the charset the bank was trained on — everything the composition
    paths (render/implicit_sheet.py) need to reconstruct the renderer.
    ``font`` (a TTF path; only the basename is stored) tags the bank with
    the font it was trained against so render surfaces can flag a
    mismatched ``--font`` — a bank composed with another font's metrics
    lays glyphs out nonsensically and renders a near-blank sheet.
    """
    import dataclasses

    flat = {k: np.asarray(v) for k, v in params.items()}
    meta = {"cfg": dataclasses.asdict(cfg), "charset": charset}
    if font:
        meta["font"] = os.path.basename(font)
    flat[_SIREN_CONFIG_KEY] = np.array(json.dumps(meta))
    d = os.path.dirname(filename)
    if d:
        os.makedirs(d, exist_ok=True)
    np.savez(filename, **flat)
    print(f"SIREN bank saved to {filename}")


def load_siren(filename: str):
    """Load a bank saved by :func:`save_siren` -> (params, cfg, charset)."""
    from ..models.siren import SirenConfig

    z = np.load(filename)
    if _SIREN_CONFIG_KEY not in z.files:
        raise ValueError(
            f"{filename} is not a SIREN bank (no {_SIREN_CONFIG_KEY} entry)"
        )
    meta = json.loads(str(z[_SIREN_CONFIG_KEY][()]))
    params = {
        k: jax.numpy.asarray(z[k]) for k in z.files if k != _SIREN_CONFIG_KEY
    }
    print(f"SIREN bank loaded from {filename}")
    return params, SirenConfig(**meta["cfg"]), meta["charset"]


def siren_font(filename: str) -> str | None:
    """The font basename a bank was trained against, or None for untagged
    banks (every bank saved before the tag existed, incl. the committed
    artifacts)."""
    z = np.load(filename)
    if _SIREN_CONFIG_KEY not in z.files:
        return None
    return json.loads(str(z[_SIREN_CONFIG_KEY][()])).get("font")


class CheckpointManager:
    """Orbax step checkpoints + a JSON sidecar for host control state."""

    def __init__(self, directory: str, keep: int = 3):
        self.directory = os.path.abspath(directory)
        self.keep = keep
        self._ckptr = ocp.PyTreeCheckpointer()

    def _step_dir(self, step: int) -> str:
        return os.path.join(self.directory, f"step_{step:08d}")

    def steps(self) -> list[int]:
        if not os.path.isdir(self.directory):
            return []
        out = []
        for name in os.listdir(self.directory):
            if name.startswith("step_") and os.path.exists(
                os.path.join(self.directory, name, "host_state.json")
            ):
                out.append(int(name.split("_")[1]))
        return sorted(out)

    def latest_step(self) -> int | None:
        steps = self.steps()
        return steps[-1] if steps else None

    def save(self, step: int, tree, host_state: dict) -> None:
        """Save device pytree + host-side control state atomically enough:
        the JSON sidecar is written last and marks the checkpoint complete."""
        path = self._step_dir(step)
        tmp = path + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(path, ignore_errors=True)
        self._ckptr.save(os.path.join(tmp, "tree"), tree)
        os.replace(tmp, path)
        with open(os.path.join(path, "host_state.json"), "w") as f:
            json.dump(host_state, f)
        for old in self.steps()[: -self.keep]:
            shutil.rmtree(self._step_dir(old), ignore_errors=True)

    def host_state(self, step: int | None = None) -> dict:
        """Read just the JSON sidecar (cheap; no tensor IO)."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        with open(os.path.join(self._step_dir(step), "host_state.json")) as f:
            return json.load(f)

    def restore(self, step: int | None = None, template=None):
        """Returns (step, tree, host_state); step=None restores the latest.

        ``template``: an example pytree (same structure as what was saved).
        When given, the restore is structure-aware — NamedTuples (optax
        states, TrainState) come back as their original types, and each leaf
        is restored with the template leaf's dtype AND sharding (orbax
        shards the read directly onto the mesh; no host-side repartition).
        Without it, orbax returns nested dicts/lists of host arrays.
        """
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        path = self._step_dir(step)
        if template is not None:
            restore_args = ocp.checkpoint_utils.construct_restore_args(template)
            tree = self._ckptr.restore(
                os.path.join(path, "tree"),
                item=template,
                restore_args=restore_args,
            )
        else:
            tree = self._ckptr.restore(os.path.join(path, "tree"))
        with open(os.path.join(path, "host_state.json")) as f:
            host_state = json.load(f)
        return step, tree, host_state
