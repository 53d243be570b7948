"""Training drivers for the implicit glyph families (SIREN/multifont/SDF).

These models are small (hundreds of KB) and their datasets are baked glyph
tensors, so the entire optimization — every step — runs as ONE device call:
full-batch Adam with cosine decay inside a `lax.scan`. No host loop at all.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from ..config import PRINTABLE_ASCII
from ..fontgen.glyphs import rasterize_charset, sdf_charset
from ..models import multifont as mf
from ..models import siren


def _scan_train(
    loss_fn,
    params,
    steps: int,
    lr: float,
    data_tuple,
    chunk_size: int = 500,
    item_batch: int | None = None,
    seed: int = 0,
):
    """Adam with cosine decay, scanned on device in bounded chunks.

    Chunking keeps single device programs short (very long scans have
    tripped remote-worker watchdogs); the schedule state lives in opt_state
    so it is semantics-free. When ``item_batch`` is set, each step samples
    that many rows (leading axis of every array in ``data_tuple``) — large
    charsets (full Unicode) would otherwise materialize multi-GB activation
    tensors per step.
    """
    opt = optax.adam(
        learning_rate=optax.cosine_decay_schedule(lr, steps, alpha=0.01)
    )
    opt_state = opt.init(params)
    n_items = data_tuple[0].shape[0]
    use_batch = item_batch is not None and item_batch < n_items

    def step(carry, _):
        p, s, k = carry
        if use_batch:
            k, sub = jax.random.split(k)
            idx = jax.random.randint(sub, (item_batch,), 0, n_items)
            args = tuple(jnp.take(a, idx, axis=0) for a in data_tuple)
        else:
            args = data_tuple
        loss, grads = jax.value_and_grad(loss_fn)(p, *args)
        updates, s = opt.update(grads, s, p)
        return (optax.apply_updates(p, updates), s, k), loss

    @partial(jax.jit, static_argnames=("n",))
    def run_chunk(carry, n):
        return jax.lax.scan(step, carry, None, length=n)

    carry = (params, opt_state, jax.random.key(seed, impl="rbg"))
    losses = []
    done = 0
    while done < steps:
        n = min(chunk_size, steps - done)
        carry, ls = run_chunk(carry, n)
        losses.append(ls)
        done += n
    return carry[0], jnp.concatenate(losses)


def train_siren(
    font_path: str,
    cfg: siren.SirenConfig | None = None,
    charset: str = PRINTABLE_ASCII,
    steps: int = 2000,
    lr: float = 2e-4,
    seed: int = 42,
    glyph_batch: int | None = None,
):
    """Fit the implicit glyph MLP to a rasterized charset.

    Returns (params, losses[steps], targets) — targets kept for evals.
    """
    cfg = cfg or siren.SirenConfig(n_chars=len(charset))
    if cfg.mode == "sdf":
        t = sdf_charset(font_path, charset, cfg.cell)
        t = t / (cfg.cell / 4.0)  # normalize distances to ~[-1, 1]
    else:
        t = rasterize_charset(font_path, charset, cfg.cell)
    targets = jnp.asarray(t.reshape(len(charset), -1))
    coords = siren.grid_coords(cfg.cell)
    coords_b = jnp.broadcast_to(
        coords[None], (len(charset), coords.shape[0], 2)
    )
    char_ids = jnp.arange(len(charset))
    params = siren.init(jax.random.PRNGKey(seed), cfg)
    params, losses = _scan_train(
        partial(siren.loss_fn, cfg=cfg),
        params,
        steps,
        lr,
        (char_ids, coords_b, targets),
        item_batch=glyph_batch,
        seed=seed,
    )
    return params, losses, t


def train_multifont(
    font_paths: list[str],
    cfg: mf.MultiFontConfig | None = None,
    charset: str = PRINTABLE_ASCII,
    steps: int = 3000,
    lr: float = 2e-4,
    seed: int = 42,
):
    """Fit the font-conditioned implicit model on several fonts at once."""
    cfg = cfg or mf.MultiFontConfig(
        n_fonts=len(font_paths), n_chars=len(charset)
    )
    if cfg.mode == "sdf":
        ts = [sdf_charset(p, charset, cfg.cell) / (cfg.cell / 4.0) for p in font_paths]
    else:
        ts = [rasterize_charset(p, charset, cfg.cell) for p in font_paths]
    import numpy as np

    t = np.stack(ts)  # [F, C, cell, cell]
    F, C = t.shape[:2]
    targets = jnp.asarray(t.reshape(F * C, -1))
    coords = siren.grid_coords(cfg.cell)
    coords_b = jnp.broadcast_to(coords[None], (F * C, coords.shape[0], 2))
    font_ids = jnp.repeat(jnp.arange(F), C)
    char_ids = jnp.tile(jnp.arange(C), F)
    params = mf.init(jax.random.PRNGKey(seed), cfg)
    params, losses = _scan_train(
        partial(mf.loss_fn, cfg=cfg),
        params,
        steps,
        lr,
        (font_ids, char_ids, coords_b, targets),
    )
    return params, losses, t
