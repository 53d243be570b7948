"""Multi-font conditioned glyph model: (font_id, char) -> glyph bitmap.

Extended config (BASELINE.json): one model trained on both bundled TTFs
(FiraCode-Retina + Montserrat-Regular). Architecture mirrors the implicit
SIREN trunk with *two* conditioning embeddings — font and character — whose
concatenation drives the FiLM modulation; sharing the coordinate trunk
across fonts is what makes cross-font structure (stems, bowls, counters)
shared representation rather than per-font memorization.

Also usable with an SDF head (mode='sdf') which combined with the
printable-ASCII/Unicode atlas path covers BASELINE config 5.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class MultiFontConfig:
    n_fonts: int = 2
    n_chars: int = 95
    embed_dim: int = 64
    font_dim: int = 16
    hidden_dim: int = 128
    n_layers: int = 4
    w0_first: float = 30.0
    w0_hidden: float = 1.0
    cell: int = 64
    mode: str = "coverage"  # or "sdf"


def init(key: jax.Array, cfg: MultiFontConfig = MultiFontConfig()) -> dict:
    keys = jax.random.split(key, 4 + 2 * cfg.n_layers)
    cond = cfg.embed_dim + cfg.font_dim
    params = {
        "char_embed": 0.1 * jax.random.normal(keys[0], (cfg.n_chars, cfg.embed_dim)),
        "font_embed": 0.1 * jax.random.normal(keys[1], (cfg.n_fonts, cfg.font_dim)),
        "w_in": jax.random.uniform(keys[2], (2, cfg.hidden_dim), jnp.float32, -0.5, 0.5),
        "b_in": jnp.zeros((cfg.hidden_dim,)),
    }
    for i in range(cfg.n_layers):
        k_w, k_f = keys[3 + 2 * i : 5 + 2 * i]
        bound = float(jnp.sqrt(6.0 / cfg.hidden_dim)) / cfg.w0_hidden
        params[f"w_{i}"] = jax.random.uniform(
            k_w, (cfg.hidden_dim, cfg.hidden_dim), jnp.float32, -bound, bound
        )
        params[f"b_{i}"] = jnp.zeros((cfg.hidden_dim,))
        params[f"film_w_{i}"] = 0.01 * jax.random.normal(
            k_f, (cond, 2 * cfg.hidden_dim)
        )
        params[f"film_b_{i}"] = jnp.zeros((2 * cfg.hidden_dim,))
    b = float(jnp.sqrt(6.0 / cfg.hidden_dim))
    params["w_out"] = jax.random.uniform(
        keys[-1], (cfg.hidden_dim, 1), jnp.float32, -b, b
    )
    params["b_out"] = jnp.zeros((1,))
    return params


@partial(jax.jit, static_argnames=("cfg",))
def apply(params, font_ids, char_ids, coords, cfg: MultiFontConfig):
    """[B] fonts x [B] chars x [B, P, 2] coords -> [B, P] values."""
    cond = jnp.concatenate(
        [params["char_embed"][char_ids], params["font_embed"][font_ids]], axis=-1
    )
    h = jnp.sin(cfg.w0_first * (coords @ params["w_in"] + params["b_in"]))
    for i in range(cfg.n_layers):
        film = cond @ params[f"film_w_{i}"] + params[f"film_b_{i}"]
        scale, shift = jnp.split(film, 2, axis=-1)
        z = h @ params[f"w_{i}"] + params[f"b_{i}"]
        z = z * (1.0 + scale[:, None, :]) + shift[:, None, :]
        h = jnp.sin(cfg.w0_hidden * z)
    out = (h @ params["w_out"] + params["b_out"])[..., 0]
    if cfg.mode == "coverage":
        out = jax.nn.sigmoid(out)
    return out


@partial(jax.jit, static_argnames=("cfg",))
def render_atlas(params, cfg: MultiFontConfig) -> jax.Array:
    """All fonts x all glyphs in one device call: [F, C, cell, cell]."""
    from .siren import grid_coords

    coords = grid_coords(cfg.cell)
    f_ids = jnp.repeat(jnp.arange(cfg.n_fonts), cfg.n_chars)
    c_ids = jnp.tile(jnp.arange(cfg.n_chars), cfg.n_fonts)
    coords_b = jnp.broadcast_to(
        coords[None], (cfg.n_fonts * cfg.n_chars, coords.shape[0], 2)
    )
    vals = apply(params, f_ids, c_ids, coords_b, cfg)
    return vals.reshape(cfg.n_fonts, cfg.n_chars, cfg.cell, cfg.cell)


def loss_fn(params, font_ids, char_ids, coords, targets, cfg: MultiFontConfig):
    pred = apply(params, font_ids, char_ids, coords, cfg)
    return jnp.mean((pred - targets) ** 2)
