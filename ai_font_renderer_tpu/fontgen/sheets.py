"""On-device sheet synthesis: glyph atlas + layout grid -> pixel sheets.

This op replaces the entire offline dataset of the reference (150k BMP files,
generate_font.ts:219-224, reloaded into an 11.5 GB tensor by
helpers.py:125-181). A sheet is reconstructed from three tensors:

  * the baked atlas          [L, S, C, ch, cw]   (coverage cells, static)
  * a per-sample layout grid [B, L, S] int       (charset index per cell)
  * two *static* 0/1 placement operators mapping cell-local pixels to sheet
    pixels: colP [S, cw, W] and rowP [L, ch, H].

Synthesis is then a gather plus two einsums:

    cells = atlas[line, slot, grid]                    # gather
    strips = einsum('blsac,scx->blax', cells, colP)    # MXU matmul
    cov    = einsum('blax,lay->byx',  strips, rowP)    # MXU matmul
    sheet  = round(clip(1 - cov) * 255) / 255          # white bg, 8-bit quant

Everything is static-shaped and fuses into the jitted train step, so training
targets are generated on the MXU at memory-bandwidth-negligible cost — no host
transfers, no disk. Ink compositing is additive, which matches the canvas's
source-over for glyphs whose ink does not overlap (monospace sidebearings
guarantee this); the final 8-bit quantization reproduces the BMP round-trip
the reference bakes into its targets (helpers.py:33,121).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .atlas import GlyphAtlas


@dataclass(frozen=True)
class SynthOps:
    """Device-resident operands for sheet synthesis (a pytree)."""

    atlas: jax.Array  # [L, S, C, ch, cw] (bf16 or f32)
    col_place: jax.Array  # [S, cw, W] same dtype
    row_place: jax.Array  # [L, ch, H] same dtype
    height: int
    width: int


jax.tree_util.register_dataclass(
    SynthOps,
    data_fields=["atlas", "col_place", "row_place"],
    meta_fields=["height", "width"],
)


def make_placement_operators(atlas: GlyphAtlas) -> tuple[np.ndarray, np.ndarray]:
    """Static 0/1 placement matrices (host-side, built once per atlas).

    colP[s, c, x] = 1 iff sheet column x == x0[s] + c (clipped at edges);
    rowP[l, a, y] = 1 iff sheet row    y == y0[l] + a.
    """
    W, H = atlas.spec.width, atlas.spec.height
    col = np.zeros((atlas.n_slots, atlas.cell_w, W), np.float32)
    for s in range(atlas.n_slots):
        for c in range(atlas.cell_w):
            x = atlas.x0[s] + c
            if 0 <= x < W:
                col[s, c, x] = 1.0
    row = np.zeros((atlas.n_lines, atlas.cell_h, H), np.float32)
    for l in range(atlas.n_lines):
        for a in range(atlas.cell_h):
            y = atlas.y0[l] + a
            if 0 <= y < H:
                row[l, a, y] = 1.0
    return col, row


def make_synth_ops(atlas: GlyphAtlas, dtype=jnp.bfloat16) -> SynthOps:
    """Upload atlas + placement operators to device in the compute dtype."""
    col, row = make_placement_operators(atlas)
    return SynthOps(
        atlas=jnp.asarray(atlas.table, dtype),
        col_place=jnp.asarray(col, dtype),
        row_place=jnp.asarray(row, dtype),
        height=atlas.spec.height,
        width=atlas.spec.width,
    )


@partial(jax.jit, static_argnames=("quantize",))
def synthesize_sheets(
    ops: SynthOps, grids: jax.Array, quantize: bool = True
) -> jax.Array:
    """Render layout grids to sheets entirely on device.

    Args:
      ops: baked atlas + placement operators.
      grids: int [B, L, S] charset indices (0 = blank).
      quantize: snap output to the 8-bit grid (matches BMP-roundtrip targets).

    Returns:
      float32 [B, H, W] sheets, 1.0 = white background, 0.0 = full ink.
    """
    L, S = ops.atlas.shape[0], ops.atlas.shape[1]
    line_ix = jax.lax.broadcasted_iota(jnp.int32, (L, S), 0)
    slot_ix = jax.lax.broadcasted_iota(jnp.int32, (L, S), 1)
    # Gather each grid cell's phase-correct coverage cell.
    cells = ops.atlas[line_ix, slot_ix, grids]  # [B, L, S, ch, cw]
    # f32 operands get HIGHEST precision so the f32 path is bit-exact vs the
    # numpy oracle even on TPU (default MXU precision would truncate to bf16);
    # the bf16 fast path is unaffected.
    prec = (
        jax.lax.Precision.HIGHEST
        if ops.atlas.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    strips = jnp.einsum(
        "blsac,scx->blax",
        cells,
        ops.col_place,
        preferred_element_type=jnp.float32,
        precision=prec,
    )
    cov = jnp.einsum(
        "blax,lay->byx",
        strips,
        ops.row_place,
        preferred_element_type=jnp.float32,
        precision=prec,
    )
    sheet = jnp.clip(1.0 - cov, 0.0, 1.0)
    if quantize:
        sheet = jnp.round(sheet * 255.0) / 255.0
    return sheet.astype(jnp.float32)


def synthesize_sheets_host(atlas: GlyphAtlas, grids: np.ndarray) -> np.ndarray:
    """Float32 numpy reference implementation (oracle for tests/goldens)."""
    col, row = make_placement_operators(atlas)
    grids = np.asarray(grids)
    L, S = atlas.n_lines, atlas.n_slots
    line_ix = np.broadcast_to(np.arange(L)[:, None], (L, S))
    slot_ix = np.broadcast_to(np.arange(S)[None, :], (L, S))
    cells = atlas.table[line_ix, slot_ix, grids]
    strips = np.einsum("blsac,scx->blax", cells, col, optimize=True)
    cov = np.einsum("blax,lay->byx", strips, row, optimize=True)
    sheet = np.clip(1.0 - cov, 0.0, 1.0)
    return (np.round(sheet * 255.0) / 255.0).astype(np.float32)
