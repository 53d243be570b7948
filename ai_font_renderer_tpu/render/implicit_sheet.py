"""Implicit-flagship hybrid: SIREN glyph bank -> text sheets at ANY scale.

The flagship model emits fixed 80x240 bitmaps (the reference's only output
mode, model.py:152-156). The implicit glyph family (models/siren.py) stores
glyphs as coordinate functions instead, so a whole text sheet can be
rendered at arbitrary resolution: lay the string out with the same
word-wrap/pen-advance rules as the bitmap pipeline (fontgen/layout.py;
pen at padding + j*adv, baseline at (l+1)*line_height, matching
generate_font.ts:125-130), then evaluate the glyph MLP once per placed
glyph over its cell window and composite ink additively on a white sheet
(clip(1 - sum cov), as fontgen/sheets.py does).

Everything after layout is ONE device call with static shapes: instances
are padded to ``max_glyphs``, every instance evaluates a fixed
[win, win] coordinate window, and contributions scatter-add into the
[N, H, W] sheet batch.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PRINTABLE_ASCII, SheetSpec
from ..fontgen.layout import AdvanceTable, wrap_text
from ..fontgen.ttf import TrueTypeFont
from ..models import siren


@dataclass(frozen=True)
class ImplicitLayout:
    """Static geometry binding a SIREN glyph bank to sheet composition."""

    cell: int  # SIREN training cell resolution
    fill: float  # em fraction of the cell (rasterize_charset default 0.85)
    scale: float  # output sheet scale (1.0 = reference 80x240)
    height: int  # output sheet pixels
    width: int
    win: int  # per-glyph eval window, sheet px
    r: float  # sheet px per cell px
    cell_baseline: float  # baseline row inside the cell, cell px
    cell_x_center: float  # cell column of the advance midpoint, cell px
    max_glyphs: int


def build_layout(
    font: TrueTypeFont,
    spec: SheetSpec = SheetSpec(),
    cell: int = 64,
    fill: float = 0.85,
    scale: float = 1.0,
    max_glyphs: int = 100,
) -> ImplicitLayout:
    span = max(font.ascent - font.descent, 1)
    k_cell = fill * cell / span  # cell px per font unit
    k_sheet = spec.font_size * scale / font.units_per_em  # sheet px per unit
    r = k_sheet / k_cell
    top_margin = 0.5 * (cell - fill * cell)
    return ImplicitLayout(
        cell=cell,
        fill=fill,
        scale=scale,
        height=int(round(spec.height * scale)),
        width=int(round(spec.width * scale)),
        win=int(np.ceil(cell * r)) + 1,
        r=r,
        cell_baseline=top_margin + font.ascent * k_cell,
        cell_x_center=0.5 * cell,
        max_glyphs=max_glyphs,
    )


def font_kerning(font_path: str, charset: str, spec: SheetSpec = SheetSpec()):
    """The font's GPOS/kern pair table for ``charset``, or None if empty.

    Monospace fonts (FiraCode) carry no pairs, so callers can pass the
    result unconditionally — layout stays byte-identical for them."""
    from ..fontgen.kerning import KerningTable

    k = KerningTable(font_path, charset, spec.font_size)
    return k if len(k) else None


def place_glyphs(
    strings: list[str],
    font: TrueTypeFont,
    lay: ImplicitLayout,
    spec: SheetSpec = SheetSpec(),
    charset: str = PRINTABLE_ASCII,
    kerning=None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side layout -> fixed-shape instance arrays.

    Returns (char_ids [N, G], window origins [N, G, 2] (x, y) f32 in output
    sheet px, valid mask [N, G]). Layout happens at BASE scale so word wrap
    is identical at every output scale; positions then multiply by scale.
    ``kerning`` (fontgen.kerning.KerningTable) enters both the wrap measure
    and the pen walk, matching the proportional engine
    (proportional.py:layout_prop_grid) and placement.placement_targets.
    """
    idx = {c: i for i, c in enumerate(charset)}
    adv_base = np.array(
        [
            font.advance(font.glyph_id(ord(c))) * spec.font_size / font.units_per_em
            for c in charset
        ]
    )
    table = AdvanceTable(charset, adv_base, kerning)
    G = lay.max_glyphs
    n = len(strings)
    ids = np.zeros((n, G), np.int32)
    origins = np.zeros((n, G, 2), np.float32)
    valid = np.zeros((n, G), bool)
    wrap_width = spec.width - 2 * spec.padding  # matches layout_to_grid
    for si, s in enumerate(strings):
        s = s[: spec.max_chars]
        g = 0
        for li, line in enumerate(wrap_text(s, table, wrap_width)):
            baseline = (li + 1) * spec.line_height * lay.scale
            pen = spec.padding
            prev = None
            for ch in line:
                ci = idx.get(ch)
                # Unknown chars advance like a space (AdvanceTable maps
                # them to index 0 when measuring) but place no glyph.
                adv_i = 0 if ci is None else ci
                if prev is not None:
                    # GPOS pair adjustment, same pen walk as the engine
                    # (layout_prop_grid) and placement_targets.
                    pen += table.kern(prev, ch)
                prev = ch
                if ci is not None and ch != " " and g < G:
                    # Window top-left so the glyph cell (advance-centered
                    # at bake time, glyphs.py:rasterize_charset) lands with
                    # its advance midpoint on the pen midpoint.
                    mid = (pen + 0.5 * adv_base[ci]) * lay.scale
                    ids[si, g] = ci
                    origins[si, g, 0] = mid - lay.cell_x_center * lay.r
                    origins[si, g, 1] = baseline - lay.cell_baseline * lay.r
                    valid[si, g] = True
                    g += 1
                pen += adv_base[adv_i]
    return ids, origins, valid


def origins_from_midpoints(mids, lay: ImplicitLayout):
    """(advance-midpoint x, baseline y) at BASE scale -> window origins.

    The inverse of the geometry inside place_glyphs: scales to the output
    resolution, then shifts by the glyph cell's advance-center / baseline
    so the cell lands with its reference points on the pen's. Works on
    numpy or jax arrays [..., 2]."""
    mx = mids[..., 0] * lay.scale - lay.cell_x_center * lay.r
    my = mids[..., 1] * lay.scale - lay.cell_baseline * lay.r
    return jnp.stack([mx, my], axis=-1) if isinstance(mids, jax.Array) else (
        np.stack([mx, my], axis=-1).astype(np.float32)
    )


def render_learned_sheets(
    siren_params: dict,
    placement_params: dict,
    strings: list[str],
    font_path: str,
    cfg: siren.SirenConfig,
    pcfg=None,
    spec: SheetSpec = SheetSpec(),
    scale: float = 1.0,
    charset: str = PRINTABLE_ASCII,
    hard: bool = False,
    monotone: bool = False,
    baked: int = 0,
    phased: int = 0,
) -> np.ndarray:
    """Fully neural strings -> sheets: NO layout engine in the loop.

    The placement transformer (models/placement.py) predicts every glyph's
    advance-midpoint/baseline and visibility from the raw char codes; the
    SIREN bank paints the glyphs at the predicted positions. The font file
    is used only to build the static cell geometry (scale factors), never
    to lay out the text. ``hard=True`` uses the discrete placement decode
    (argmax line / thresholded contribution; placement.apply ``hard``);
    ``monotone=True`` additionally constrains the decoded break structure
    to the engine's monotone-line invariant (placement.monotone_lines).
    """
    from ..config import ModelConfig
    from ..fontgen.layout import encode_codes
    from ..models import placement

    if pcfg is None:
        pcfg = ModelConfig()
    font = TrueTypeFont.load(font_path)
    lay = build_layout(font, spec, cfg.cell, scale=scale, max_glyphs=pcfg.max_length)
    codes = jnp.asarray(encode_codes(strings, pcfg.max_length))
    mids, logits = placement.apply(
        placement_params, codes, pcfg, train=False, hard=hard,
        monotone=monotone, spec=spec,
    )
    origins = origins_from_midpoints(mids, lay)

    idx = {c: i for i, c in enumerate(charset)}
    n, G = len(strings), pcfg.max_length
    ids = np.zeros((n, G), np.int32)
    known = np.zeros((n, G), bool)
    for si, s in enumerate(strings):
        for ci, ch in enumerate(s[:G]):
            k = idx.get(ch)
            if k is not None and ch != " ":
                ids[si, ci] = k
                known[si, ci] = True
    valid = jnp.asarray(known) & (jax.nn.sigmoid(logits) > 0.5)
    if phased:
        bank = bake_bank_phased(siren_params, cfg, lay, phases=phased)
        return np.asarray(
            compose_phased(
                bank, jnp.asarray(ids), origins, valid, cfg, lay, phased,
                composite="matmul",
            )
        )
    if baked:
        bank = bake_bank(siren_params, cfg, supersample=baked)
        return np.asarray(
            compose_baked(bank, jnp.asarray(ids), origins, valid, cfg, lay, baked)
        )
    return np.asarray(
        compose(siren_params, jnp.asarray(ids), origins, valid, cfg, lay)
    )


def _window_geometry(origins, lay: ImplicitLayout):
    """Per-glyph eval-window pixel geometry shared by the compose variants.

    Returns (px, py, u, v): absolute window pixel centers [N, G, win, win]
    and their cell-local coordinates in [-1, 1] (the SIREN input frame).
    """
    win, r, cell = lay.win, lay.r, lay.cell
    x0 = jnp.floor(origins[..., 0]).astype(jnp.int32)  # [N, G]
    y0 = jnp.floor(origins[..., 1]).astype(jnp.int32)
    jj, ii = jnp.meshgrid(jnp.arange(win), jnp.arange(win), indexing="xy")
    # Absolute pixel centers of each window cell -> cell-local coords.
    px = x0[..., None, None] + jj + 0.5  # [N, G, win, win]
    py = y0[..., None, None] + ii + 0.5
    xc = (px - origins[..., 0, None, None]) / r
    yc = (py - origins[..., 1, None, None]) / r
    u = xc / cell * 2.0 - 1.0
    v = yc / cell * 2.0 - 1.0
    return px, py, u, v


def _composite(cov, px, py, u, v, valid, lay: ImplicitLayout):
    """Scatter-add per-window coverage into white sheets: [N, H, W]."""
    N = cov.shape[0]
    H, W = lay.height, lay.width
    inside = (jnp.abs(u) <= 1.0) & (jnp.abs(v) <= 1.0)
    xi = (px - 0.5).astype(jnp.int32)
    yi = (py - 0.5).astype(jnp.int32)
    onscreen = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
    mask = inside & onscreen & valid[..., None, None]
    flat_idx = (
        jnp.arange(N, dtype=jnp.int32)[:, None, None, None] * (H * W)
        + jnp.clip(yi, 0, H - 1) * W
        + jnp.clip(xi, 0, W - 1)
    )
    ink = jnp.zeros((N * H * W,), jnp.float32).at[flat_idx.ravel()].add(
        jnp.where(mask, cov, 0.0).ravel()
    )
    return jnp.clip(1.0 - ink.reshape(N, H, W), 0.0, 1.0)


@partial(jax.jit, static_argnames=("cfg", "lay"))
def compose(params, char_ids, origins, valid, cfg: siren.SirenConfig, lay: ImplicitLayout):
    """Evaluate + composite all placed glyphs: ONE device call.

    char_ids [N, G] int32, origins [N, G, 2] f32, valid [N, G] bool
    -> sheets [N, H, W] f32 in [0, 1] (1 = white).
    """
    N, G = char_ids.shape
    win = lay.win
    px, py, u, v = _window_geometry(origins, lay)
    coords = jnp.stack([u, v], axis=-1).reshape(N * G, win * win, 2)
    cov = siren.apply(params, char_ids.reshape(N * G), coords, cfg)
    return _composite(cov.reshape(N, G, win, win), px, py, u, v, valid, lay)


def bake_bank(params, cfg: siren.SirenConfig, supersample: int = 4) -> jax.Array:
    """Evaluate the SIREN bank once on a supersampled glyph grid.

    Returns [n_chars, cell*ss, cell*ss] f32 coverage fields — the
    amortized form :func:`compose_baked` samples from. One device call
    (chunked so full-charset activations stay bounded)."""
    import dataclasses

    cfg_ss = dataclasses.replace(cfg, cell=cfg.cell * supersample)
    return siren.render_atlas_chunked(params, cfg_ss, chunk=16)


def _composite_matmul(cov, x0, y0, valid, lay: ImplicitLayout, dt=jnp.bfloat16):
    """MXU composite: place every window block by one-hot positioning GEMMs.

    The scatter-add composite (:func:`_composite`) serializes on TPU
    (measured ~100 ms for a 256-sheet batch once the MLP is amortized
    away — the new bottleneck after the phased bake). This reformulates
    placement as matmuls: R[n,g,h,i] one-hot of each block's row offset,
    C[n,g,j,w] of its column offset; then

        sheet[n] = sum_g R[n,g] @ cov[n,g] @ C[n,g]
                 = (A reshaped [n, h, g*win]) @ (C reshaped [n, g*win, w])

    — the sum over glyphs rides the second contraction, so nothing
    [N, G, H, W]-sized ever materializes. Off-screen rows/cols simply
    have no one-hot hit; ``cov`` must already be zero outside the glyph
    cell (bake_bank_phased bakes that mask in) and invalid slots are
    zeroed here. One-hots are exact in bf16; accumulation is f32.
    """
    N, G, win, _ = cov.shape
    H, W = lay.height, lay.width
    i = jnp.arange(win)
    R = (
        jnp.arange(H)[None, None, :, None]
        == (y0[..., None, None] + i[None, None, None, :])
    ).astype(dt)  # [N, G, H, win]
    C = (
        jnp.arange(W)[None, None, None, :]
        == (x0[..., None, None] + i[None, None, :, None])
    ).astype(dt)  # [N, G, win, W]
    covm = jnp.where(valid[..., None, None], cov, 0.0).astype(dt)
    A = jnp.einsum(
        "nghi,ngij->nghj", R, covm, preferred_element_type=jnp.float32
    ).astype(dt)
    ink = jnp.einsum(
        "nghj,ngjw->nhw",
        A.reshape(N, G, H, win),
        C,
        preferred_element_type=jnp.float32,
    )
    return jnp.clip(1.0 - ink, 0.0, 1.0)


@partial(jax.jit, static_argnames=("cfg", "lay", "phases"))
def bake_bank_phased(
    params, cfg: siren.SirenConfig, lay: ImplicitLayout, phases: int = 8
) -> jax.Array:
    """Bake every glyph at every subpixel PHASE of the composite window.

    Key geometry fact (see :func:`compose`): a window pixel's cell-local
    coordinate is ((j + 0.5 - frac(origin)) / r), i.e. the evaluated
    field depends only on the origin's FRACTIONAL part — not on where
    the window lands on the sheet. So the entire per-instance SIREN
    evaluation collapses to a finite table: [n_chars, P, P, win, win]
    coverage blocks, phase (pi, pj) holding the field for an instance
    whose origin fraction is (pj/P, pi/P). One device call; for the
    shipped artifacts (win 13, P=8) the table is ~4 MB and costs ~6x
    FEWER MLP evaluations than one ss4 full-resolution bake.
    """
    win, r, cell = lay.win, lay.r, lay.cell
    C = cfg.n_chars
    P = phases
    f = jnp.arange(P, dtype=jnp.float32) / P  # origin fractions
    j = jnp.arange(win, dtype=jnp.float32) + 0.5
    # xc[pj, j] = (j + 0.5 - f_pj) / r  -> u in [-1, 1]
    xc = (j[None, :] - f[:, None]) / r
    u = xc / cell * 2.0 - 1.0  # [P, win]
    uu = jnp.broadcast_to(u[None, :, None, :], (P, P, win, win))  # [pi,pj,i,j]
    vv = jnp.broadcast_to(u[:, None, :, None], (P, P, win, win))
    coords = jnp.stack([uu, vv], axis=-1).reshape(1, P * P * win * win, 2)
    coords = jnp.broadcast_to(coords, (C, P * P * win * win, 2))
    vals = siren.apply(params, jnp.arange(C), coords, cfg)
    # Zero outside the glyph cell: the composite then needs no inside
    # mask (required by the matmul composite, idempotent for scatter).
    inside = (jnp.abs(uu) <= 1.0) & (jnp.abs(vv) <= 1.0)
    vals = vals.reshape(C, P, P, win, win) * inside[None].astype(vals.dtype)
    return vals


@partial(
    jax.jit, static_argnames=("cfg", "lay", "phases", "onehot", "composite")
)
def compose_phased(
    baked,
    char_ids,
    origins,
    valid,
    cfg: siren.SirenConfig,
    lay: ImplicitLayout,
    phases: int = 8,
    onehot: bool = False,
    composite: str = "scatter",
):
    """Composite from a phase-binned bake: whole-block fetch per glyph.

    The TPU-native fast path. :func:`compose_baked`'s 4-tap bilinear
    gather is a measured TPU NEGATIVE (per-element gathers serialize in
    the gather unit; RESULTS.md round 5) — this variant instead quantizes
    each instance's origin to the 1/P-px phase grid and fetches its
    ENTIRE [win, win] pre-evaluated coverage block by leading-axis index
    (``onehot=True`` converts even that gather into a one-hot x table
    GEMM on the MXU). Approximation vs exact compose: glyph positions
    quantize to 1/P px (P=8 -> <=1/16 px shift, below the bank's own
    fidelity); the compositing scatter is IDENTICAL.
    """
    N, G = char_ids.shape
    win = lay.win
    P = phases
    C = baked.shape[0]
    # Quantize origins to the phase grid, then split integer/fraction so
    # the fraction is exactly a bin index (no wrap case at f -> 1).
    oq = jnp.round(origins * P) / P
    o0 = jnp.floor(oq)
    bins = jnp.round((oq - o0) * P).astype(jnp.int32) % P  # [N, G, 2]
    idx = (char_ids * P + bins[..., 1]) * P + bins[..., 0]  # [N, G]
    flatb = baked.reshape(C * P * P, win * win)
    if onehot:
        oh = jax.nn.one_hot(idx.reshape(-1), C * P * P, dtype=jnp.bfloat16)
        cov = jnp.dot(
            oh, flatb.astype(jnp.bfloat16), preferred_element_type=jnp.float32
        )
    else:
        cov = jnp.take(flatb, idx.reshape(-1), axis=0)
    cov = cov.reshape(N, G, win, win)
    if composite == "matmul":
        return _composite_matmul(
            cov, o0[..., 0].astype(jnp.int32), o0[..., 1].astype(jnp.int32),
            valid, lay,
        )
    px, py, u, v = _window_geometry(oq, lay)
    return _composite(cov, px, py, u, v, valid, lay)


@partial(jax.jit, static_argnames=("cfg", "lay", "supersample"))
def compose_baked(
    baked,
    char_ids,
    origins,
    valid,
    cfg: siren.SirenConfig,
    lay: ImplicitLayout,
    supersample: int = 4,
):
    """Fast neural composition: bilinear-sample a pre-baked SIREN bank.

    :func:`compose` re-evaluates the glyph MLP at every window pixel of
    every placed glyph — ~5*hidden sin() transcendentals per pixel, which
    round 2 measured as VPU-bound at ~45k glyphs/sec. This variant
    evaluates the bank ONCE per bake (:func:`bake_bank`, 95 glyphs at
    ``supersample``x cell resolution) and turns per-instance evaluation
    into a 4-tap bilinear gather at each window pixel's exact subpixel
    phase. The only approximation is bilinear resampling of a smooth
    coverage field (the placement/compositing geometry is IDENTICAL —
    same windows, same scatter); the measured quality delta at ss=4 on
    the committed artifacts rides in RESULTS.md. The reference has no
    neural-render counterpart (its atlas is the TTF rasterizer's,
    generate_font.ts:29-60); this is the TPU answer to making the
    all-neural path serve at production rates: MLP eval amortizes to
    O(charset), per-glyph cost becomes pure HBM gathers.
    """
    N, G = char_ids.shape
    cs = baked.shape[-1]
    px, py, u, v = _window_geometry(origins, lay)
    # Fractional baked-grid indices: baked pixel i holds the field at
    # coordinate ((i + 0.5) / cs) * 2 - 1 (siren.grid_coords).
    fx = (u + 1.0) * 0.5 * cs - 0.5
    fy = (v + 1.0) * 0.5 * cs - 0.5
    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, cs - 2)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, cs - 2)
    wx = jnp.clip(fx - x0, 0.0, 1.0)
    wy = jnp.clip(fy - y0, 0.0, 1.0)
    c = char_ids[..., None, None]
    v00 = baked[c, y0, x0]
    v01 = baked[c, y0, x0 + 1]
    v10 = baked[c, y0 + 1, x0]
    v11 = baked[c, y0 + 1, x0 + 1]
    cov = (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )
    return _composite(cov, px, py, u, v, valid, lay)


def render_implicit_sheets(
    params: dict,
    strings: list[str],
    font_path: str,
    cfg: siren.SirenConfig,
    spec: SheetSpec = SheetSpec(),
    scale: float = 1.0,
    charset: str = PRINTABLE_ASCII,
    kerned: bool = True,
    baked: int = 0,
    phased: int = 0,
) -> np.ndarray:
    """Strings -> [N, H*scale, W*scale] sheets from the implicit glyph bank.

    Kerned by default when the font carries pairs (Montserrat), matching
    the bitmap engine; ``kerned=False`` reproduces the pre-fix unkerned
    layout (the round-3 oracle rows were measured that way, RESULTS.md).
    ``baked=SS`` uses the amortized fast path (:func:`compose_baked` over
    a once-baked SS-supersampled bank) instead of exact per-window eval.
    """
    font = TrueTypeFont.load(font_path)
    lay = build_layout(font, spec, cfg.cell, scale=scale)
    kern = font_kerning(font_path, charset, spec) if kerned else None
    ids, origins, valid = place_glyphs(strings, font, lay, spec, charset, kern)
    if phased:
        bank = bake_bank_phased(params, cfg, lay, phases=phased)
        return np.asarray(
            compose_phased(
                bank, jnp.asarray(ids), jnp.asarray(origins),
                jnp.asarray(valid), cfg, lay, phased, composite="matmul",
            )
        )
    if baked:
        bank = bake_bank(params, cfg, supersample=baked)
        return np.asarray(
            compose_baked(
                bank, jnp.asarray(ids), jnp.asarray(origins),
                jnp.asarray(valid), cfg, lay, baked,
            )
        )
    return np.asarray(
        compose(
            params,
            jnp.asarray(ids),
            jnp.asarray(origins),
            jnp.asarray(valid),
            cfg,
            lay,
        )
    )
