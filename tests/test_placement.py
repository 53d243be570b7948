"""Learned glyph placement (models/placement.py): targets, training, render.

The placement transformer replaces the layout ENGINE in the implicit
hybrid: per-character-slot (midpoint x, baseline y, visibility) predicted
from raw char codes. Targets must agree exactly with the engine's own
glyph placements (implicit_sheet.place_glyphs), training must learn them,
and the fully neural render path must compose without a layout engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_font_renderer_tpu.config import FIRACODE_PATH, ModelConfig, SheetSpec
from ai_font_renderer_tpu.fontgen.layout import AdvanceTable, encode_codes
from ai_font_renderer_tpu.fontgen.ttf import TrueTypeFont
from ai_font_renderer_tpu.models import placement
from ai_font_renderer_tpu.render.implicit_sheet import (
    build_layout,
    origins_from_midpoints,
    place_glyphs,
)

CHARSET = " ABCDEFGHIJKLMNOPQRSTUVWXYZ"

QUIRKY = [
    "HELLO WORLD",
    "A  B",  # consecutive spaces: empty token extends the line
    "   ",  # all spaces: zero lines, nothing placed
    "  LEADING",  # leading empties vanish from the line
    "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG AGAIN AND AGAIN UNTIL IT WRAPS",
    "A?B",  # unknown char advances like a space, places nothing
    "W" * 45,  # single unbreakable overlong word
]


def _table(font, spec):
    adv = np.array(
        [
            font.advance(font.glyph_id(ord(c))) * spec.font_size / font.units_per_em
            for c in CHARSET
        ]
    )
    return AdvanceTable(CHARSET, adv)


def test_targets_match_engine_placements():
    """placement_targets' visible slots, in reading order, must reproduce
    place_glyphs' glyph stream exactly (ids via the chars, positions via
    the midpoint->origin transform)."""
    font = TrueTypeFont.load(FIRACODE_PATH)
    spec = SheetSpec()
    lay = build_layout(font, spec, cell=32)
    table = _table(font, spec)

    ids_e, origins_e, valid_e = place_glyphs(QUIRKY, font, lay, spec, CHARSET)
    mids, vis = placement.placement_targets(QUIRKY, table, spec)
    for si, s in enumerate(QUIRKY):
        n_engine = int(valid_e[si].sum())
        slots = np.nonzero(vis[si])[0]
        assert len(slots) == n_engine, s
        # Slot chars match the engine's glyph ids, in order.
        got_ids = [CHARSET.index(s[i]) for i in slots]
        assert got_ids == list(ids_e[si, :n_engine]), s
        # Positions match through the shared geometry transform.
        got_origins = origins_from_midpoints(mids[si, slots], lay)
        np.testing.assert_allclose(
            got_origins, origins_e[si, :n_engine], atol=1e-4, err_msg=s
        )


def test_targets_respect_max_glyphs_cap():
    font = TrueTypeFont.load(FIRACODE_PATH)
    spec = SheetSpec()
    table = _table(font, spec)
    mids, vis = placement.placement_targets(["ABCDEF"], table, spec, max_glyphs=4)
    assert vis[0].sum() == 4


def test_loss_decreases_and_learns_positions():
    """A small placement model fits a tiny corpus: position error falls
    well under a pixel on the training strings."""
    import optax

    spec = SheetSpec(width=96, height=48, max_chars=16)
    pcfg = ModelConfig(max_length=16, sheet_height=48, sheet_width=96)
    font = TrueTypeFont.load(FIRACODE_PATH)
    table = _table(font, spec)
    strings = ["AB CD", "HELLO", "WRAP ME NOW", "XY", "Q Q Q", "NOSPACES"]
    codes = jnp.asarray(encode_codes(strings, spec.max_chars))
    mids, vis = placement.placement_targets(strings, table, spec)
    mids, vis = jnp.asarray(mids), jnp.asarray(vis)

    params = placement.init(jax.random.PRNGKey(0), pcfg)
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(placement.loss_fn)(
            params, codes, mids, vis, pcfg, train=False
        )
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    first = None
    for i in range(600):
        params, opt_state, loss = step(params, opt_state)
        if first is None:
            first = float(loss)
    assert float(loss) < 0.1 * first

    pred_xy, logit = placement.apply(params, codes, pcfg, train=False)
    err = jnp.sqrt(jnp.sum((pred_xy - mids) ** 2, -1))
    max_err = float(jnp.max(jnp.where(vis, err, 0.0)))
    assert max_err < 2.0, f"worst visible-slot position error {max_err:.2f} px"
    acc = jnp.mean(((jax.nn.sigmoid(logit) > 0.5) == vis).astype(jnp.float32))
    assert float(acc) > 0.95


def test_line_head_shapes_and_decode():
    """init(lines=L) carries the head mode in the weight shape; apply
    decodes y as the line-distribution expectation, so a confident logit
    lands exactly on (l+1) * line_height."""
    pcfg = ModelConfig(max_length=16, sheet_height=48, sheet_width=96)
    params = placement.init(jax.random.PRNGKey(0), pcfg, lines=3)
    assert params["place_w"].shape == (pcfg.hidden_dim, 5)
    assert placement.head_lines(params) == 3
    assert placement.head_lines(placement.init(jax.random.PRNGKey(0), pcfg)) == 0
    with pytest.raises(ValueError):
        placement.init(jax.random.PRNGKey(0), pcfg, lines=1)

    # Saturate the line-2 logit via the head bias: y must decode to the
    # second baseline for every slot regardless of the input.
    params["place_b"] = params["place_b"].at[3].set(50.0)
    codes = jnp.asarray(encode_codes(["AB CD"], 16))
    xy, _ = placement.apply(params, codes, pcfg, train=False)
    lh = SheetSpec().line_height
    np.testing.assert_allclose(np.asarray(xy[0, :, 1]), 2 * lh, rtol=1e-5)

    ll = placement.line_logits(params, codes, pcfg, train=False)
    assert ll.shape == (1, 16, 3)
    with pytest.raises(ValueError):
        placement.line_logits(
            placement.init(jax.random.PRNGKey(0), pcfg), codes, pcfg
        )


def test_line_head_learns_breaks():
    """The line-classification head fits a tiny wrapping corpus: every
    visible slot's argmax line matches the engine's, and decoded y lands
    within a pixel of the target baseline."""
    import optax

    spec = SheetSpec(width=96, height=48, max_chars=16)
    pcfg = ModelConfig(max_length=16, sheet_height=48, sheet_width=96)
    font = TrueTypeFont.load(FIRACODE_PATH)
    table = _table(font, spec)
    strings = ["AB CD", "HELLO", "WRAP ME NOW", "XY", "Q Q Q", "NOSPACES"]
    codes = jnp.asarray(encode_codes(strings, spec.max_chars))
    mids, vis = placement.placement_targets(strings, table, spec)
    mids, vis = jnp.asarray(mids), jnp.asarray(vis)

    L = 3
    params = placement.init(jax.random.PRNGKey(0), pcfg, lines=L)
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(placement.loss_fn)(
            params, codes, mids, vis, pcfg, train=False
        )
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    first = None
    for _ in range(600):
        params, opt_state, loss = step(params, opt_state)
        if first is None:
            first = float(loss)
    assert float(loss) < 0.1 * first

    lh = SheetSpec().line_height
    ll = placement.line_logits(params, codes, pcfg, train=False)
    tgt = jnp.clip(jnp.round(mids[..., 1] / lh).astype(jnp.int32) - 1, 0, L - 1)
    line_acc = float(
        jnp.sum((jnp.argmax(ll, -1) == tgt) * vis) / jnp.maximum(vis.sum(), 1)
    )
    assert line_acc == 1.0, f"line accuracy {line_acc}"

    pred_xy, _ = placement.apply(params, codes, pcfg, train=False)
    y_err = float(jnp.max(jnp.where(vis, jnp.abs(pred_xy[..., 1] - mids[..., 1]), 0.0)))
    assert y_err < 1.0, f"worst decoded-y error {y_err:.2f} px"


def test_render_learned_sheets_composes():
    """Fully neural path runs end-to-end with untrained params: correct
    shapes, values in [0, 1], and no layout engine involvement."""
    from ai_font_renderer_tpu.models import siren
    from ai_font_renderer_tpu.render.implicit_sheet import render_learned_sheets

    pcfg = ModelConfig(max_length=16, sheet_height=48, sheet_width=96)
    spec = SheetSpec(width=96, height=48, max_chars=16)
    scfg = siren.SirenConfig(n_chars=len(CHARSET), cell=16, hidden_dim=16, n_layers=2)
    sp = siren.init(jax.random.PRNGKey(0), scfg)
    for lines in (0, 4):  # regression head and line-classification head:
        # the npz/render contract is head-mode-agnostic (shape-carried)
        pp = placement.init(jax.random.PRNGKey(1), pcfg, lines=lines)
        sheets = render_learned_sheets(
            sp, pp, ["AB", "HELLO X"], FIRACODE_PATH, scfg, pcfg, spec, charset=CHARSET
        )
        assert sheets.shape == (2, 48, 96)
        assert sheets.min() >= 0.0 and sheets.max() <= 1.0


def test_pixel_gradients_flow_through_composition():
    """End-to-end differentiability: sheet-MSE gradients reach the
    placement params through compose() (coords enter the SIREN input as
    (px - origin)/r, so d sheet / d origin is well-defined a.e.) — the
    property the pixel fine-tune phase (tools/train_placement.py) uses."""
    import jax.numpy as jnp

    from ai_font_renderer_tpu.fontgen.ttf import TrueTypeFont
    from ai_font_renderer_tpu.models import siren
    from ai_font_renderer_tpu.render.implicit_sheet import (
        build_layout,
        compose,
    )

    spec = SheetSpec(width=96, height=48, max_chars=16)
    pcfg = ModelConfig(max_length=16, sheet_height=48, sheet_width=96)
    scfg = siren.SirenConfig(n_chars=len(CHARSET), cell=16, hidden_dim=16, n_layers=2)
    sp = siren.init(jax.random.PRNGKey(0), scfg)
    params = placement.init(jax.random.PRNGKey(1), pcfg)
    lay = build_layout(
        TrueTypeFont.load(FIRACODE_PATH), spec, scfg.cell, max_glyphs=16
    )
    codes = jnp.asarray(encode_codes(["AB CD"], 16))
    ids = jnp.asarray([[1, 2, 0, 3, 4] + [0] * 11])
    valid = jnp.asarray([[True, True, False, True, True] + [False] * 11])

    def pixel_loss(p):
        xy, _ = placement.apply(p, codes, pcfg, train=False)
        origins = origins_from_midpoints(xy, lay)
        return jnp.mean(compose(sp, ids, origins, valid, scfg, lay) ** 2)

    grads = jax.grad(pixel_loss)(params)
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert gnorm > 0.0
