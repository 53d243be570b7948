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


def _ascii_tables(table, kerned=False):
    """ASCII-indexed [128] advance / [128,128] kern tables from an
    AdvanceTable (what tools/train_placement.py builds for --structured)."""
    adv128 = np.full(128, table.advances_px[0], np.float32)
    for i, c in enumerate(table.charset):
        adv128[ord(c)] = table.advances_px[i]
    kern128 = np.zeros((128, 128), np.float32)
    if kerned:
        for a in table.charset:
            for b in table.charset:
                k = table.kern(a, b)
                if k:
                    kern128[ord(a), ord(b)] = k
    return adv128, kern128


def test_structured_head_shapes_and_contract():
    """init(advances=...) carries the structured mode in the params
    themselves (place_adv present; place_w has 3+L columns); invalid
    combinations fail loudly."""
    pcfg = ModelConfig(max_length=16, sheet_height=48, sheet_width=96)
    adv = np.full(128, 7.0, np.float32)
    params = placement.init(jax.random.PRNGKey(0), pcfg, lines=4, advances=adv)
    assert placement.head_structured(params)
    assert placement.head_lines(params) == 4
    assert params["place_w"].shape == (pcfg.hidden_dim, 7)
    assert params["place_kern"].shape == (128, 128)
    assert not placement.head_structured(
        placement.init(jax.random.PRNGKey(0), pcfg, lines=4)
    )
    with pytest.raises(ValueError):  # structured requires a line head
        placement.init(jax.random.PRNGKey(0), pcfg, advances=adv)
    with pytest.raises(ValueError):  # advances must be ASCII-indexed [128]
        placement.init(
            jax.random.PRNGKey(0), pcfg, lines=4, advances=np.ones(27)
        )
    # line_logits honors the structured column offset.
    codes = jnp.asarray(encode_codes(["AB CD"], 16))
    assert placement.line_logits(params, codes, pcfg).shape == (1, 16, 4)
    # The structured loss refuses to run without structural targets.
    mids = jnp.zeros((1, 16, 2))
    vis = jnp.zeros((1, 16), bool)
    with pytest.raises(ValueError):
        placement.loss_fn(params, codes, mids, vis, pcfg, train=False)


def test_structured_x_oracle_matches_engine():
    """With oracle (saturated) line/contribution logits and zero residual,
    structured_x reproduces the engine's pen walk exactly — including the
    no-kern-across-breaks boundary and pair kerning."""

    class FakeKern:  # minimal KerningTable stand-in: one negative pair
        def get(self, a, b):
            return -1.5 if (a, b) == ("A", "B") else 0.0

        def __len__(self):
            return 1

    font = TrueTypeFont.load(FIRACODE_PATH)
    spec = SheetSpec()
    adv = np.array(
        [
            font.advance(font.glyph_id(ord(c))) * spec.font_size / font.units_per_em
            for c in CHARSET
        ]
    )
    table = AdvanceTable(CHARSET, adv, kerning=FakeKern())
    strings = QUIRKY + ["ABAB ABAB", "AB " * 20]  # kern pairs + wraps
    mids, vis, line_idx, contrib = placement.placement_targets(
        strings, table, spec, full=True
    )
    assert contrib[vis].all()  # every visible slot contributes
    # Visible slots sit exactly on their line's baseline.
    lh = spec.line_height
    got = mids[..., 1][vis]
    want = (line_idx[vis] + 1) * lh
    np.testing.assert_allclose(got, want, atol=1e-4)

    L = 8
    n, S = len(strings), spec.max_chars
    ll = np.full((n, S, L), -30.0, np.float32)
    for i in range(n):
        for s in range(S):
            ll[i, s, min(line_idx[i, s], L - 1)] = 30.0
    cl = np.where(contrib, 30.0, -30.0).astype(np.float32)
    adv128, kern128 = _ascii_tables(table, kerned=True)
    assert kern128[ord("A"), ord("B")] == -1.5
    params = {
        "place_adv": jnp.asarray(adv128),
        "place_kern": jnp.asarray(kern128),
    }
    codes = jnp.asarray(encode_codes(strings, S))
    x = np.asarray(
        placement.structured_x(
            params, codes, jnp.asarray(cl), jnp.asarray(ll), spec
        )
    )
    err = np.abs(x - mids[..., 0])[vis]
    assert err.max() < 1e-3, f"max oracle-decode x error {err.max()} px"
    # The discrete decode agrees at saturated logits (argmax == softmax).
    x_hard = np.asarray(
        placement.structured_x(
            params, codes, jnp.asarray(cl), jnp.asarray(ll), spec, hard=True
        )
    )
    np.testing.assert_allclose(x_hard, x, atol=1e-3)


def test_hard_decode_snaps_hedged_structure():
    """hard=True is the pen walk of the DISCRETE predicted structure: a
    hedged 50/50 line distribution leaks half an advance into the soft x
    (the measured failure mode of the coupled structured runs), while the
    hard decode commits to the argmax line; a sub-threshold contribution
    is dropped entirely instead of fractionally."""
    spec = SheetSpec()
    P = float(spec.padding)
    adv = np.zeros(128, np.float32)
    adv[ord("A")], adv[ord("B")] = 10.0, 12.0
    params = {
        "place_adv": jnp.asarray(adv),
        "place_kern": jnp.zeros((128, 128), jnp.float32),
    }
    codes = jnp.asarray(encode_codes(["AB"], 2))
    ll = jnp.zeros((1, 2, 2))  # 50/50 over two lines; argmax -> line 0
    cl = jnp.full((1, 2), 30.0)
    x_soft = np.asarray(placement.structured_x(params, codes, cl, ll, spec))
    x_hard = np.asarray(
        placement.structured_x(params, codes, cl, ll, spec, hard=True)
    )
    # Slot 1 (B): soft same-line(A,B) = 0.5 -> half of A's advance leaks.
    np.testing.assert_allclose(x_soft[0], [P + 5.0, P + 0.5 * 10 + 6.0], atol=1e-4)
    np.testing.assert_allclose(x_hard[0], [P + 5.0, P + 10.0 + 6.0], atol=1e-4)
    # A sub-threshold contribution (sigmoid ~0.27): soft leaks 0.27*adv,
    # hard contributes nothing.
    cl_weak = jnp.asarray([[-1.0, 30.0]])
    x_soft_w = np.asarray(placement.structured_x(params, codes, cl_weak, ll, spec))
    x_hard_w = np.asarray(
        placement.structured_x(params, codes, cl_weak, ll, spec, hard=True)
    )
    assert P + 6.0 < x_soft_w[0, 1] < P + 11.0
    np.testing.assert_allclose(x_hard_w[0, 1], P + 6.0, atol=1e-4)


def test_apply_hard_snaps_y_to_legal_baselines():
    """apply(hard=True) lands every y exactly on some (l+1)*line_height
    for both line-aware heads, and agrees with the soft decode once the
    logits saturate."""
    pcfg = ModelConfig(max_length=16, sheet_height=48, sheet_width=96)
    codes = jnp.asarray(encode_codes(["AB CD"], 16))
    lh = SheetSpec().line_height
    legal = (np.arange(3) + 1.0) * lh
    adv = np.zeros(128, np.float32)
    adv[ord("A") : ord("Z") + 1] = 8.0
    for params in (
        placement.init(jax.random.PRNGKey(0), pcfg, lines=3),
        placement.init(jax.random.PRNGKey(0), pcfg, lines=3, advances=adv),
    ):
        xy_hard, logit = placement.apply(
            params, codes, pcfg, train=False, hard=True
        )
        y = np.asarray(xy_hard[0, :, 1])
        dist = np.abs(y[:, None] - legal[None, :]).min(axis=1)
        assert dist.max() < 1e-4, f"hard y off-baseline by {dist.max()} px"
        assert logit.shape == (1, 16)
    # Saturated logits: hard == soft (line head; bias drives line 2).
    params = placement.init(jax.random.PRNGKey(1), pcfg, lines=3)
    params["place_b"] = params["place_b"].at[4].set(50.0)
    xy_soft, _ = placement.apply(params, codes, pcfg, train=False)
    xy_hard, _ = placement.apply(params, codes, pcfg, train=False, hard=True)
    np.testing.assert_allclose(
        np.asarray(xy_hard), np.asarray(xy_soft), atol=1e-3
    )


def test_monotone_lines_viterbi():
    """The constrained decode repairs an isolated low-margin flip that
    per-slot argmax leaves in (the pinned worst-case failure), matches
    argmax when argmax is already monotone, and ignores zero-weight
    slots."""
    big = 10.0
    ll = np.full((1, 5, 3), -big, np.float32)
    for s, l in enumerate([0, 1, 0, 1, 2]):  # slot 2 flips back to 0
        ll[0, s, l] = big
    ll[0, 2] = [1.2, 1.0, -big]  # ...but only by a 0.2 margin
    got = np.asarray(placement.monotone_lines(jnp.asarray(ll)))
    np.testing.assert_array_equal(got[0], [0, 1, 1, 1, 2])

    mono = np.full((1, 5, 3), -big, np.float32)
    for s, l in enumerate([0, 0, 1, 2, 2]):
        mono[0, s, l] = big
    got = np.asarray(placement.monotone_lines(jnp.asarray(mono)))
    np.testing.assert_array_equal(got[0], [0, 0, 1, 2, 2])

    # A confidently-wrong slot with weight 0 (e.g. padding) cannot drag
    # the path; with weight 1 it would force every earlier slot down.
    noisy = mono.copy()
    noisy[0, 1] = [-big, -big, big]  # "line 2" at slot 1
    w = jnp.asarray([[1.0, 0.0, 1.0, 1.0, 1.0]])
    got = np.asarray(placement.monotone_lines(jnp.asarray(noisy), w))
    np.testing.assert_array_equal(got[0, [0, 2, 3, 4]], [0, 1, 2, 2])
    # (slot 1 itself may sit on line 0 or 1 — all such paths tie at
    # weight 0, and the start-at-0/step<=1 constraint forbids line 2.)

    # The path starts on line 0 regardless of slot 0's preference.
    start = mono.copy()
    start[0, 0] = [-1.0, 1.0, -big]
    got = np.asarray(placement.monotone_lines(jnp.asarray(start)))
    assert got[0, 0] == 0


def test_apply_monotone_decode():
    """apply(monotone=True): y is a legal baseline at every slot AND
    non-decreasing across slots (the engine's structural invariant),
    for both line-aware heads on a fresh net."""
    pcfg = ModelConfig(max_length=16, sheet_height=48, sheet_width=96)
    codes = jnp.asarray(encode_codes(["AB CD EF GH"], 16))
    lh = SheetSpec().line_height
    legal = (np.arange(3) + 1.0) * lh
    adv = np.zeros(128, np.float32)
    adv[ord("A") : ord("Z") + 1] = 8.0
    for params in (
        placement.init(jax.random.PRNGKey(3), pcfg, lines=3),
        placement.init(jax.random.PRNGKey(3), pcfg, lines=3, advances=adv),
    ):
        xy, _ = placement.apply(params, codes, pcfg, train=False, monotone=True)
        y = np.asarray(xy[0, :, 1])
        dist = np.abs(y[:, None] - legal[None, :]).min(axis=1)
        assert dist.max() < 1e-3
        assert (np.diff(y) >= -1e-3).all(), f"y not monotone: {y}"


def test_structured_head_learns():
    """The structured head fits a tiny wrapping corpus: the derived x
    lands within a pixel on every visible slot and line/contribution
    decisions match the engine exactly."""
    import optax

    spec = SheetSpec(width=96, height=48, max_chars=16)
    pcfg = ModelConfig(max_length=16, sheet_height=48, sheet_width=96)
    font = TrueTypeFont.load(FIRACODE_PATH)
    table = _table(font, spec)
    strings = ["AB CD", "HELLO", "WRAP ME NOW", "XY", "Q Q Q", "NOSPACES"]
    codes = jnp.asarray(encode_codes(strings, spec.max_chars))
    mids, vis, line_idx, contrib = placement.placement_targets(
        strings, table, spec, full=True
    )
    mids, vis = jnp.asarray(mids), jnp.asarray(vis)
    lt, ct = jnp.asarray(line_idx), jnp.asarray(contrib)

    L = 3
    adv128, kern128 = _ascii_tables(table)
    params = placement.init(
        jax.random.PRNGKey(0), pcfg, lines=L, advances=adv128, kerning=kern128
    )
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        loss, grads = jax.value_and_grad(placement.loss_fn)(
            params, codes, mids, vis, pcfg, train=False, line_tgt=lt, contrib_tgt=ct
        )
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    first = None
    for _ in range(600):
        params, opt_state, loss = step(params, opt_state)
        if first is None:
            first = float(loss)
    assert float(loss) < 0.1 * first

    ll = placement.line_logits(params, codes, pcfg, train=False)
    tgt = jnp.clip(lt, 0, L - 1)
    line_acc = float(
        jnp.sum((jnp.argmax(ll, -1) == tgt) * ct) / jnp.maximum(ct.sum(), 1)
    )
    assert line_acc == 1.0, f"line accuracy {line_acc}"

    pred_xy, _ = placement.apply(params, codes, pcfg, train=False)
    x_err = float(
        jnp.max(jnp.where(vis, jnp.abs(pred_xy[..., 0] - mids[..., 0]), 0.0))
    )
    assert x_err < 1.5, f"worst derived-x error {x_err:.2f} px"


def test_structured_npz_roundtrip_and_compose():
    """A structured checkpoint is self-contained: the npz round-trips the
    advance/kern tables, the loaded params keep their head mode, and the
    fully neural render path composes from them unchanged."""
    from ai_font_renderer_tpu.models import siren
    from ai_font_renderer_tpu.render.implicit_sheet import render_learned_sheets
    from ai_font_renderer_tpu.utils.checkpoint import load_params, save_params

    pcfg = ModelConfig(max_length=16, sheet_height=48, sheet_width=96)
    spec = SheetSpec(width=96, height=48, max_chars=16)
    adv = np.full(128, 6.0, np.float32)
    pp = placement.init(jax.random.PRNGKey(1), pcfg, lines=4, advances=adv)
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "p.npz")
        save_params(pp, path, mcfg=pcfg)
        loaded = load_params(path)
    assert placement.head_structured(loaded)
    assert placement.head_lines(loaded) == 4
    np.testing.assert_array_equal(np.asarray(loaded["place_adv"]), adv)

    scfg = siren.SirenConfig(n_chars=len(CHARSET), cell=16, hidden_dim=16, n_layers=2)
    sp = siren.init(jax.random.PRNGKey(0), scfg)
    sheets = render_learned_sheets(
        sp, loaded, ["AB", "HELLO X"], FIRACODE_PATH, scfg, pcfg, spec, charset=CHARSET
    )
    assert sheets.shape == (2, 48, 96)
    assert sheets.min() >= 0.0 and sheets.max() <= 1.0


def test_structured_detach_blocks_structure_gradients():
    """detach=True: structured_x values are identical but gradients stop
    at the structure logits (line/contribution) — the x MSE can no longer
    hedge the line distributions; adv/kern/residual still train."""
    adv = np.full(128, 6.0, np.float32)
    params = {
        "place_adv": jnp.asarray(adv),
        "place_kern": jnp.zeros((128, 128)),
    }
    codes = jnp.asarray(encode_codes(["AB CD"], 16))
    key = jax.random.PRNGKey(0)
    ll = jax.random.normal(key, (1, 16, 3))
    cl = jax.random.normal(jax.random.PRNGKey(1), (1, 16))

    x_soft = placement.structured_x(params, codes, cl, ll)
    x_det = placement.structured_x(params, codes, cl, ll, detach=True)
    np.testing.assert_allclose(np.asarray(x_soft), np.asarray(x_det), rtol=1e-6)

    def total(logits, detach):
        return jnp.sum(placement.structured_x(params, codes, cl, logits, detach=detach))

    g_soft = jax.grad(total)(ll, False)
    g_det = jax.grad(total)(ll, True)
    assert float(jnp.abs(g_soft).sum()) > 0.0
    assert float(jnp.abs(g_det).sum()) == 0.0
    # The advance table still receives x gradients under detach.
    g_adv = jax.grad(
        lambda a: jnp.sum(
            placement.structured_x(
                {"place_adv": a, "place_kern": params["place_kern"]},
                codes, cl, ll, detach=True,
            )
        )
    )(params["place_adv"])
    assert float(jnp.abs(g_adv).sum()) > 0.0


def test_placement_target_margins():
    """margins=True: each word tested against a non-empty line carries its
    decision's |measure - usable width| on its slots and its separator
    space; slots whose placement involved no contested decision (first
    word of a string, words opening a fresh line after a break) stay
    +inf. Composes with full=True (margins ride last)."""
    font = TrueTypeFont.load(FIRACODE_PATH)
    spec = SheetSpec()
    table = _table(font, spec)
    long_a, tail_b = "A" * 25, "B" * 8
    strings = ["HELLO WORLD", f"{long_a} {tail_b}"]
    mids, vis, margin = placement.placement_targets(
        strings, table, spec, margins=True
    )
    max_w = spec.width - 2 * spec.padding

    # First words: no accept/reject decision was taken against them.
    assert np.isinf(margin[0, :5]).all()
    assert np.isinf(margin[1, : len(long_a)]).all()
    # Accepted word: "WORLD" was tested as "HELLO WORLD" (fits) -- its
    # slots and the separator space carry the slack margin.
    m_acc = max_w - table.measure("HELLO WORLD")
    assert 0 < m_acc
    np.testing.assert_allclose(margin[0, 5:11], m_acc, atol=1e-4)
    # Rejected word: the 25+8 candidate overflows, breaking the line --
    # the tail word's slots carry the overflow margin.
    cand = f"{long_a} {tail_b}"
    m_rej = table.measure(cand) - max_w
    assert 0 < m_rej
    np.testing.assert_allclose(
        margin[1, len(long_a) : len(cand)], m_rej, atol=1e-4
    )

    # full=True keeps the (line, contrib) pair in place, margins last.
    out = placement.placement_targets(
        strings, table, spec, full=True, margins=True
    )
    assert len(out) == 5
    np.testing.assert_array_equal(out[4], margin)
    np.testing.assert_array_equal(out[1], vis)


def test_ce_weights_identity_and_emphasis():
    """loss_fn(ce_w=ones) must equal the unweighted loss bit-for-bit on
    both CE heads (weighted mean normalization), and non-uniform weights
    must actually change the loss."""
    font = TrueTypeFont.load(FIRACODE_PATH)
    spec = SheetSpec()
    table = _table(font, spec)
    strings = ["HELLO WORLD", "AB " * 12]
    mids, vis, line_t, contrib, margin = placement.placement_targets(
        strings, table, spec, full=True, margins=True
    )
    codes = jnp.asarray(encode_codes(strings, spec.max_chars))
    mids_j, vis_j = jnp.asarray(mids), jnp.asarray(vis)
    lt, ct = jnp.asarray(line_t), jnp.asarray(contrib)
    cfg = ModelConfig()
    ones = jnp.ones(vis.shape, jnp.float32)
    boosted = jnp.asarray(
        1.0 + 2.0 * (margin < 24.0).astype(np.float32)
    )
    assert float(boosted.max()) == 3.0  # the boost actually selects slots

    # Line-classification head.
    p_line = placement.init(jax.random.PRNGKey(0), cfg, lines=5)
    base = placement.loss_fn(
        p_line, codes, mids_j, vis_j, cfg, train=False
    )
    same = placement.loss_fn(
        p_line, codes, mids_j, vis_j, cfg, train=False, ce_w=ones
    )
    assert float(base) == float(same)
    diff = placement.loss_fn(
        p_line, codes, mids_j, vis_j, cfg, train=False, ce_w=boosted
    )
    assert float(diff) != float(base)

    # Structured head.
    adv128, kern128 = _ascii_tables(table)
    p_s = placement.init(
        jax.random.PRNGKey(1), cfg, lines=5, advances=adv128, kerning=kern128
    )
    base_s = placement.loss_fn(
        p_s, codes, mids_j, vis_j, cfg, train=False, line_tgt=lt,
        contrib_tgt=ct,
    )
    same_s = placement.loss_fn(
        p_s, codes, mids_j, vis_j, cfg, train=False, line_tgt=lt,
        contrib_tgt=ct, ce_w=ones,
    )
    assert float(base_s) == float(same_s)
    diff_s = placement.loss_fn(
        p_s, codes, mids_j, vis_j, cfg, train=False, line_tgt=lt,
        contrib_tgt=ct, ce_w=boosted,
    )
    assert float(diff_s) != float(base_s)


def test_uncertainty_weighted_loss():
    """init(uncertainty=True) adds loss_logvar; at s=0 the combined loss
    equals the fixed-weight loss exactly, gradients flow into s, and a
    nonzero s changes the loss (exp(-s)*L + s combination)."""
    font = TrueTypeFont.load(FIRACODE_PATH)
    spec = SheetSpec()
    table = _table(font, spec)
    strings = ["HELLO WORLD", "AB " * 12]
    mids, vis, line_t, contrib = placement.placement_targets(
        strings, table, spec, full=True
    )
    codes = jnp.asarray(encode_codes(strings, spec.max_chars))
    mids_j, vis_j = jnp.asarray(mids), jnp.asarray(vis)
    lt, ct = jnp.asarray(line_t), jnp.asarray(contrib)
    cfg = ModelConfig()
    adv128, kern128 = _ascii_tables(table)
    p_u = placement.init(
        jax.random.PRNGKey(1), cfg, lines=5, advances=adv128,
        kerning=kern128, uncertainty=True,
    )
    assert p_u["loss_logvar"].shape == (4,)
    p_fixed = {k: v for k, v in p_u.items() if k != "loss_logvar"}

    def loss(p):
        return placement.loss_fn(
            p, codes, mids_j, vis_j, cfg, train=False, line_tgt=lt,
            contrib_tgt=ct,
        )

    assert float(loss(p_u)) == float(loss(p_fixed))  # s=0 reproduces
    g = jax.grad(loss)(p_u)["loss_logvar"]
    # dL/ds_i = -exp(-s_i)*L_i + 1 = 1 - L_i at s=0: nonzero for every
    # term whose raw value isn't exactly 1.
    assert float(jnp.abs(g).sum()) > 0.0
    p_s = dict(p_u, loss_logvar=jnp.array([1.0, -1.0, 0.5, 0.0]))
    assert float(loss(p_s)) != float(loss(p_u))
    # Regression head composes too (terms 0 and 3 only).
    p_reg = placement.init(jax.random.PRNGKey(2), cfg, uncertainty=True)

    def loss_reg(p):
        return placement.loss_fn(p, codes, mids_j, vis_j, cfg, train=False)

    p_reg_fixed = {k: v for k, v in p_reg.items() if k != "loss_logvar"}
    assert float(loss_reg(p_reg)) == float(loss_reg(p_reg_fixed))


class TestFinetuneResume:
    """tools/train_placement.py --ft-checkpoint-every / --ft-resume: an
    interrupted pixel fine-tune resumed from its checkpoint must reproduce
    the uninterrupted run bit-exactly (the batch schedule and LR schedule
    are pure functions of the step index)."""

    @staticmethod
    def _run(tmp_path, out_name, extra):
        import os
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ)
        env["PYTHONPATH"] = repo
        env["JAX_PLATFORMS"] = "cpu"
        cmd = [
            sys.executable,
            os.path.join(repo, "tools", "train_placement.py"),
            "--font", "firacode", "--samples", "120", "--epochs", "0",
            "--init-from", str(tmp_path / "seed.npz"),
            "--siren-from", str(tmp_path / "bank.npz"),
            "--finetune-samples", "64",
            "--out", str(tmp_path / out_name),
        ] + extra
        res = subprocess.run(
            cmd, env=env, cwd=repo, capture_output=True, text=True,
            timeout=600,
        )
        assert res.returncode == 0, res.stderr[-3000:]
        return res.stdout

    def test_resume_reproduces_uninterrupted_run(self, tmp_path):
        from ai_font_renderer_tpu.config import PRINTABLE_ASCII
        from ai_font_renderer_tpu.models import siren
        from ai_font_renderer_tpu.utils.checkpoint import (
            save_params,
            save_siren,
        )

        cfg = ModelConfig()
        seed = placement.init(jax.random.PRNGKey(0), cfg, lines=5)
        save_params(seed, str(tmp_path / "seed.npz"), mcfg=cfg)
        scfg = siren.SirenConfig(
            n_chars=len(PRINTABLE_ASCII), cell=16, embed_dim=8,
            hidden_dim=16, n_layers=2,
        )
        save_siren(
            siren.init(jax.random.PRNGKey(1), scfg), scfg, PRINTABLE_ASCII,
            str(tmp_path / "bank.npz"),
        )

        base = ["--line-head", "5"]
        # Straight run: 8 steps, no checkpointing.
        self._run(
            tmp_path, "straight",
            base + ["--finetune-steps", "8", "--ft-checkpoint-every", "0"],
        )
        # Interrupted run: completes only 6 steps but checkpointed at 4...
        self._run(
            tmp_path, "resumed",
            base + ["--finetune-steps", "6", "--ft-checkpoint-every", "4"],
        )
        # ...then resumes AT STEP 4 (the latest checkpoint) and replays
        # 5..8 — the same trajectory the straight run took.
        out = self._run(
            tmp_path, "resumed",
            base + [
                "--finetune-steps", "8", "--ft-checkpoint-every", "4",
                "--ft-resume",
            ],
        )
        assert "fine-tune resumed at step 4" in out

        a = np.load(tmp_path / "straight" / "placement_finetuned.npz")
        b = np.load(tmp_path / "resumed" / "placement_finetuned.npz")
        assert set(a.files) == set(b.files)
        for k in a.files:
            if k == "__config__":
                continue
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
