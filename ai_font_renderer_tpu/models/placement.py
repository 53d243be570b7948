"""Learned glyph placement: char codes -> per-slot glyph positions.

The implicit hybrid (render/implicit_sheet.py) composes a SIREN glyph bank
at positions computed by the layout ENGINE (greedy wrap + pen advance,
fontgen/layout.py — the reference hardcodes this in generate_font.ts:75-97
and has no learned-layout capability at all). This module learns that
mapping end-to-end instead: a placement transformer — the flagship
frontend stack (models/font_renderer.py:features) with a 3-unit per-slot
head — reads the raw char codes and emits, for every input character
slot, the glyph's advance-midpoint x, baseline y (base-scale sheet px)
and a visibility logit. Layout IS learnable by this architecture: a
glyph's x is the prefix sum of the preceding advance widths on its line,
exactly the running-sum structure attention + learned positions can
express — the same structure that made the proportional task defeat the
reference's per-(slot,pixel) linear dictionary (RESULTS.md, Montserrat).

Supervision comes from the engine itself (``placement_targets``): per
ORIGINAL character slot, mirroring wrap_text's semantics-exact quirks
(consecutive-space empty tokens, vanishing leading empties, the one
separator space consumed at each line break). Composed with the SIREN
bank, predicted placements render sheets with no layout engine in the
loop — characters to pixels, every stage neural.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, SheetSpec
from ..fontgen.layout import AdvanceTable
from . import font_renderer


def init(
    key: jax.Array,
    cfg: ModelConfig = ModelConfig(),
    *,
    lines: int = 0,
    advances: np.ndarray | None = None,
    kerning: np.ndarray | None = None,
    uncertainty: bool = False,
) -> dict:
    """Frontend params + a per-slot placement head.

    ``lines=0`` (default): the round-3 baseline head — 3 units per slot,
    (x, y, visibility), y regressed directly. ``lines=L`` (L >= 2): the
    line-classification head — 2 + L units, (x, visibility,
    line-logits[L]); y is *decoded* from the line distribution instead
    of regressed. Motivation (RESULTS.md "Learned glyph placement"): the
    long-budget runs pinned worst-case error at ~1 sheet width on both
    fonts — mispredicted line-break decisions displacing every later
    glyph by a full line — while average RMSE converged. A break is a
    discrete decision; classifying the line index turns that failure
    mode into a CE loss the transformer can actually optimize.

    ``advances`` (an ASCII-indexed [128] advance-px table; requires
    ``lines >= 2``): the STRUCTURED head — 3 + L units per slot,
    (x-residual, visibility, contribution, line-logits[L]). Instead of
    regressing x absolutely, x is *derived* the way the engine computes
    it: a prefix sum of the advances of the preceding contributing slots
    on the same (predicted) line, plus pair kerning (``kerning``, an
    ASCII-indexed [128, 128] px table), plus the learned residual — see
    :func:`structured_x`. Motivation (RESULTS.md line-head runs): the
    line head fixed y but left the worst-case pinned at ~1 sheet width
    because a wrong BREAK still displaces x by up to a line width when x
    is an absolute regression. Deriving x from the break structure turns
    that displacement into (a) a line-classification error the CE
    optimizes directly and (b) a one-advance-wide contribution error —
    both bounded, neither a silent sheet-width shift. The advance/kern
    tables ride in the checkpoint (``place_adv``/``place_kern``) so a
    structured npz is self-contained; they are trainable, initialized
    from the engine's metrics.

    ``uncertainty=True`` adds ``loss_logvar`` — one learned log-variance
    per loss term (x, line CE, contribution BCE, visibility BCE; the
    unused tail stays 0 for simpler heads). :func:`loss_fn` then
    combines terms as Σ exp(−s)·L + s (Kendall-style homoscedastic
    uncertainty weighting), initialized at s=0 so step 0 reproduces the
    fixed-weight loss exactly. Motivation (RESULTS.md queues 12-15):
    four measured A/Bs located the placement bottleneck in gradient
    COMPETITION among the terms on the shared trunk — this makes the
    trade-off itself a trained parameter instead of a hand weight.

    The head mode is carried by the weights themselves (shape of
    ``place_w``; presence of ``place_adv``), so saved checkpoints
    round-trip through the same npz contract with no config changes.
    """
    if lines == 1:
        raise ValueError("lines must be 0 (regression head) or >= 2")
    if advances is not None and lines < 2:
        raise ValueError("the structured head requires lines >= 2")
    k_front, k_head = jax.random.split(key)
    # Frontend-only init: same weights as font_renderer.init for this key,
    # without transiently materializing the ~0.5 GB sheet decoder.
    params = dict(font_renderer.init_frontend(k_front, cfg))
    h = cfg.hidden_dim
    if advances is not None:
        n_out = 3 + lines
        adv = np.asarray(advances, np.float32)
        if adv.shape != (128,):
            raise ValueError("advances must be an ASCII-indexed [128] table")
        params["place_adv"] = jnp.asarray(adv)
        kern = (
            np.zeros((128, 128), np.float32)
            if kerning is None
            else np.asarray(kerning, np.float32)
        )
        if kern.shape != (128, 128):
            raise ValueError("kerning must be an ASCII-indexed [128,128] table")
        params["place_kern"] = jnp.asarray(kern)
    else:
        n_out = 3 if lines == 0 else 2 + lines
    bound = 1.0 / h**0.5
    params["place_w"] = jax.random.uniform(
        k_head, (h, n_out), minval=-bound, maxval=bound
    )
    params["place_b"] = jnp.zeros((n_out,))
    if uncertainty:
        params["loss_logvar"] = jnp.zeros((4,))
    return params


def head_structured(params: dict) -> bool:
    """True for the structured (derived-x) head."""
    return "place_adv" in params


def head_lines(params: dict) -> int:
    """0 for the regression head, L for a line-aware head."""
    n = params["place_w"].shape[1]
    if head_structured(params):
        return n - 3
    return 0 if n == 3 else n - 2


@jax.jit
def _head(x, w, b):
    return x.astype(jnp.float32) @ w + b


def structured_x(
    params: dict,
    codes: jax.Array,
    contrib_logit: jax.Array,
    line_log: jax.Array,
    spec: SheetSpec = SheetSpec(),
    detach: bool = False,
    hard: bool = False,
) -> jax.Array:
    """Derive per-slot glyph-midpoint x from the predicted break structure.

    Differentiable mirror of the engine's pen walk
    (``placement_targets``): slot i's midpoint is

        padding + sum_{j<i, same line, contributing} advance_j
                + sum_{j<=i, same line, pair intra-line} kern(c_{j-1}, c_j)
                + advance_i / 2

    with "same line" soft (the inner product of the two slots' line
    distributions) and "contributing" soft (the contribution sigmoid), so
    gradients reach the line logits through x as well as through the CE.
    At peaked predictions this equals the engine's x exactly: within a
    line the engine's chars are consecutive original slots, and a line's
    first char has no intra-line predecessor — matching same(j-1, j) -> 0
    across a break. O(S^2) on S=100 slots: negligible.

    ``detach=True`` stops gradients at the structure probabilities (line
    softmax and contribution sigmoid): the x MSE then trains only the
    residual and the advance/kern tables, while the logits train purely
    from their CE/BCE supervision. Motivation (RESULTS.md structured-head
    runs): with coupled gradients the x MSE prefers HEDGED line
    distributions (soft probabilities interpolate x across the break),
    dragging line accuracy down (0.966 -> 0.840 on Montserrat) and the
    end-to-end render with it.

    ``hard=True`` decodes the structure discretely (argmax line, >0.5
    contribution) instead of softly — the exact pen walk of the
    *predicted* break structure, for eval/serving: residual hedging in
    near-peaked probabilities no longer leaks fractional advances into
    x. Non-differentiable; training always uses the soft decode.
    """
    adv = params["place_adv"][codes]  # [B, S]
    kern = params["place_kern"][codes[:, :-1], codes[:, 1:]]  # [B, S-1]
    kern = jnp.pad(kern, ((0, 0), (1, 0)))  # slot 0 has no predecessor
    if detach:
        contrib_logit = jax.lax.stop_gradient(contrib_logit)
        line_log = jax.lax.stop_gradient(line_log)
    if hard:
        p_line = jax.nn.one_hot(
            jnp.argmax(line_log, axis=-1), line_log.shape[-1]
        )  # [B, S, L]
        c = (contrib_logit > 0).astype(jnp.float32)  # [B, S]
    else:
        p_line = jax.nn.softmax(line_log, axis=-1)  # [B, S, L]
        c = jax.nn.sigmoid(contrib_logit)  # [B, S]
    same = jnp.einsum("bil,bjl->bij", p_line, p_line)  # [B, S, S]
    c_prev = jnp.pad(c[:, :-1], ((0, 0), (1, 0)))
    same_prev = jnp.pad(
        jnp.einsum("bjl,bjl->bj", p_line[:, :-1], p_line[:, 1:]),
        ((0, 0), (1, 0)),
    )  # same(j-1, j)
    step = c * adv
    kstep = kern * c * c_prev * same_prev
    S = codes.shape[1]
    strict = jnp.tril(jnp.ones((S, S), jnp.float32), -1)
    incl = jnp.tril(jnp.ones((S, S), jnp.float32), 0)
    x = (
        float(spec.padding)
        + jnp.einsum("bij,bj->bi", same * strict, step)
        + jnp.einsum("bij,bj->bi", same * incl, kstep)
        + 0.5 * adv
    )
    return x


def monotone_lines(
    line_log: jax.Array, weight: jax.Array | None = None
) -> jax.Array:
    """Viterbi decode of per-slot line indices under the engine's
    structural constraint.

    The layout engine's line index, read in original slot order, is
    non-decreasing and advances by at most one per slot (every line holds
    at least one character, and a break bumps the pen exactly one line).
    Independent per-slot argmax ignores this — a single flipped slot
    displaces one glyph by a full line-height (the pinned worst-case in
    RESULTS.md). This decode maximizes sum_s w_s * log p(l_s | slot s)
    over all monotone paths (steps in {0, 1}, starting on line 0) with an
    O(S*L) dynamic program, so an isolated low-margin flip is repaired by
    the confident slots around it.

    ``weight`` [B, S] (optional) down-weights slots whose line prediction
    is unsupervised noise — padding past the string and consumed break
    separators train with no line CE (contribution mask), so their
    logits must not drag the path; pass the contribution (structured
    head) or visibility (line head) probability. Returns [B, S] int32.
    """
    logp = jax.nn.log_softmax(line_log, axis=-1)  # [B, S, L]
    if weight is not None:
        logp = logp * weight[..., None]
    B, S, L = logp.shape
    lps = jnp.moveaxis(logp, 1, 0)  # [S, B, L]
    start = jnp.where(jnp.arange(L) == 0, 0.0, -jnp.inf)  # line 0 first

    def fwd(prev, lp):  # prev [B, L]: best monotone score ending at l
        up = jnp.pad(
            prev[:, :-1], ((0, 0), (1, 0)), constant_values=-jnp.inf
        )
        came_up = up > prev  # ties prefer staying (the lower line)
        return lp + jnp.maximum(prev, up), came_up

    dp, came_up = jax.lax.scan(fwd, lps[0] + start[None, :], lps[1:])
    last = jnp.argmax(dp, axis=-1).astype(jnp.int32)  # [B]
    rows = jnp.arange(B)

    def back(nxt, ch):  # nxt [B]: line at slot s+1 -> line at slot s
        return nxt - ch[rows, nxt].astype(jnp.int32), nxt

    first, rest = jax.lax.scan(back, last, came_up, reverse=True)
    return jnp.concatenate([first[:, None], jnp.moveaxis(rest, 0, 1)], axis=1)


def apply(
    params: dict,
    codes: jax.Array,
    cfg: ModelConfig = ModelConfig(),
    *,
    train: bool = False,
    key: jax.Array | None = None,
    hard: bool = False,
    monotone: bool = False,
    spec: SheetSpec = SheetSpec(),
) -> tuple[jax.Array, jax.Array]:
    """codes [B, S] -> (midpoints [B, S, 2] sheet px, visibility logits [B, S]).

    midpoints[..., 0] is the glyph's advance-midpoint x, midpoints[..., 1]
    its baseline y, both at base scale (SheetSpec geometry); the sigmoid of
    the logit is the probability the slot places ink (non-space, placed).

    With a line-classification head (see ``init(lines=L)``), y is the
    line-distribution expectation sum_l p_l * (l+1) * line_height —
    differentiable (the e2e pixel fine-tune still flows through it) and
    equal to the argmax decode once the logits peak. With the structured
    head, x is additionally derived from the predicted break structure
    (:func:`structured_x`) plus the learned residual.

    ``hard=True`` (line-aware heads; eval/serving only — it is not
    differentiable): y snaps to the argmax line's baseline and the
    structured head's x decodes the argmax/thresholded break structure
    (:func:`structured_x` ``hard``), eliminating the fractional-baseline
    smear of a hedged line distribution. ``monotone=True`` (implies
    hard) additionally decodes the line indices jointly under the
    engine's monotone-break constraint (:func:`monotone_lines`, weighted
    by the contribution resp. visibility probability) instead of
    per-slot argmax. Both are no-ops for the regression head.
    """
    x = font_renderer.features(params, codes, cfg, train=train, key=key)
    out = _head(x, params["place_w"], params["place_b"])  # [B,S,3|2+L|3+L]
    L = head_lines(params)
    if L == 0:
        return out[..., :2], out[..., 2]
    hard = hard or monotone
    baselines = (jnp.arange(L, dtype=jnp.float32) + 1.0) * spec.line_height
    if head_structured(params):
        xr, vlogit, llog = out[..., 0], out[..., 1], out[..., 3:]
        if monotone:
            lines = monotone_lines(llog, jax.nn.sigmoid(out[..., 2]))
            llog = jax.nn.one_hot(lines, L) * 1e4
        if hard:
            y = baselines[jnp.argmax(llog, axis=-1)]
        else:
            y = jax.nn.softmax(llog, axis=-1) @ baselines
        px = structured_x(params, codes, out[..., 2], llog, spec, hard=hard) + xr
        return jnp.stack([px, y], axis=-1), vlogit
    llog = out[..., 2:]
    if monotone:
        lines = monotone_lines(llog, jax.nn.sigmoid(out[..., 1]))
        llog = jax.nn.one_hot(lines, L) * 1e4
    if hard:
        y = baselines[jnp.argmax(llog, axis=-1)]
    else:
        y = jax.nn.softmax(llog, axis=-1) @ baselines
    return jnp.stack([out[..., 0], y], axis=-1), out[..., 1]


def line_logits(
    params: dict,
    codes: jax.Array,
    cfg: ModelConfig = ModelConfig(),
    *,
    train: bool = False,
    key: jax.Array | None = None,
) -> jax.Array:
    """Raw per-slot line logits [B, S, L] (line-aware heads only)."""
    if head_lines(params) == 0:
        raise ValueError("regression head has no line logits")
    x = font_renderer.features(params, codes, cfg, train=train, key=key)
    off = 3 if head_structured(params) else 2
    return _head(x, params["place_w"], params["place_b"])[..., off:]


def placement_targets(
    strings: list[str],
    table: AdvanceTable,
    spec: SheetSpec = SheetSpec(),
    max_glyphs: int = 100,
    full: bool = False,
    margins: bool = False,
):
    """Engine ground truth, indexed by ORIGINAL character slot.

    Returns (midpoints [N, S, 2] f32, visible [N, S] bool) where S =
    spec.max_chars. Slot i of string n is character i of the truncated
    string; visible slots get the advance-midpoint x / baseline y the
    layout engine gives that character's glyph (identical numbers to
    implicit_sheet.place_glyphs); spaces, unknown chars, characters
    whose separator space is consumed by a line break, and glyphs past
    ``max_glyphs`` are invisible (midpoints stay 0 — mask them in losses).

    ``margins=True`` appends a per-slot decision margin [N, S] f32: for
    each word placed against a non-empty line, how many px the engine's
    accept/reject test was from flipping (|measure(candidate) − usable
    width|), assigned to that word's slots and its separator space;
    slots whose line assignment involved no contested decision (first
    word of a string, words following a just-broken line) stay +inf.
    This is the per-slot form of the queue-13 break-hardness signal
    (RESULTS.md) — weight losses with it instead of resampling.

    ``full=True`` additionally returns the structural supervision the
    structured head trains on: (line_idx [N, S] int32, contrib [N, S]
    bool). A slot CONTRIBUTES when the engine's pen walks over it — every
    character that lands on some line, including intra-line spaces and
    glyphs past ``max_glyphs`` — and its line_idx is that line. Consumed
    break separators and vanished empty-token slots contribute nothing
    (line_idx stays 0; mask with contrib).
    """
    S = spec.max_chars
    adv = table.advances_px
    idx = {c: i for i, c in enumerate(table.charset)}
    max_width = spec.width - 2 * spec.padding
    n = len(strings)
    mids = np.zeros((n, S, 2), np.float32)
    vis = np.zeros((n, S), bool)
    line_idx = np.zeros((n, S), np.int32)
    contrib = np.zeros((n, S), bool)
    margin = np.full((n, S), np.inf, np.float32)
    for si, text in enumerate(strings):
        text = text[:S]
        words = text.split(" ")
        offs: list[int] = []
        pos = 0
        for w in words:
            offs.append(pos)
            pos += len(w) + 1
        # Greedy wrap (wrap_text semantics), but each line keeps its chars'
        # original indices. When cur is empty the candidate is the bare
        # word (leading empty tokens vanish); otherwise one separator
        # space (the char just before the word) joins them — and is
        # consumed if the candidate overflows into a break.
        lines: list[list[tuple[int, str]]] = []
        cur_text = ""
        cur_chars: list[tuple[int, str]] = []
        for wi, word in enumerate(words):
            wchars = [(offs[wi] + j, c) for j, c in enumerate(word)]
            if cur_text:
                test = f"{cur_text} {word}"
                tchars = cur_chars + [(offs[wi] - 1, " ")] + wchars
            else:
                test = word
                tchars = wchars
            meas = table.measure(test)
            if cur_text:
                # The accept/reject decision for THIS word: its margin
                # (px from flipping) marks the word's slots and its
                # separator space as boundary-contested supervision.
                m = abs(meas - max_width)
                for ci, _ in wchars:
                    margin[si, ci] = m
                if offs[wi] > 0:
                    margin[si, offs[wi] - 1] = m
            if meas > max_width and cur_text:
                lines.append(cur_chars)
                cur_text, cur_chars = word, wchars
            else:
                cur_text, cur_chars = test, tchars
        if cur_text:
            lines.append(cur_chars)
        g = 0
        for li, chars in enumerate(lines):
            baseline = (li + 1) * spec.line_height
            pen = float(spec.padding)
            prev = None
            for ci, ch in chars:
                k = idx.get(ch)
                a = adv[0 if k is None else k]
                if prev is not None:
                    # GPOS pair adjustment, matching the proportional
                    # engine's pen walk (proportional.py:layout_prop_grid).
                    pen += table.kern(prev, ch)
                prev = ch
                line_idx[si, ci] = li
                contrib[si, ci] = True
                if k is not None and ch != " " and g < max_glyphs:
                    mids[si, ci, 0] = pen + 0.5 * a
                    mids[si, ci, 1] = baseline
                    vis[si, ci] = True
                    g += 1
                pen += a
    out = [mids, vis]
    if full:
        out += [line_idx, contrib]
    if margins:
        out.append(margin)
    return tuple(out) if len(out) > 2 else (mids, vis)


def _bce(logit: jax.Array, target_f: jax.Array) -> jax.Array:
    """Mean sigmoid binary cross-entropy (numerically stable form)."""
    return jnp.mean(
        jnp.maximum(logit, 0)
        - logit * target_f
        + jnp.log1p(jnp.exp(-jnp.abs(logit)))
    )


def loss_fn(
    params: dict,
    codes: jax.Array,
    mids: jax.Array,
    vis: jax.Array,
    cfg: ModelConfig,
    *,
    key: jax.Array | None = None,
    train: bool = True,
    line_tgt: jax.Array | None = None,
    contrib_tgt: jax.Array | None = None,
    detach_structure: bool = False,
    ce_w: jax.Array | None = None,
    spec: SheetSpec = SheetSpec(),
) -> jax.Array:
    """Masked position loss (visible slots) + visibility BCE.

    Regression head: x/y MSE in px^2. Line-classification head: x MSE +
    weighted line cross-entropy — the CE weight (100) makes one
    confidently-wrong line decision cost on the order of its old y^2
    penalty ((1.2 * line_height)^2 ~ 300 px^2), so the break structure
    is optimized as hard as the old loss only *implicitly* did.

    Structured head (requires ``line_tgt``/``contrib_tgt`` from
    ``placement_targets(..., full=True)``): derived-x MSE (visible
    slots) + weighted line CE over *contributing* slots (spaces shape
    later glyphs' x, so their line assignment is supervised too) +
    contribution BCE + visibility BCE.

    ``ce_w`` (optional [N, S] f32) reweights the line CE per slot
    (weighted mean: Σ w·CE / Σ w) — the loss-side alternative to
    boundary resampling; build weights from
    ``placement_targets(..., margins=True)``. Ignored by the
    regression head (no CE term).

    When the params carry ``loss_logvar`` (``init(uncertainty=True)``),
    the terms are combined as Σ exp(−sᵢ)·Lᵢ + sᵢ instead of a plain sum
    (slots: 0=x/position, 1=weighted line CE, 2=contribution BCE,
    3=visibility BCE) — at s=0 this equals the fixed-weight loss, and
    the regularizer term +sᵢ stops the weights from collapsing to 0.
    """
    visf = vis.astype(jnp.float32)
    n_vis = jnp.maximum(jnp.sum(visf), 1.0)
    L = head_lines(params)
    lh = spec.line_height
    if L == 0:
        pred_xy, logit = apply(params, codes, cfg, train=train, key=key, spec=spec)
        pos = jnp.sum(jnp.sum((pred_xy - mids) ** 2, -1) * visf) / n_vis
        terms = [(0, pos)]
    elif head_structured(params):
        if line_tgt is None or contrib_tgt is None:
            raise ValueError(
                "structured head needs line_tgt/contrib_tgt "
                "(placement_targets(..., full=True))"
            )
        x = font_renderer.features(params, codes, cfg, train=train, key=key)
        out = _head(x, params["place_w"], params["place_b"])
        logit = out[..., 1]
        llog = out[..., 3:]
        px = (
            structured_x(
                params, codes, out[..., 2], llog, spec, detach=detach_structure
            )
            + out[..., 0]
        )
        pos_x = jnp.sum((px - mids[..., 0]) ** 2 * visf) / n_vis
        cf = contrib_tgt.astype(jnp.float32)
        cw = cf if ce_w is None else cf * ce_w
        n_con = jnp.maximum(jnp.sum(cw), 1.0)
        tgt = jnp.clip(line_tgt, 0, L - 1)
        logp = jax.nn.log_softmax(llog, axis=-1)
        ce = -jnp.sum(
            jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0] * cw
        ) / n_con
        terms = [(0, pos_x), (1, 100.0 * ce), (2, _bce(out[..., 2], cf))]
    else:
        x = font_renderer.features(params, codes, cfg, train=train, key=key)
        out = _head(x, params["place_w"], params["place_b"])
        logit = out[..., 1]
        pos_x = jnp.sum((out[..., 0] - mids[..., 0]) ** 2 * visf) / n_vis
        tgt = jnp.clip(
            jnp.round(mids[..., 1] / lh).astype(jnp.int32) - 1, 0, L - 1
        )
        logp = jax.nn.log_softmax(out[..., 2:], axis=-1)
        cw = visf if ce_w is None else visf * ce_w
        ce = -jnp.sum(
            jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0] * cw
        ) / jnp.maximum(jnp.sum(cw), 1.0)
        terms = [(0, pos_x), (1, 100.0 * ce)]
    terms.append((3, _bce(logit, visf)))
    if "loss_logvar" in params:
        s = params["loss_logvar"]
        return sum(jnp.exp(-s[i]) * t + s[i] for i, t in terms)
    return sum(t for _, t in terms)
