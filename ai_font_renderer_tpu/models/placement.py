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
    key: jax.Array, cfg: ModelConfig = ModelConfig(), *, lines: int = 0
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
    mode into a CE loss the transformer can actually optimize. The head
    mode is carried by the weight shape (3 vs 2+L columns), so saved
    checkpoints round-trip through the same npz contract with no config
    changes.
    """
    if lines == 1:
        raise ValueError("lines must be 0 (regression head) or >= 2")
    k_front, k_head = jax.random.split(key)
    params = {
        k: v
        for k, v in font_renderer.init(k_front, cfg).items()
        if not k.startswith("out_")  # drop the sheet decoder; keep frontend
    }
    h = cfg.hidden_dim
    n_out = 3 if lines == 0 else 2 + lines
    bound = 1.0 / h**0.5
    params["place_w"] = jax.random.uniform(
        k_head, (h, n_out), minval=-bound, maxval=bound
    )
    params["place_b"] = jnp.zeros((n_out,))
    return params


def head_lines(params: dict) -> int:
    """0 for the regression head, L for a line-classification head."""
    n = params["place_w"].shape[1]
    return 0 if n == 3 else n - 2


@jax.jit
def _head(x, w, b):
    return x.astype(jnp.float32) @ w + b


def apply(
    params: dict,
    codes: jax.Array,
    cfg: ModelConfig = ModelConfig(),
    *,
    train: bool = False,
    key: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """codes [B, S] -> (midpoints [B, S, 2] sheet px, visibility logits [B, S]).

    midpoints[..., 0] is the glyph's advance-midpoint x, midpoints[..., 1]
    its baseline y, both at base scale (SheetSpec geometry); the sigmoid of
    the logit is the probability the slot places ink (non-space, placed).

    With a line-classification head (see ``init(lines=L)``), y is the
    line-distribution expectation sum_l p_l * (l+1) * line_height —
    differentiable (the e2e pixel fine-tune still flows through it) and
    equal to the argmax decode once the logits peak.
    """
    x = font_renderer.features(params, codes, cfg, train=train, key=key)
    out = _head(x, params["place_w"], params["place_b"])  # [B, S, 3 | 2+L]
    L = head_lines(params)
    if L == 0:
        return out[..., :2], out[..., 2]
    baselines = (jnp.arange(L, dtype=jnp.float32) + 1.0) * SheetSpec().line_height
    y = jax.nn.softmax(out[..., 2:], axis=-1) @ baselines
    return jnp.stack([out[..., 0], y], axis=-1), out[..., 1]


def line_logits(
    params: dict,
    codes: jax.Array,
    cfg: ModelConfig = ModelConfig(),
    *,
    train: bool = False,
    key: jax.Array | None = None,
) -> jax.Array:
    """Raw per-slot line logits [B, S, L] (line-classification head only)."""
    if head_lines(params) == 0:
        raise ValueError("regression head has no line logits")
    x = font_renderer.features(params, codes, cfg, train=train, key=key)
    return _head(x, params["place_w"], params["place_b"])[..., 2:]


def placement_targets(
    strings: list[str],
    table: AdvanceTable,
    spec: SheetSpec = SheetSpec(),
    max_glyphs: int = 100,
) -> tuple[np.ndarray, np.ndarray]:
    """Engine ground truth, indexed by ORIGINAL character slot.

    Returns (midpoints [N, S, 2] f32, visible [N, S] bool) where S =
    spec.max_chars. Slot i of string n is character i of the truncated
    string; visible slots get the advance-midpoint x / baseline y the
    layout engine gives that character's glyph (identical numbers to
    implicit_sheet.place_glyphs); spaces, unknown chars, characters
    whose separator space is consumed by a line break, and glyphs past
    ``max_glyphs`` are invisible (midpoints stay 0 — mask them in losses).
    """
    S = spec.max_chars
    adv = table.advances_px
    idx = {c: i for i, c in enumerate(table.charset)}
    max_width = spec.width - 2 * spec.padding
    n = len(strings)
    mids = np.zeros((n, S, 2), np.float32)
    vis = np.zeros((n, S), bool)
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
            if table.measure(test) > max_width and cur_text:
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
                if k is not None and ch != " " and g < max_glyphs:
                    mids[si, ci, 0] = pen + 0.5 * a
                    mids[si, ci, 1] = baseline
                    vis[si, ci] = True
                    g += 1
                pen += a
    return mids, vis


def loss_fn(
    params: dict,
    codes: jax.Array,
    mids: jax.Array,
    vis: jax.Array,
    cfg: ModelConfig,
    *,
    key: jax.Array | None = None,
    train: bool = True,
) -> jax.Array:
    """Masked position loss (visible slots) + visibility BCE.

    Regression head: x/y MSE in px^2. Line-classification head: x MSE +
    weighted line cross-entropy — the CE weight (100) makes one
    confidently-wrong line decision cost on the order of its old y^2
    penalty ((1.2 * line_height)^2 ~ 300 px^2), so the break structure
    is optimized as hard as the old loss only *implicitly* did.
    """
    visf = vis.astype(jnp.float32)
    n_vis = jnp.maximum(jnp.sum(visf), 1.0)
    L = head_lines(params)
    if L == 0:
        pred_xy, logit = apply(params, codes, cfg, train=train, key=key)
        pos = jnp.sum(jnp.sum((pred_xy - mids) ** 2, -1) * visf) / n_vis
    else:
        x = font_renderer.features(params, codes, cfg, train=train, key=key)
        out = _head(x, params["place_w"], params["place_b"])
        logit = out[..., 1]
        pos_x = jnp.sum((out[..., 0] - mids[..., 0]) ** 2 * visf) / n_vis
        lh = SheetSpec().line_height
        tgt = jnp.clip(
            jnp.round(mids[..., 1] / lh).astype(jnp.int32) - 1, 0, L - 1
        )
        logp = jax.nn.log_softmax(out[..., 2:], axis=-1)
        ce = -jnp.sum(
            jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0] * visf
        ) / n_vis
        pos = pos_x + 100.0 * ce
    bce = jnp.mean(
        jnp.maximum(logit, 0) - logit * visf + jnp.log1p(jnp.exp(-jnp.abs(logit)))
    )
    return pos + bce
