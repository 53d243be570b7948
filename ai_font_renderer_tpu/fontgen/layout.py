"""Text layout: word wrap + glyph placement grids.

Reimplements the reference's canvas-based layout exactly:
  * greedy word wrap over ``split(" ")`` tokens where a line is pushed only
    when the candidate line overflows AND the current line is non-empty
    (generate_font.ts:75-97) — including its quirks: consecutive spaces
    produce empty tokens that extend the line with bare separators, and an
    all-space string wraps to zero lines (falsy ""), i.e. a blank sheet;
  * ``measureText`` becomes a sum of per-character advance widths (node-canvas
    measures shaped width; for these fonts with no kerning between uppercase
    glyphs this is the advance sum);
  * each line is drawn with its pen starting at ``padding`` and baseline at
    ``(line_index + 1) * line_height`` (generate_font.ts:125-130).

For monospace fonts the placement of every character is ``(line, slot)`` on a
fixed grid, which is what makes on-device sheet synthesis a static einsum —
see ``sheets.py``.
"""

from __future__ import annotations

import numpy as np

from ..config import SheetSpec


class AdvanceTable:
    """Per-character advance widths (px) for a charset, plus pair kerning."""

    def __init__(self, charset: str, advances_px: np.ndarray, kerning=None):
        self.charset = charset
        self.advances_px = np.asarray(advances_px, np.float64)
        self._index = {c: i for i, c in enumerate(charset)}
        self.kerning = kerning  # fontgen.kerning.KerningTable or None
        self.is_monospace = bool(
            len(advances_px) > 0
            and np.all(advances_px == advances_px[0])
            and not (kerning and len(kerning))
        )

    def char_index(self, ch: str) -> int:
        """Charset index for ``ch``; unknown chars map to index 0 (space)."""
        return self._index.get(ch, 0)

    def kern(self, left: str, right: str) -> float:
        return self.kerning.get(left, right) if self.kerning else 0.0

    def measure(self, text: str) -> float:
        """Shaped width: advance sum + pair-kern adjustments (like
        measureText through HarfBuzz)."""
        if self.is_monospace:  # O(1): every char advances the same
            return len(text) * float(self.advances_px[0])
        w = float(sum(self.advances_px[self.char_index(c)] for c in text))
        if self.kerning:
            w += sum(self.kern(a, b) for a, b in zip(text, text[1:]))
        return w


def wrap_text(text: str, advances: AdvanceTable, max_width: float) -> list[str]:
    """Greedy word wrap, semantics-exact vs generate_font.ts:75-97."""
    words = text.split(" ")
    lines: list[str] = []
    current = ""
    for word in words:
        test = f"{current} {word}" if current else word
        if advances.measure(test) > max_width and current:
            lines.append(current)
            current = word
        else:
            current = test
    if current:
        lines.append(current)
    return lines


def layout_to_grid(
    text: str,
    advances: AdvanceTable,
    spec: SheetSpec,
    n_lines: int,
    n_slots: int,
) -> np.ndarray:
    """Lay out one string onto the monospace (line, slot) grid.

    Returns int16 [n_lines, n_slots] of charset indices; 0 (= space, ink-free)
    marks empty cells. Characters that fall past the last slot are dropped
    (the canvas clips them at the sheet edge, generate_font.ts:100).
    Strings longer than ``spec.max_chars`` are truncated first, matching
    helpers.py:52-54.
    """
    if len(text) > spec.max_chars:
        text = text[: spec.max_chars]
    grid = np.zeros((n_lines, n_slots), np.int16)
    lines = wrap_text(text, advances, spec.width - 2 * spec.padding)
    for li, line in enumerate(lines[:n_lines]):
        for j, ch in enumerate(line[:n_slots]):
            grid[li, j] = advances.char_index(ch)
    return grid


def encode_codes(strings: list[str], max_chars: int) -> np.ndarray:
    """Model inputs: ord() codes zero-padded to max_chars (helpers.py:57-59)."""
    out = np.zeros((len(strings), max_chars), np.int32)
    for i, s in enumerate(strings):
        codes = [ord(c) & 0x7F for c in s[:max_chars]]
        out[i, : len(codes)] = codes
    return out


def encode_grids(
    strings: list[str],
    advances: AdvanceTable,
    spec: SheetSpec,
    n_lines: int,
    n_slots: int,
) -> np.ndarray:
    """Batch version of :func:`layout_to_grid` -> int16 [N, n_lines, n_slots]."""
    out = np.zeros((len(strings), n_lines, n_slots), np.int16)
    for i, s in enumerate(strings):
        out[i] = layout_to_grid(s, advances, spec, n_lines, n_slots)
    return out
