"""Layout tests: word-wrap parity with the reference's canvas logic."""

import numpy as np
import pytest

from ai_font_renderer_tpu.config import FIRACODE_PATH, SheetSpec
from ai_font_renderer_tpu.fontgen import bake_atlas
from ai_font_renderer_tpu.fontgen.layout import (
    AdvanceTable,
    encode_codes,
    encode_grids,
    layout_to_grid,
    wrap_text,
)


@pytest.fixture(scope="module")
def atlas():
    return bake_atlas(FIRACODE_PATH)


@pytest.fixture(scope="module")
def adv(atlas):
    return atlas.advance_table()


def js_wrap_reference(text, adv_px, max_width):
    """Direct transcription of generate_font.ts:75-97 semantics for oracle."""
    words = text.split(" ")
    lines, current = [], ""
    for word in words:
        test = f"{current} {word}" if current else word
        if len(test) * adv_px > max_width and current:
            lines.append(current)
            current = word
        else:
            current = test
    if current:
        lines.append(current)
    return lines


@pytest.mark.parametrize(
    "text",
    [
        "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG",
        "A PARADISE UNTOUCHED BY MAN WITHIN THIS WORLD BLESSED WITH LOVE",
        "WWWWWWWWWWWWWWWWWWWW",
        "ALTERNATING CASE TEST   SPACES",
        "EXACTLY TWENTY CHARS",
        "A",
        "",
        "  LEADING AND TRAILING  ",
    ],
)
def test_wrap_matches_js_semantics(text, adv):
    got = wrap_text(text, adv, 240.0)
    want = js_wrap_reference(text, adv.advances_px[0], 240.0)
    assert got == want


def test_all_spaces_yields_no_lines(adv):
    # generate_font.ts:92: empty currentLine is falsy -> blank sheet.
    assert wrap_text(" " * 20, adv, 240.0) == []


def test_line_capacity_is_32_chars(adv):
    # 32 chars * 96/13 px = 236.3 <= 240 < 33 chars -> max 32 chars per line.
    text = " ".join(["AAAAAAAAAA"] * 9)
    for line in wrap_text(text, adv, 240.0):
        assert len(line) <= 32


def test_double_space_preserved(adv):
    lines = wrap_text("A  B", adv, 240.0)
    assert lines == ["A  B"]


def test_grid_places_chars(atlas, adv):
    grid = layout_to_grid("AB C", adv, atlas.spec, atlas.n_lines, atlas.n_slots)
    charset = atlas.charset
    assert charset[grid[0, 0]] == "A"
    assert charset[grid[0, 1]] == "B"
    assert charset[grid[0, 2]] == " "
    assert charset[grid[0, 3]] == "C"
    assert (grid[1:] == 0).all()


def test_grid_wraps_to_second_line(atlas, adv):
    text = "AAAAAAAAAA BBBBBBBBBB CCCCCCCCCC DDDDDDDDDD"
    grid = layout_to_grid(text, adv, atlas.spec, atlas.n_lines, atlas.n_slots)
    assert (grid[1] != 0).any()  # wrapped onto line 2


def test_truncation_at_max_chars(atlas, adv):
    text = "A" * 150  # helpers.py:52-54 truncates to 100
    grid = layout_to_grid(text, adv, atlas.spec, atlas.n_lines, atlas.n_slots)
    n_placed = int((grid != 0).sum())
    assert n_placed <= 100


def test_encode_codes_matches_reference():
    codes = encode_codes(["AB"], 5)
    np.testing.assert_array_equal(codes[0], [65, 66, 0, 0, 0])


def test_encode_grids_batch(atlas, adv):
    grids = encode_grids(["A", "B"], adv, atlas.spec, atlas.n_lines, atlas.n_slots)
    assert grids.shape == (2, atlas.n_lines, atlas.n_slots)
    assert grids[0, 0, 0] != grids[1, 0, 0]
