"""Dataset tests: device corpus, disk round-trip via the file contract."""

import numpy as np
import pytest

from ai_font_renderer_tpu import cli
from ai_font_renderer_tpu.config import FIRACODE_PATH
from ai_font_renderer_tpu.fontgen import bake_atlas
from ai_font_renderer_tpu.fontgen.dataset import (
    build_device_dataset,
    device_dataset_from_disk,
    load_string_dataset,
    split_permutation,
    split_sizes,
)


def test_split_sizes_match_reference():
    # model.py:232-234: val = int(0.2 * n), train = n - val.
    assert split_sizes(150000, 0.2) == (120000, 30000)
    assert split_sizes(96, 0.2) == (77, 19)


def test_split_permutation_deterministic():
    a = split_permutation(100, 42)
    b = split_permutation(100, 42)
    np.testing.assert_array_equal(a, b)
    assert sorted(a) == list(range(100))


def test_device_dataset_contents():
    atlas = bake_atlas(FIRACODE_PATH)
    ds = build_device_dataset(atlas, num_samples=40, synth_batch=16)
    assert ds.num_samples == 40
    assert ds.codes.shape == (40, 100)
    assert ds.targets_u8.shape == (40, 80, 240)
    assert ds.targets_u8.dtype == np.uint8
    codes, targets = ds.gather_batch(np.arange(8, dtype=np.int32))
    assert float(targets.max()) <= 1.0
    # Ink present (text sheets are not blank).
    assert float(targets.min()) < 0.5


def test_disk_roundtrip_matches_device(tmp_path):
    """fontgen export -> disk loader must reproduce the device dataset."""
    out = tmp_path / "train_input"
    rc = cli.main(["fontgen", "--num-samples", "6", "--out", str(out)])
    assert rc == 0
    codes, targets = load_string_dataset(str(out), 6)
    atlas = bake_atlas(FIRACODE_PATH)
    ds = build_device_dataset(atlas, num_samples=6, synth_batch=8)
    np.testing.assert_array_equal(codes, np.asarray(ds.codes))
    disk_u8 = np.round(targets * 255).astype(np.uint8)
    np.testing.assert_array_equal(disk_u8, np.asarray(ds.targets_u8))


def test_loader_error_contracts(tmp_path):
    d = tmp_path / "data"
    d.mkdir()
    (d / "data.txt").write_text("ONE\nTWO\n")
    with pytest.raises(ValueError, match="Not enough strings"):
        load_string_dataset(str(d), 5)
    with pytest.raises(FileNotFoundError, match="Image file not found"):
        load_string_dataset(str(d), 2)


def test_device_dataset_from_disk(tmp_path):
    out = tmp_path / "train_input"
    cli.main(["fontgen", "--num-samples", "3", "--out", str(out)])
    ds = device_dataset_from_disk(str(out), 3)
    assert ds.num_samples == 3
    assert ds.targets_u8.shape == (3, 80, 240)


def test_montserrat_device_dataset():
    from ai_font_renderer_tpu.config import MONTSERRAT_PATH, SheetSpec
    from ai_font_renderer_tpu.fontgen.dataset import build_device_dataset_prop
    from ai_font_renderer_tpu.fontgen.proportional import bake_prop_atlas

    atlas = bake_prop_atlas(MONTSERRAT_PATH, SheetSpec())
    ds = build_device_dataset_prop(atlas, num_samples=12, synth_batch=8)
    assert ds.num_samples == 12
    assert ds.targets_u8.shape == (12, 80, 240)
    codes, targets = ds.gather_batch(np.arange(4, dtype=np.int32))
    # Same corpus strings as the monospace config (bit-exact LCG).
    from ai_font_renderer_tpu.fontgen.textgen import generate_text

    want = generate_text(42)
    got = "".join(chr(c) for c in np.asarray(codes[0]) if c)
    assert got == want[:100].rstrip("\x00")
    # Sheets contain ink and differ from the FiraCode rendering.
    assert float(targets.min()) < 0.5


def test_subset_build_matches_full_dataset():
    """build_device_dataset(subset=...) must produce exactly the same
    codes/targets as slicing the full build — sample identity is defined by
    the full-corpus layout, not the subset (afr eval fast path)."""
    import numpy as np
    import jax.numpy as jnp
    from ai_font_renderer_tpu.config import FIRACODE_PATH, SheetSpec
    from ai_font_renderer_tpu.fontgen import bake_atlas
    from ai_font_renderer_tpu.fontgen.dataset import build_device_dataset

    spec = SheetSpec(width=60, height=20, max_chars=24)
    atlas = bake_atlas(FIRACODE_PATH, spec)
    full = build_device_dataset(atlas, 48, synth_batch=16)
    sub_idx = np.array([3, 7, 11, 40, 47], np.int32)
    sub = build_device_dataset(atlas, 48, synth_batch=16, subset=sub_idx)
    np.testing.assert_array_equal(
        np.asarray(sub.codes), np.asarray(full.codes)[sub_idx]
    )
    np.testing.assert_array_equal(
        np.asarray(sub.targets_u8), np.asarray(full.targets_u8)[sub_idx]
    )


def test_ground_truth_device_matches_host_oracle():
    """synthesize_ground_truth(on_device=True) is the chunked f32/HIGHEST
    device twin of the numpy oracle — same 8-bit quantized sheets (equal
    rounded integers; floats may differ by one ulp where XLA folds /255
    into a reciprocal multiply) for both atlas types, including the padded
    final chunk (synth_batch=2 over 5 strings forces padding + reuse)."""
    from ai_font_renderer_tpu.config import MONTSERRAT_PATH, SheetSpec
    from ai_font_renderer_tpu.fontgen.dataset import synthesize_ground_truth
    from ai_font_renderer_tpu.fontgen.proportional import bake_prop_atlas

    strings = ["AB", "HELLO", "", "W W", "IIIII"]
    spec = SheetSpec(width=60, height=20, max_chars=24)

    mono = bake_atlas(FIRACODE_PATH, spec)
    host = synthesize_ground_truth(mono, strings)
    dev = synthesize_ground_truth(mono, strings, on_device=True, synth_batch=2)
    np.testing.assert_array_equal(
        np.round(dev * 255.0), np.round(host * 255.0)
    )
    assert np.abs(dev - host).max() <= 1e-6

    prop = bake_prop_atlas(MONTSERRAT_PATH, spec)
    host_p = synthesize_ground_truth(prop, strings)
    dev_p = synthesize_ground_truth(
        prop, strings, on_device=True, synth_batch=2
    )
    np.testing.assert_array_equal(
        np.round(dev_p * 255.0), np.round(host_p * 255.0)
    )
    assert np.abs(dev_p - host_p).max() <= 1e-6
