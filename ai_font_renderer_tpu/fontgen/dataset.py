"""Dataset assembly: corpus -> device-resident tensors.

The reference materializes 150k BMPs on disk (generate_font.ts:219-224) and
reloads them into an 11.5 GB float32 host tensor fed through a 32-worker
DataLoader (helpers.py:125-181, model.py:249-266). Here the corpus lives on
the device:

  * ``codes``   int32  [N, 100]   — model inputs (ord codes, zero-padded);
  * ``targets`` uint8  [N, H, W]  — sheets synthesized ONCE on-device by the
    atlas einsum and stored 8-bit (2.9 GB for 150k vs 11.5 GB float32);
    batches are gathered + dequantized inside the jitted epoch, so the
    host never touches pixel data and there are no per-step transfers.

Host-side layout products (strings -> grids -> codes) are cached to disk
keyed by corpus parameters; the expensive pixel data is never stored.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SheetSpec
from .atlas import GlyphAtlas, bake_atlas
from .layout import encode_codes, encode_grids
from .sheets import make_synth_ops, synthesize_sheets
from .textgen import generate_corpus


@dataclass
class DeviceDataset:
    """Device-resident corpus: inputs + 8-bit targets."""

    codes: jax.Array  # int32 [N, max_chars]
    targets_u8: jax.Array  # uint8 [N, H, W]

    @property
    def num_samples(self) -> int:
        return self.codes.shape[0]

    def gather_batch(self, idx: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Gather a batch fully on device; targets dequantized to f32."""
        codes = jnp.take(self.codes, idx, axis=0)
        targets = jnp.take(self.targets_u8, idx, axis=0).astype(jnp.float32) / 255.0
        return codes, targets


def _layout_cache_path(cache_dir: str, key_payload: dict) -> str:
    key = hashlib.sha1(json.dumps(key_payload, sort_keys=True).encode()).hexdigest()[
        :16
    ]
    return os.path.join(cache_dir, f"corpus_{key}.npz")


def build_layouts(
    atlas: GlyphAtlas,
    num_samples: int,
    base_seed: int = 42,
    cache_dir: str | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Generate the corpus strings and lay them out: (codes, grids).

    Bit-exact reproduction of the reference corpus (seed i+42,
    generate_font.ts:204) laid onto the monospace grid. Cached on disk —
    the 150k-string layout pass costs a few seconds once.
    """
    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
            ".cache",
            "corpus",
        )
    spec = atlas.spec
    path = _layout_cache_path(
        cache_dir,
        {
            "n": num_samples,
            "seed": base_seed,
            "spec": [spec.width, spec.height, spec.font_size, spec.max_chars],
            "grid": [atlas.n_lines, atlas.n_slots],
            "charset": atlas.charset,
            "adv": atlas.advance_px,
        },
    )
    if os.path.exists(path):
        z = np.load(path)
        return z["codes"], z["grids"]

    # Fast path: the native C++ generator (bit-exact twin, ~100x faster) when
    # the layout matches its assumptions: printable-ASCII charset indexed by
    # code-32, monospace advances. Python path otherwise and as fallback.
    from ..config import PRINTABLE_ASCII
    from . import native

    codes = grids = None
    if (
        atlas.charset == PRINTABLE_ASCII
        and atlas.advance_table().is_monospace
        and spec.padding == 0
    ):
        out = native.generate_corpus_grids(
            num_samples,
            base_seed,
            10,
            100,
            float(atlas.advance_px),
            int(spec.width - 2 * spec.padding),
            atlas.n_lines,
            atlas.n_slots,
            spec.max_chars,
        )
        if out is not None:
            codes, grids = out
    if codes is None:
        texts = generate_corpus(num_samples, base_seed=base_seed)
        codes = encode_codes(texts, spec.max_chars)
        grids = encode_grids(
            texts, atlas.advance_table(), spec, atlas.n_lines, atlas.n_slots
        )
    os.makedirs(cache_dir, exist_ok=True)
    np.savez_compressed(path, codes=codes, grids=grids)
    return codes, grids


def build_device_dataset(
    atlas: GlyphAtlas,
    num_samples: int,
    base_seed: int = 42,
    synth_batch: int = 4096,
    cache_dir: str | None = None,
    dtype=None,
    subset: np.ndarray | None = None,
) -> DeviceDataset:
    """Corpus -> device tensors, synthesizing all targets on-device once.

    Synthesis runs in f32/HIGHEST by default: the dataset definition is
    bit-exact against the numpy oracle and the BMP export contract on every
    backend (it runs once per corpus, so the 2x bf16 speedup is irrelevant).

    ``subset``: optional index array into the ``num_samples`` corpus —
    layouts are computed (cheap, cached) for the full corpus so sample i is
    identical whatever the subset, but only ``subset`` rows are synthesized
    and kept on device. Lets ``afr eval`` build just the 20% val split.
    """
    import jax.numpy as _jnp

    codes, grids = build_layouts(atlas, num_samples, base_seed, cache_dir)
    if subset is not None:
        codes = codes[subset]
        grids = grids[subset]
    ops = make_synth_ops(atlas, dtype or _jnp.float32)

    @jax.jit
    def synth_u8(g):
        sheets = synthesize_sheets(ops, g)
        return jnp.round(sheets * 255.0).astype(jnp.uint8)

    n = len(grids)
    chunks = []
    for start in range(0, n, synth_batch):
        chunk = grids[start : start + synth_batch]
        if len(chunk) < synth_batch:  # pad to keep one compiled shape
            pad = np.zeros((synth_batch - len(chunk),) + chunk.shape[1:], chunk.dtype)
            out = synth_u8(jnp.asarray(np.concatenate([chunk, pad])))[: len(chunk)]
        else:
            out = synth_u8(jnp.asarray(chunk))
        chunks.append(out)
    targets = jnp.concatenate(chunks, axis=0)
    return DeviceDataset(codes=jnp.asarray(codes), targets_u8=targets)


def build_device_dataset_prop(
    atlas,
    num_samples: int,
    base_seed: int = 42,
    synth_batch: int = 1024,
) -> DeviceDataset:
    """Proportional-font corpus -> device tensors (e.g. Montserrat config).

    Same LCG corpus strings, laid out with the font's real advances +
    kerning on the coarse placement grid, synthesized on device by the
    proportional einsum path (fontgen/proportional.py).
    """
    import jax.numpy as _jnp

    from .proportional import encode_prop_grids, synthesize_prop_sheets
    from .textgen import generate_corpus

    texts = generate_corpus(num_samples, base_seed=base_seed)
    codes = encode_codes(texts, atlas.spec.max_chars)
    grids = encode_prop_grids(texts, atlas)

    chunks = []
    for start in range(0, num_samples, synth_batch):
        part = grids[start : start + synth_batch]
        pad = synth_batch - len(part)
        if pad:
            part = np.concatenate(
                [part, np.zeros((pad,) + part.shape[1:], part.dtype)]
            )
            sheets = synthesize_prop_sheets(atlas, part, dtype=_jnp.float32)[
                : num_samples - start
            ]
        else:
            sheets = synthesize_prop_sheets(atlas, part, dtype=_jnp.float32)
        chunks.append(jnp.round(sheets * 255.0).astype(jnp.uint8))
    targets = jnp.concatenate(chunks, axis=0)
    return DeviceDataset(codes=jnp.asarray(codes), targets_u8=targets)


def synthesize_ground_truth(
    atlas, strings: list[str], on_device: bool = False, synth_batch: int = 1024
) -> np.ndarray:
    """Ground-truth sheets for arbitrary strings, either atlas type.

    The rasterizer-defined rendering of ``strings`` — what a perfect model
    would output. Used for render-fidelity evaluation.

    ``on_device=True`` synthesizes in fixed-shape chunks through the
    f32/HIGHEST device einsum path instead of the single-core numpy
    oracle — the same 8-bit quantization grid (identical rounded-integer
    sheets; the float values can differ by one f32 ulp where XLA folds
    the /255 into a reciprocal multiply), minutes faster for large string
    sets (e.g. the 32k-sheet pixel fine-tune corpora in
    tools/train_placement.py).
    """
    import jax.numpy as _jnp

    from .atlas import GlyphAtlas

    if isinstance(atlas, GlyphAtlas):
        grids = encode_grids(
            strings, atlas.advance_table(), atlas.spec, atlas.n_lines, atlas.n_slots
        )
        if not on_device:
            from .sheets import synthesize_sheets_host

            return synthesize_sheets_host(atlas, grids)
        ops = make_synth_ops(atlas, _jnp.float32)
        synth = lambda part: synthesize_sheets(ops, _jnp.asarray(part))
    else:
        from .proportional import (
            _synth,
            encode_prop_grids,
            make_prop_placements,
        )

        grids = encode_prop_grids(strings, atlas)
        if not on_device:
            from .proportional import synthesize_prop_host

            return synthesize_prop_host(atlas, grids)
        col, row = make_prop_placements(atlas)
        table = _jnp.asarray(atlas.table, _jnp.float32)
        colj, rowj = _jnp.asarray(col, _jnp.float32), _jnp.asarray(row, _jnp.float32)
        synth = lambda part: _synth(table, colj, rowj, _jnp.asarray(part))

    n = len(grids)
    chunks = []
    for start in range(0, n, synth_batch):
        part = grids[start : start + synth_batch]
        pad = synth_batch - len(part)
        if pad and n > synth_batch:  # keep one compiled shape across chunks
            part = np.concatenate(
                [part, np.zeros((pad,) + part.shape[1:], part.dtype)]
            )
            chunks.append(np.asarray(synth(part))[: synth_batch - pad])
        else:
            chunks.append(np.asarray(synth(part)))
    return np.concatenate(chunks, axis=0)


def font_is_monospace(font_path: str, charset: str | None = None) -> bool:
    """True when the fixed-grid pipeline is exact for ``font_path``:
    one advance for every charset glyph AND no kern pairs (a
    fixed-advance font that kerns would still need the proportional pen
    walk). The one font-kind *detection*, shared by the CLI dispatch
    sites; :func:`bake_font_atlas` is the matching atlas switch.
    FiraCode: monospace (0 pairs); Montserrat: proportional (2533 pairs).
    """
    from ..config import PRINTABLE_ASCII, SheetSpec
    from .kerning import KerningTable
    from .ttf import TrueTypeFont

    charset = charset or PRINTABLE_ASCII
    font = TrueTypeFont.load(font_path)
    if len({font.advance(font.glyph_id(ord(c))) for c in charset}) != 1:
        return False
    return len(KerningTable(font_path, charset, SheetSpec().font_size)) == 0


def bake_font_atlas(font_path: str, proportional: bool = False):
    """Engine atlas for ``font_path``: the fixed-grid :class:`GlyphAtlas`
    by default, the proportional bearing/kerning atlas when
    ``proportional=True`` (Montserrat's pipeline).

    The one font-kind switch shared by the placement CLI, the artifact
    refresh tool, and the quality-lock tests.
    """
    if proportional:
        from .proportional import bake_prop_atlas

        return bake_prop_atlas(font_path)
    return bake_atlas(font_path)


def unit_ground_truth(atlas, strings: list[str]) -> np.ndarray:
    """float32 ground-truth sheets in [0, 1] for ``strings`` (either atlas
    type). Every synthesizer path (host numpy oracles and the device
    einsum) already returns unit-range floats quantized to the 8-bit grid
    (round(x*255)/255), so this is :func:`synthesize_ground_truth` as a
    plain np.float32 array — kept as the shared entry point for the
    render-fidelity evaluations."""
    return np.asarray(synthesize_ground_truth(atlas, strings), np.float32)


def load_string_dataset(
    data_dir: str = "train_input",
    num_samples: int = 50000,
    sheet_height: int = 80,
    sheet_width: int = 240,
    max_chars: int = 100,
) -> tuple[np.ndarray, np.ndarray]:
    """Load a disk dataset written in the reference's file contract.

    Equivalent of helpers.py:125-181: reads ``data.txt`` (line i ->
    ``(i+1).bmp``), errors the same way on short files, and returns
    (codes int32 [N, max_chars], targets float32 [N, H, W]). Exists for
    interop with datasets produced by the reference's generator or our
    ``fontgen`` export; on-device synthesis (build_device_dataset) is the
    native path and never touches disk.
    """
    from .bmp import read_bmp

    strings_path = os.path.join(data_dir, "data.txt")
    with open(strings_path) as f:
        strings = f.read().splitlines()
    if len(strings) < num_samples:
        raise ValueError(
            f"Not enough strings in {strings_path}. "
            f"Expected {num_samples}, got {len(strings)}"
        )
    targets = np.zeros((num_samples, sheet_height, sheet_width), np.float32)
    for i in range(num_samples):
        image_path = os.path.join(data_dir, f"{i + 1}.bmp")
        if not os.path.exists(image_path):
            raise FileNotFoundError(f"Image file not found: {image_path}")
        targets[i] = read_bmp(image_path)
    codes = encode_codes(strings[:num_samples], max_chars)
    return codes, targets


def device_dataset_from_disk(
    data_dir: str,
    num_samples: int,
    sheet_height: int = 80,
    sheet_width: int = 240,
    max_chars: int = 100,
) -> DeviceDataset:
    """Disk dataset -> device-resident uint8 tensors (training-ready)."""
    codes, targets = load_string_dataset(
        data_dir, num_samples, sheet_height, sheet_width, max_chars
    )
    u8 = np.round(targets * 255.0).astype(np.uint8)
    return DeviceDataset(codes=jnp.asarray(codes), targets_u8=jnp.asarray(u8))


def split_sizes(n: int, validation_split: float) -> tuple[int, int]:
    """(train_size, val_size) mirroring model.py:232-234."""
    val = int(validation_split * n)
    return n - val, val


def split_permutation(n: int, seed: int) -> np.ndarray:
    """Deterministic train/val split permutation.

    The reference uses torch.random_split with a seeded generator
    (model.py:239-242); the exact permutation is torch-internal, so we fix
    our own deterministic one (numpy PCG64 with the same seed) — behavioral
    parity (seeded 80/20 split), not bit parity, which no cross-framework
    rebuild can provide.
    """
    return np.random.default_rng(seed).permutation(n)
