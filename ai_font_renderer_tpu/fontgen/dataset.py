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
from .atlas import GlyphAtlas
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
) -> DeviceDataset:
    """Corpus -> device tensors, synthesizing all targets on-device once."""
    codes, grids = build_layouts(atlas, num_samples, base_seed, cache_dir)
    ops = make_synth_ops(atlas)

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
