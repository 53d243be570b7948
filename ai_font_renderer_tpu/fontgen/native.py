"""ctypes bridge to the native C++ batch rasterizer.

Builds ``native/rasterizer.cpp`` into a shared library on first use (g++ -O3)
and exposes :func:`rasterize_batch`. Falls back transparently to the pure
Python implementation in :mod:`.raster` when a compiler is unavailable, so the
framework stays importable everywhere; the native path is the default because
atlas baking rasterizes thousands of subpixel glyph variants.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIBS: dict[str, ctypes.CDLL | None] = {}

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")


def _build_and_load(name: str) -> ctypes.CDLL | None:
    """Compile native/<name>.cpp to lib<name>.so (cached) and dlopen it."""
    src = os.path.join(_NATIVE_DIR, f"{name}.cpp")
    so = os.path.join(_NATIVE_DIR, f"lib{name}.so")
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        try:
            if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
                subprocess.run(
                    [
                        "g++",
                        "-O3",
                        "-march=native",
                        "-shared",
                        "-fPIC",
                        "-std=c++17",
                        src,
                        "-o",
                        so,
                    ],
                    check=True,
                    capture_output=True,
                )
            _LIBS[name] = ctypes.CDLL(so)
        except (subprocess.CalledProcessError, OSError):
            _LIBS[name] = None
        return _LIBS[name]


def _load() -> ctypes.CDLL | None:
    lib = _build_and_load("rasterizer")
    if lib is not None and not hasattr(lib, "_configured"):
        lib.rasterize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.rasterize_batch.restype = None
        lib._configured = True
    return lib


def native_available() -> bool:
    return _load() is not None


def corpus_available() -> bool:
    return _build_and_load("corpus") is not None


def generate_corpus_grids(
    num_samples: int,
    base_seed: int,
    min_len: int,
    max_len: int,
    advance_px: float,
    max_width: int,
    n_lines: int,
    n_slots: int,
    max_chars: int,
) -> tuple[np.ndarray, np.ndarray] | None:
    """Native LCG corpus + monospace grid layout; None if no toolchain.

    Bit-exact twin of textgen.generate_corpus + layout.encode_codes/
    encode_grids (locked by tests); ~100x faster for the 150k build.
    """
    lib = _build_and_load("corpus")
    if lib is None:
        return None
    if not hasattr(lib, "_configured"):
        lib.generate_corpus_grids.argtypes = [
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_double,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int16),
        ]
        lib.generate_corpus_grids.restype = None
        lib._configured = True
    codes = np.zeros((num_samples, max_chars), np.int32)
    grids = np.zeros((num_samples, n_lines, n_slots), np.int16)
    lib.generate_corpus_grids(
        num_samples,
        base_seed,
        min_len,
        max_len,
        advance_px,
        max_width,
        n_lines,
        n_slots,
        max_chars,
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        grids.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
    )
    return codes, grids


def rasterize_batch(
    segments: np.ndarray, item_offsets: np.ndarray, width: int, height: int
) -> np.ndarray:
    """Rasterize a batch of segment lists into coverage images.

    Args:
      segments: float32 [M, 4] device-space (x0, y0, x1, y1), y-down.
      item_offsets: int64 [N+1]; item i owns segments[offsets[i]:offsets[i+1]].
      width, height: output raster size per item.

    Returns:
      float32 [N, height, width] coverage in [0, 1].
    """
    segments = np.ascontiguousarray(segments, np.float32)
    item_offsets = np.ascontiguousarray(item_offsets, np.int64)
    n = len(item_offsets) - 1
    lib = _load()
    if lib is None:
        from .raster import rasterize_segments

        out = np.zeros((n, height, width), np.float32)
        for i in range(n):
            segs = segments[item_offsets[i] : item_offsets[i + 1]]
            out[i] = rasterize_segments(segs, width, height)
        return out

    out = np.zeros((n, height, width), np.float32)
    lib.rasterize_batch(
        segments.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        item_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        width,
        height,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
