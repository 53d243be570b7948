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
_LIB: ctypes.CDLL | None = None
_BUILD_FAILED = False

_SRC = os.path.join(os.path.dirname(__file__), "native", "rasterizer.cpp")
_SO = os.path.join(os.path.dirname(__file__), "native", "librasterizer.so")


def _load() -> ctypes.CDLL | None:
    global _LIB, _BUILD_FAILED
    with _LOCK:
        if _LIB is not None or _BUILD_FAILED:
            return _LIB
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
                _SRC
            ):
                subprocess.run(
                    [
                        "g++",
                        "-O3",
                        "-march=native",
                        "-shared",
                        "-fPIC",
                        "-std=c++17",
                        _SRC,
                        "-o",
                        _SO,
                    ],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
            lib.rasterize_batch.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_float),
            ]
            lib.rasterize_batch.restype = None
            _LIB = lib
        except (subprocess.CalledProcessError, OSError):
            _BUILD_FAILED = True
        return _LIB


def native_available() -> bool:
    return _load() is not None


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
