"""Native (C++) host-runtime components, loaded via ctypes.

Compiled on first use with g++ into the package directory; every entry
point has a pure-numpy fallback so the framework degrades gracefully on
hosts without a toolchain. The kernels here run on the host CPU each step
(while the TPU computes), so they are written as single-pass C++.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libsampling.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", str(_LIB_PATH),
             str(_DIR / "sampling.cpp")],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.sample_mask_batch.restype = ctypes.c_int32
        lib.sample_mask_batch.argtypes = [
            i32p, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_uint64,
            i32p, i32p, u8p, u8p, i32p, u8p,
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def sample_mask_batch(
    mask: np.ndarray, g: int, p: int, s: int, seed: int
) -> Optional[Tuple[np.ndarray, ...]]:
    """C++ fast path for the datamanager's per-step sampling. Returns
    (pair_a, pair_b, pair_valid, group_valid, points, point_valid) or None
    when the native library is unavailable."""
    lib = load()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, np.int32)
    h, w = mask.shape
    pair_a = np.zeros((g, p, 2), np.int32)
    pair_b = np.zeros((g, p, 2), np.int32)
    pair_valid = np.zeros((g, p), np.uint8)
    group_valid = np.zeros((g,), np.uint8)
    points = np.zeros((s, 2), np.int32)
    point_valid = np.zeros((s,), np.uint8)

    def ptr(a, t):
        return a.ctypes.data_as(ctypes.POINTER(t))

    lib.sample_mask_batch(
        ptr(mask, ctypes.c_int32), h, w, g, p, s,
        ctypes.c_uint64(seed or 1),
        ptr(pair_a, ctypes.c_int32), ptr(pair_b, ctypes.c_int32),
        ptr(pair_valid, ctypes.c_uint8), ptr(group_valid, ctypes.c_uint8),
        ptr(points, ctypes.c_int32), ptr(point_valid, ctypes.c_uint8),
    )
    return (
        pair_a, pair_b, pair_valid.astype(bool), group_valid.astype(bool),
        points, point_valid.astype(bool),
    )
