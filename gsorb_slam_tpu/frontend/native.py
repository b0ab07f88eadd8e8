"""ctypes bindings for the native host-runtime library (``native/``).

The reference's host runtime is C++ end to end; here the host-sequential
kernels (exact quad-tree keypoint distribution, timestamp association) are
native with transparent Python fallbacks when the library isn't built
(``native/build.sh``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    native_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native",
    )
    path = os.path.join(native_dir, "libgsorb_native.so")
    src = os.path.join(native_dir, "gsorb_native.cpp")
    stale = (
        os.path.exists(path)
        and os.path.exists(src)
        and os.path.getmtime(src) > os.path.getmtime(path)
    )
    if not os.path.exists(path) or stale:
        # Build on first use and whenever the source is NEWER than the
        # binary (the .so is unversioned; a stale prebuilt can lack symbols
        # added later — ADVICE r4): ~1s with g++.
        if os.path.exists(src):
            import subprocess

            try:
                subprocess.run(
                    ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", src,
                     "-o", path],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                if stale:
                    # keep whatever symbols the old binary has; the
                    # try/except below degrades missing ones to fallbacks
                    pass
                else:
                    return None
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.quadtree_distribute.restype = ctypes.c_int
    lib.quadtree_distribute.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.associate_timestamps.restype = ctypes.c_int
    lib.associate_timestamps.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int,
        ctypes.c_double, ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
    ]
    try:
        lib.exact_knn3.restype = ctypes.c_int
        lib.exact_knn3.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ]
    except AttributeError:
        # Stale prebuilt .so without the symbol: degrade that one entry
        # point to its Python fallback instead of crashing every native
        # caller (ADVICE r4 medium).
        pass
    _LIB = lib
    return lib


def have_native() -> bool:
    return _load() is not None


def quadtree_distribute(
    x: np.ndarray, y: np.ndarray, response: np.ndarray, n_keep: int,
    bounds: tuple[float, float, float, float] | None = None,
) -> np.ndarray:
    """Exact ORB quad-tree spatial balancing -> boolean keep mask.

    Falls back to best-response top-k when the native library is absent.
    """
    n = len(x)
    lib = _load()
    if lib is None or n == 0:
        keep = np.zeros(n, bool)
        keep[np.argsort(-response)[:n_keep]] = True
        return keep
    x = np.ascontiguousarray(x, np.float32)
    y = np.ascontiguousarray(y, np.float32)
    r = np.ascontiguousarray(response, np.float32)
    if bounds is None:
        bounds = (float(x.min()), float(y.min()), float(x.max()) + 1, float(y.max()) + 1)
    keep = np.zeros(n, np.uint8)
    lib.quadtree_distribute(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        y.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        r.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, bounds[0], bounds[1], bounds[2], bounds[3], n_keep,
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return keep.astype(bool)


def associate_timestamps_native(
    a: np.ndarray, b: np.ndarray, max_dt: float = 0.02
) -> list[tuple[int, int]]:
    lib = _load()
    if lib is None:
        from gsorb_slam_tpu.slam.dataset import associate_timestamps

        return associate_timestamps(a, b, max_dt)
    a = np.ascontiguousarray(a, np.float64)
    b = np.ascontiguousarray(b, np.float64)
    out = np.zeros(2 * len(a), np.int32)
    n = lib.associate_timestamps(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(a),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(b),
        max_dt, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(a),
    )
    return [(int(out[2 * i]), int(out[2 * i + 1])) for i in range(n)]


def exact_knn3_native(pts: np.ndarray, valid: np.ndarray) -> np.ndarray | None:
    """Exact 3-NN mean squared distance among valid points (the
    simple_knn/distCUDA2 contract, ``src/simple_knn.cu:45-221``) via the
    native grid search. Returns None when the library is absent."""
    lib = _load()
    if lib is None or not hasattr(lib, "exact_knn3"):
        return None
    pts = np.ascontiguousarray(pts, np.float32)
    v = np.ascontiguousarray(valid, np.uint8)
    out = np.zeros(len(pts), np.float32)
    lib.exact_knn3(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(pts),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
