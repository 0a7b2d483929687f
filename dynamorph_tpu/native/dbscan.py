"""ctypes wrapper for the native exact grid-DBSCAN (grid_dbscan.cpp).

Drop-in replacement for sklearn DBSCAN over integer pixel coordinates with
identical labels (see grid_dbscan.cpp header for the equivalence argument);
falls back to sklearn when the toolchain/binary is unavailable.
"""
from __future__ import annotations

import ctypes
import logging
import os
from typing import Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "grid_dbscan.cpp")
_LIB = os.path.join(_HERE, "libgrid_dbscan.so")


def _configure(lib: ctypes.CDLL) -> None:
    lib.grid_dbscan.restype = ctypes.c_int
    lib.grid_dbscan.argtypes = [
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_double, ctypes.c_int32,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    ]
    try:  # stale pre-rebuild binary without the threaded entry still works
        lib.grid_dbscan_mt.restype = ctypes.c_int
        lib.grid_dbscan_mt.argtypes = [
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_double, ctypes.c_int32, ctypes.c_int32,
            np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ]
        lib._has_mt = True
    except AttributeError:
        lib._has_mt = False


def _load():
    from . import load_native

    return load_native(_SRC, _LIB, _configure)


def native_dbscan_available() -> bool:
    return _load() is not None


def grid_dbscan(positions: np.ndarray, eps: float, min_samples: int,
                shape: Optional[Tuple[int, int]] = None,
                threads: Optional[int] = None) -> np.ndarray:
    """DBSCAN labels for UNIQUE integer (y, x) points.

    The occupancy grid keeps one index per pixel, so duplicate points would
    silently diverge from sklearn (shadowed duplicates become noise or
    spurious singletons); duplicates are detected and routed to the sklearn
    fallback instead. Falls back to sklearn too when the native library is
    unavailable.

    ``threads`` splits the per-point core test across host threads (labels
    are bit-identical for any count — see grid_dbscan.cpp); default
    min(8, cpu_count). The whole native call releases the GIL, so callers
    can additionally parallelize across frames.
    """
    positions = np.ascontiguousarray(positions, dtype=np.int32)
    n = len(positions)
    if n == 0:
        return np.zeros((0,), np.int32)
    lib = _load()
    if shape is None:
        shape = (int(positions[:, 0].max()) + 1,
                 int(positions[:, 1].max()) + 1)
    # uniqueness precondition, enforced: composite-key check is O(n log n)
    # against the solver's O(n * eps^2)
    keys = positions[:, 0].astype(np.int64) * shape[1] + positions[:, 1]
    unique = len(np.unique(keys)) == n
    if lib is None or not unique:
        from sklearn.cluster import DBSCAN

        if lib is not None and not unique:
            log.warning("grid_dbscan: duplicate points; using sklearn")
        return DBSCAN(eps=eps, min_samples=min_samples).fit(
            positions).labels_.astype(np.int32)
    labels = np.empty(n, np.int32)
    if threads is None:
        threads = min(8, os.cpu_count() or 1)
    if getattr(lib, "_has_mt", False):
        rc = lib.grid_dbscan_mt(positions, n, shape[0], shape[1], float(eps),
                                int(min_samples), int(threads), labels)
    else:
        rc = lib.grid_dbscan(positions, n, shape[0], shape[1], float(eps),
                             int(min_samples), labels)
    if rc != 0:
        from sklearn.cluster import DBSCAN

        log.warning("native grid-DBSCAN returned %d; falling back", rc)
        return DBSCAN(eps=eps, min_samples=min_samples).fit(
            positions).labels_.astype(np.int32)
    return labels
