"""ctypes wrapper for the native exact grid-DBSCAN (grid_dbscan.cpp).

Drop-in replacement for sklearn DBSCAN over integer pixel coordinates with
identical labels (see grid_dbscan.cpp header for the equivalence argument);
falls back to sklearn when the toolchain/binary is unavailable.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

log = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "grid_dbscan.cpp")
_LIB = os.path.join(_HERE, "libgrid_dbscan.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB) or \
                os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
                    check=True, capture_output=True)
            except Exception as e:
                log.warning("native grid-DBSCAN build failed (%s); "
                            "using sklearn", e)
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
            lib.grid_dbscan.restype = ctypes.c_int
            lib.grid_dbscan.argtypes = [
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
                ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_double, ctypes.c_int32,
                np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
            ]
            _lib = lib
        except Exception as e:
            log.warning("native grid-DBSCAN load failed (%s); using sklearn",
                        e)
            _build_failed = True
    return _lib


def native_dbscan_available() -> bool:
    return _load() is not None


def grid_dbscan(positions: np.ndarray, eps: float, min_samples: int,
                shape: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """DBSCAN labels for unique integer (y, x) points.

    Falls back to sklearn when the native library is unavailable.
    """
    positions = np.ascontiguousarray(positions, dtype=np.int32)
    n = len(positions)
    if n == 0:
        return np.zeros((0,), np.int32)
    lib = _load()
    if lib is None:
        from sklearn.cluster import DBSCAN

        return DBSCAN(eps=eps, min_samples=min_samples).fit(
            positions).labels_.astype(np.int32)
    if shape is None:
        shape = (int(positions[:, 0].max()) + 1,
                 int(positions[:, 1].max()) + 1)
    labels = np.empty(n, np.int32)
    rc = lib.grid_dbscan(positions, n, shape[0], shape[1], float(eps),
                         int(min_samples), labels)
    if rc != 0:
        from sklearn.cluster import DBSCAN

        log.warning("native grid-DBSCAN returned %d; falling back", rc)
        return DBSCAN(eps=eps, min_samples=min_samples).fit(
            positions).labels_.astype(np.int32)
    return labels
