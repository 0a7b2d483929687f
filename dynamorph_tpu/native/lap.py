"""ctypes wrapper for the native Jonker-Volgenant LAP solver (lap.cpp).

Builds liblap.so with g++ on first use (cached next to the source). The
solver returns the same optimal assignment cost as
scipy.optimize.linear_sum_assignment; when multiple optima exist the chosen
permutation may differ, so parity-sensitive callers (track/matching) use
scipy by default and opt into the native solver for large instances where
the optimum is unique almost surely.
"""
from __future__ import annotations

import ctypes
import logging
import os
from typing import Tuple

import numpy as np

log = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "lap.cpp")
_LIB = os.path.join(_HERE, "liblap.so")


def _configure(lib: ctypes.CDLL) -> None:
    lib.lapjv.restype = ctypes.c_int
    lib.lapjv.argtypes = [
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.POINTER(ctypes.c_double),
    ]


def _load():
    from . import load_native

    return load_native(_SRC, _LIB, _configure)


def native_lap_available() -> bool:
    return _load() is not None


def lap_solve(cost: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Solve a square dense LAP. Returns (row_ind, col_ind) like scipy's
    linear_sum_assignment. Falls back to scipy if the native lib is absent
    or the solver rejects the instance (rc=3: non-finite costs)."""
    cost = np.ascontiguousarray(cost, dtype=np.float64)
    n = cost.shape[0]
    assert cost.shape == (n, n), "native LAP requires a square cost matrix"
    lib = _load()
    if lib is None:
        from scipy.optimize import linear_sum_assignment

        return linear_sum_assignment(cost)
    row_to_col = np.empty(n, dtype=np.int32)
    total = ctypes.c_double()
    rc = lib.lapjv(n, cost, row_to_col, ctypes.byref(total))
    if rc != 0:
        from scipy.optimize import linear_sum_assignment

        log.warning("native LAP returned %d; falling back to scipy", rc)
        return linear_sum_assignment(cost)
    return np.arange(n), row_to_col.astype(np.int64)
