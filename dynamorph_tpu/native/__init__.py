"""Native (C++) host ops, compiled on first use with g++ into the package
directory:

- ``lap.cpp``   — Jonker-Volgenant dense LAP solver (tracking stage; falls
  back to scipy when unavailable).
- ``grid_dbscan.cpp`` — exact occupancy-grid DBSCAN over integer pixel
  coordinates (instance segmentation; falls back to sklearn).

``load_native`` is the shared build-on-first-use ctypes loader.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Callable, Optional

_log = logging.getLogger(__name__)
_lock = threading.Lock()
_cache: dict = {}


def load_native(src: str, lib_path: str,
                configure: Callable[[ctypes.CDLL], None]
                ) -> Optional[ctypes.CDLL]:
    """Build (if stale/missing) and load a native library, caching the
    result — including failure — per ``lib_path``.

    If a rebuild fails but a previously built binary exists, the existing
    binary is loaded (a stale checkout mtime must not disable the native
    path on machines without g++).
    """
    with _lock:
        if lib_path in _cache:
            return _cache[lib_path]
        name = os.path.basename(lib_path)
        if not os.path.exists(lib_path) or \
                os.path.getmtime(lib_path) < os.path.getmtime(src):
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-pthread",
                     "-o", lib_path, src],
                    check=True, capture_output=True)
            except Exception as e:
                if os.path.exists(lib_path):
                    _log.warning(
                        "rebuild of %s failed (%s); loading the existing "
                        "binary", name, e)
                else:
                    _log.warning("build of %s failed (%s); native path "
                                 "disabled", name, e)
                    _cache[lib_path] = None
                    return None
        lib = None
        try:
            lib = ctypes.CDLL(lib_path)
            configure(lib)
        except Exception as e:
            _log.warning("load of %s failed (%s); native path disabled",
                         name, e)
            lib = None
        _cache[lib_path] = lib
        return lib


from .dbscan import grid_dbscan, native_dbscan_available  # noqa: E402
from .lap import lap_solve, native_lap_available  # noqa: E402
