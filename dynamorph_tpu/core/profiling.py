"""Tracing / profiling hooks.

The reference has no profiling at all (SURVEY.md §5); this provides the two
tools the rebuild uses:
- ``stage_timer``: per-stage wall-clock timing appended to a JSONL file (set
  ``DYNAMORPH_TIMING_LOG`` or pass a path), used by the pipeline CLIs.
- ``device_trace``: context manager around ``jax.profiler.trace`` for
  XLA/TPU timeline capture (view with TensorBoard or xprof).
"""
from __future__ import annotations

import contextlib
import json
import logging
import os
import time
from typing import Iterator, Optional

log = logging.getLogger(__name__)


@contextlib.contextmanager
def stage_timer(stage: str, log_path: Optional[str] = None,
                **metadata) -> Iterator[None]:
    """Time a pipeline stage; append {stage, seconds, ...} to the timing log."""
    path = log_path or os.environ.get("DYNAMORPH_TIMING_LOG")
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        log.info("[timing] %s: %.3fs", stage, dt)
        if path:
            try:
                rec = {"stage": stage, "seconds": round(dt, 4),
                       "time": time.time(), **metadata}
                with open(path, "a") as f:
                    f.write(json.dumps(rec) + "\n")
            except Exception as e:   # telemetry must never mask the
                log.warning("timing log write failed: %s", e)  # stage error


@contextlib.contextmanager
def device_trace(trace_dir: Optional[str] = None) -> Iterator[None]:
    """Capture a jax profiler trace when ``trace_dir`` (or
    ``DYNAMORPH_TRACE_DIR``) is set; no-op otherwise."""
    trace_dir = trace_dir or os.environ.get("DYNAMORPH_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
