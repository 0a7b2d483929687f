"""Persistent XLA compilation cache for CLI/bench entry points.

Every distinct jitted program in this stack (U-Net, VQ-VAE encode, train
step, ...) costs a fresh XLA compile per process — 15-40 s each through a
remote-compile relay, seconds on a normal host. JAX's persistent
compilation cache keys compiled executables by HLO fingerprint on disk, so
repeated CLI invocations (the reference workflow runs five separate
run_*.py processes per experiment) skip recompilation entirely.

Measured in this environment: second-process ``model.init`` 16.0 -> 4.3 s
and encode compile 3.3 -> 1.0 s.

Opt-out / redirect with the ``DYNAMORPH_COMPILE_CACHE`` env var: ``0`` /
``off`` disables; any other non-empty value is used as the cache dir.
"""
from __future__ import annotations

import logging
import os
from typing import Optional

log = logging.getLogger(__name__)

_DISABLE_VALUES = ("0", "off", "false", "no")


def enable_persistent_cache(cache_dir: Optional[str] = None,
                            allow_cpu: bool = False) -> Optional[str]:
    """Point jax at an on-disk compilation cache. Returns the cache dir, or
    None if disabled/unsupported. Call before the first jit compilation.

    Skipped on a CPU-pinned backend unless ``allow_cpu``: XLA:CPU AOT cache
    reloads warn about machine-feature mismatches (spurious
    pseudo-features) with a possible-SIGILL caveat — and CPU compiles are
    fast anyway."""
    env = os.environ.get("DYNAMORPH_COMPILE_CACHE", "")
    if env.lower() in _DISABLE_VALUES:
        return None
    cache_dir = cache_dir or env or os.path.join(
        os.path.expanduser("~"), ".cache", "dynamorph_tpu", "xla")
    try:
        import jax

        if not allow_cpu:
            platforms = getattr(jax.config, "jax_platforms", None) or ""
            if platforms.startswith("cpu"):
                return None
            # platforms unset: JAX may still fall back to CPU (no
            # accelerator plugin) — resolve the actual backend before
            # enabling (initializes it, which the caller needs anyway)
            if not platforms and jax.default_backend() == "cpu":
                return None
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache even fast compiles: the relay round trip dominates, not
        # XLA's own compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception as ex:  # unsupported backend/readonly fs: soft-skip
        log.debug("persistent compile cache unavailable: %s", ex)
        return None
    return cache_dir
