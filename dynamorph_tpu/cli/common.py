"""Shared CLI plumbing: -m <method> -c <config> pattern (reference
run_*.py), site discovery, and well grouping.

The reference forks one OS process per GPU/CPU (run_VAE.py:10-25,
run_patch.py:11-22); on TPU a single process drives the device mesh, and
parallelism lives inside the jitted batch, so methods run sequentially over
wells/sites here.
"""
from __future__ import annotations

import argparse
import logging
import os
from typing import List, Optional, Sequence

from ..config import load_config
from ..io.sites import get_im_sites

logging.basicConfig(
    level=logging.INFO,
    format="[%(levelname)4s: %(module)s:%(lineno)4s %(asctime)s] %(message)s",
)


def add_multihost_args(parser: argparse.ArgumentParser) -> None:
    """Multi-host launch flags shared by every CLI.

    ``--multihost`` initialises JAX's multi-process runtime
    (core.mesh.init_multihost) before any device use; on TPU pods the
    coordinator/count/id are auto-detected, elsewhere pass them explicitly.
    Stage CLIs then slice their share-nothing work across processes
    (core.mesh.process_slice) — the reference's worker-per-GPU split
    (run_segmentation.py:74-84) lifted to hosts."""
    parser.add_argument("--multihost", action="store_true",
                        help="initialise the multi-process (multi-host) "
                             "runtime and shard work across processes")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="coordinator address host:port "
                             "(omit on TPU pods: auto-detected)")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)


def init_multihost_from_args(args) -> None:
    if getattr(args, "multihost", False):
        from ..core.mesh import init_multihost

        explicit = (args.coordinator, args.num_processes, args.process_id)
        if any(v is not None for v in explicit) and \
                any(v is None for v in explicit):
            # init_multihost only forwards the trio together; catching a
            # partial set here beats silently auto-detecting the topology
            raise SystemExit(
                "--coordinator, --num-processes and --process-id must be "
                "passed together (omit all three on TPU pods for "
                "auto-detection)")
        init_multihost(args.coordinator, args.num_processes, args.process_id)


def shard_work(items):
    """This process's slice of a share-nothing work list (identity when
    single-process); logs the ownership so fan-out is visible in stage
    logs."""
    import jax

    from ..core.mesh import is_multiprocess, process_slice

    items = list(items)
    mine = process_slice(items)
    if is_multiprocess():
        logging.getLogger(__name__).info(
            "process %d/%d owns %d of %d work items", jax.process_index(),
            jax.process_count(), len(mine), len(items))
    return mine


def parse_method_config(choices: Sequence[str], default: Optional[str] = None,
                        require_method: bool = True):
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--method", type=str,
                        required=require_method and default is None,
                        choices=list(choices), default=default,
                        help=f"Method: one of {list(choices)}")
    parser.add_argument("-c", "--config", type=str, required=True,
                        help="path to yaml configuration file")
    add_multihost_args(parser)
    args = parser.parse_args()
    # ORDER MATTERS: jax.distributed.initialize must run before ANY backend
    # use, and enable_persistent_cache touches jax.default_backend() when
    # JAX_PLATFORMS is unset — enabling the cache first would make
    # --multihost raise "initialize() must be called before any JAX
    # computations" on TPU pods
    init_multihost_from_args(args)
    # all CLIs route through here before any jit: enable the on-disk XLA
    # compile cache so repeated stage invocations skip recompilation
    # (DYNAMORPH_COMPILE_CACHE=0 opts out; core/compile_cache.py)
    from ..core.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    return args.method, load_config(args.config)


def resolve_sites(raw_dir: str, fov) -> List[str]:
    if fov and fov != "all":
        # fov may be a single site NAME (schema allows str): don't split a
        # string into characters
        return [fov] if isinstance(fov, str) else list(fov)
    return get_im_sites(raw_dir)


def segmented_sites(raw_dir: str, sites: Sequence[str]) -> List[str]:
    """Sites that have both the raw stack and NN probability outputs
    (reference run_patch.py:55-60)."""
    out = [s for s in sites
           if os.path.exists(os.path.join(raw_dir, f"{s}.npy"))
           and os.path.exists(os.path.join(raw_dir, f"{s}_NNProbabilities.npy"))]
    if not out:
        raise AttributeError(
            "no sites found in raw directory with preprocessed data and "
            "matching NNProbabilities")
    return out
