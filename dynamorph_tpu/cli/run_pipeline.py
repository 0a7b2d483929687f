"""Run the whole pipeline (or a span of stages) with one command.

Usage:
    python -m dynamorph_tpu.cli.run_pipeline -c <config.yml> \
        [--stages segmentation instance_segmentation ...] [--no-resume]

Directories come from the ``patch`` section (raw_dirs/supp_dirs); stages
default to the full graph (see pipeline/orchestrator.py).
"""
from __future__ import annotations

import argparse

from ..config import load_config
from ..pipeline.orchestrator import STAGES, run_pipeline
from .common import resolve_sites


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, required=True)
    parser.add_argument("--stages", nargs="*", default=None,
                        choices=STAGES, help="subset of stages to run")
    parser.add_argument("--no-resume", action="store_true",
                        help="re-run stages even if outputs exist")
    parser.add_argument("--fused", action="store_true",
                        help="device-resident fused seg->instance->patch "
                             "front-end (overrides patch.fused)")
    from .common import add_multihost_args, init_multihost_from_args

    add_multihost_args(parser)
    args = parser.parse_args()
    # the orchestrator fans wells out across processes by itself
    # (pipeline/orchestrator.py); this only boots the runtime. It MUST run
    # before the compile cache below (which touches the backend).
    init_multihost_from_args(args)
    from ..core.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    config = load_config(args.config)
    if args.fused:
        config.patch.fused = True

    for raw_dir, supp_dir in zip(config.patch.raw_dirs,
                                 config.patch.supp_dirs):
        sites = resolve_sites(raw_dir, config.patch.fov)
        executed = run_pipeline(raw_dir, supp_dir, sites, config,
                                stages=args.stages,
                                resume=not args.no_resume)
        print(f"{raw_dir}: executed stages {executed}")


if __name__ == "__main__":
    main()
