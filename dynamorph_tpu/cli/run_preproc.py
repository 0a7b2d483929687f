"""Preprocess raw TIFFs into (T, 3, 1, Y, X) npy stacks.

Usage: python -m dynamorph_tpu.cli.run_preproc -c <config.yml>
(reference run_preproc.py).
"""
from __future__ import annotations

from ..pipeline.preprocess import discover_sites, run_preprocess
from .common import parse_method_config, shard_work


def main():
    _, config = parse_method_config(choices=["preprocess"],
                                    default="preprocess",
                                    require_method=False)
    pp = config.preprocess
    for src, target in zip(pp.image_dirs, pp.target_dirs):
        # multi-host fan-out: static site split across processes (reference
        # run_preproc.py:96-119 forks workers over sites); discovery runs
        # once and the sliced mapping is handed straight through
        discovered = discover_sites(src, pp.fov, pp.pos_dir)
        mine = shard_work(sorted(discovered, key=str))
        run_preprocess(src, target, config,
                       sites={k: discovered[k] for k in mine})


if __name__ == "__main__":
    main()
