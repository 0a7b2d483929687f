"""Preprocess raw TIFFs into (T, 3, 1, Y, X) npy stacks.

Usage: python -m dynamorph_tpu.cli.run_preproc -c <config.yml>
(reference run_preproc.py).
"""
from __future__ import annotations

from ..pipeline.preprocess import run_preprocess
from .common import parse_method_config


def main():
    _, config = parse_method_config(choices=["preprocess"],
                                    default="preprocess",
                                    require_method=False)
    for src, target in zip(config.preprocess.image_dirs,
                           config.preprocess.target_dirs):
        run_preprocess(src, target, config)


if __name__ == "__main__":
    main()
