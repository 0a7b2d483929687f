"""Patch extraction / trajectory building.

Usage: python -m dynamorph_tpu.cli.run_patch -m {extract_patches,
build_trajectories} -c <config.yml>   (reference run_patch.py).
"""
from __future__ import annotations

from ..pipeline.patch import build_trajectories, extract_patches
from .common import (parse_method_config, resolve_sites, segmented_sites,
                     shard_work)


def run_for_dirs(method: str, raw_dir: str, supp_dir: str, config) -> None:
    if method == "extract_patches" and not raw_dir:
        raise AttributeError(
            "raw directory must be specified when method = extract_patches")
    if not supp_dir:
        raise AttributeError(
            f"supplementary directory must be specified when method = {method}")
    # multi-host: static per-site split (reference num_cpus split,
    # run_patch.py:61-72); both methods are per-site share-nothing
    sites = shard_work(
        segmented_sites(raw_dir, resolve_sites(raw_dir, config.patch.fov)))
    if method == "extract_patches":
        extract_patches(raw_dir, supp_dir, sites, config)
    elif method == "build_trajectories":
        build_trajectories(raw_dir, supp_dir, sites, config)


def main():
    method, config = parse_method_config(
        choices=["extract_patches", "build_trajectories"],
        default="extract_patches")
    for raw_dir, supp_dir in zip(config.patch.raw_dirs,
                                 config.patch.supp_dirs):
        run_for_dirs(method, raw_dir, supp_dir, config)


if __name__ == "__main__":
    main()
