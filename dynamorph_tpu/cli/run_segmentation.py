"""Semantic/instance segmentation + validation.

Usage: python -m dynamorph_tpu.cli.run_segmentation -m {segmentation,
instance_segmentation,segmentation_validation} -c <config.yml>
(reference run_segmentation.py).

The reference forks one process per GPU with sites linspace-sharded
(run_segmentation.py:74-84); on TPU the batch dimension of the tile batches
carries the parallelism, so sites run sequentially through the device.
"""
from __future__ import annotations

from ..pipeline.patch import instance_segmentation
from ..pipeline.segmentation import segmentation, segmentation_validation
from .common import parse_method_config, resolve_sites, shard_work

METHODS = {
    "segmentation": segmentation,
    "instance_segmentation":
        lambda raw, supp, val, sites, cfg: instance_segmentation(
            raw, supp, sites, cfg),
    "segmentation_validation": segmentation_validation,
}


def main():
    method, config = parse_method_config(choices=list(METHODS))
    si = config.segmentation_inference
    triples = zip(si.raw_dirs, si.supp_dirs,
                  si.validation_dirs or [None] * len(si.raw_dirs))
    for raw_dir, supp_dir, val_dir in triples:
        # multi-host: static per-site split (reference linspace split,
        # run_segmentation.py:74-84); sites are share-nothing here
        sites = shard_work(resolve_sites(raw_dir, si.fov))
        METHODS[method](raw_dir, supp_dir, val_dir, sites, config)


if __name__ == "__main__":
    main()
