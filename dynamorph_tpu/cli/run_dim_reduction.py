"""PCA/UMAP dimensionality reduction over latent vectors.

Usage: python -m dynamorph_tpu.cli.run_dim_reduction -m {pca,umap}
-c <config.yml>   (reference run_dim_reduction.py:314-345).
"""
from __future__ import annotations

from ..pipeline.dim_reduction import dim_reduction
from .common import parse_method_config


def main():
    method, config = parse_method_config(choices=["pca", "umap"],
                                         default="pca")
    from ..core.mesh import is_main_process, is_multiprocess

    try:
        if is_main_process():
            # the fit pools latents across ALL wells and the transform is
            # cheap — one process does it (multi-host runs: process 0)
            dr = config.dim_reduction
            dim_reduction(method, dr.input_dirs,
                          dr.output_dirs or dr.input_dirs,
                          dr.weights_dir, config)
    finally:
        if is_multiprocess():
            # every process reaches the barrier even if the fit raised on
            # process 0 (the error still propagates after the sync) —
            # otherwise the other hosts hang until the coordination timeout
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("dynamorph:dim-reduction")


if __name__ == "__main__":
    main()
