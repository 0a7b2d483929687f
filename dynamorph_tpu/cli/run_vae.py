"""VAE dataset assembly / latent encoding / trajectory matching.

Usage: python -m dynamorph_tpu.cli.run_vae -m {assemble,process,
trajectory_matching} -c <config.yml>   (reference run_VAE.py).

Note: like the reference (run_VAE.py:21), `assemble` forces
patch_type='mat'; config patch_type applies elsewhere.
"""
from __future__ import annotations

from ..io.sites import group_sites_by_well
from ..pipeline.patch_vae import assemble_vae, process_vae, trajectory_matching
from .common import parse_method_config, resolve_sites, shard_work


def run_for_dirs(method: str, raw_dir: str, supp_dir: str, config) -> None:
    le = config.latent_encoding
    if method in ("assemble", "trajectory_matching") and not supp_dir:
        raise AttributeError(
            f"supplementary directory must be specified when method = {method}")
    if method == "process" and not le.weights:
        raise AttributeError(
            "VQ-VAE weights path must be specified when method = process")

    sites = resolve_sites(raw_dir, le.fov)
    all_wells = group_sites_by_well(sites)
    # multi-host: static WELL split — every method here is per-well
    # share-nothing (reference round-robins wells over GPU workers,
    # run_VAE.py:73-85)
    wells = {w: all_wells[w] for w in shard_work(sorted(all_wells))}
    if method == "assemble":
        for well_sites in wells.values():
            assemble_vae(raw_dir, supp_dir, well_sites, config,
                         patch_type="mat")
    elif method == "process":
        # prefetch the next well's pickles while this one encodes, and
        # drain this well's latent pickle saves on a writer thread while
        # the next well encodes
        from ..io.prefetch import AsyncWriter, Prefetcher
        from ..pipeline.patch_vae import load_well_inputs

        prefetched = Prefetcher(
            wells.items(),
            lambda kv: load_well_inputs(raw_dir, kv[0]))
        with AsyncWriter(depth=2) as writer:
            for (well, well_sites), preloaded in prefetched:
                process_vae(raw_dir, supp_dir, well_sites, config,
                            preloaded=preloaded, writer=writer)
    elif method == "trajectory_matching":
        for well_sites in wells.values():
            trajectory_matching(raw_dir, supp_dir, well_sites, config)


def main():
    method, config = parse_method_config(
        choices=["assemble", "process", "trajectory_matching"])
    for raw_dir, supp_dir in zip(config.latent_encoding.raw_dirs,
                                 config.latent_encoding.supp_dirs):
        run_for_dirs(method, raw_dir, supp_dir, config)


if __name__ == "__main__":
    main()
