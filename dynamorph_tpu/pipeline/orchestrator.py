"""One-command pipeline orchestration.

The reference chains five CLIs by hand through intermediate files
(README.md:111-142); this driver runs any contiguous span of stages for an
experiment with per-stage timing, skip-if-output-exists idempotence, and
per-site failure tolerance — the framework's "stage graph" in one place.

Stage order: segmentation -> instance_segmentation -> extract_patches ->
build_trajectories -> assemble -> process -> trajectory_matching -> pca.
(Preprocessing runs separately via run_preproc: it maps over different
directories.)
"""
from __future__ import annotations

import logging
import os
from typing import List, Optional, Sequence

from ..core.profiling import stage_timer
from ..io.sites import group_sites_by_well
from .patch import build_trajectories, extract_patches, instance_segmentation
from .patch_vae import assemble_vae, process_vae, trajectory_matching
from .segmentation import segmentation

log = logging.getLogger(__name__)

STAGES = ["segmentation", "instance_segmentation", "extract_patches",
          "build_trajectories", "assemble", "process",
          "trajectory_matching", "pca"]


def _well_outputs_exist(raw_dir: str, well: str, names: Sequence[str]) -> bool:
    from ..io.compact import resolve_any

    # artifacts may exist in either storage format (.pkl / .npz)
    return all(os.path.exists(resolve_any(os.path.join(raw_dir, f"{well}{n}")))
               for n in names)


def run_pipeline(raw_dir: str, supp_dir: str, sites: Sequence[str], config,
                 stages: Optional[Sequence[str]] = None,
                 resume: bool = True) -> List[str]:
    """Run the stage graph over one experiment directory.

    Args:
        stages: subset of STAGES to run (default: all).
        resume: skip stages whose outputs already exist.

    Returns the list of stages actually executed.
    """
    stages = list(stages) if stages else list(STAGES)
    unknown = set(stages) - set(STAGES)
    if unknown:
        raise ValueError(f"unknown stages {sorted(unknown)}; "
                         f"available: {STAGES}")
    executed = []

    # Multi-host fan-out: under a multi-process runtime (core.mesh.
    # init_multihost), each process owns a static slice of WELLS — every
    # stage of a well runs on the process that owns it, sharded over that
    # process's local devices (the stage meshes are local, core/mesh.py::
    # local_mesh). Well granularity keeps site-level stages (segmentation/
    # patch) and well-level stages (assemble/process) coherent without any
    # cross-host barrier until the pooled PCA fit. This is the reference's
    # worker-per-GPU static split (run_segmentation.py:74-84,
    # run_VAE.py:73-85) lifted to hosts.
    import jax

    from ..core.mesh import is_main_process, is_multiprocess

    multiproc = is_multiprocess()
    if multiproc:
        from ..core.mesh import process_slice

        all_wells = group_sites_by_well(sites)
        my_wells = process_slice(sorted(all_wells))
        sites = [s for w in sorted(all_wells) if w in my_wells
                 for s in all_wells[w]]
        log.info("[pipeline] process %d/%d owns wells %s (%d sites)",
                 jax.process_index(), jax.process_count(), my_wells,
                 len(sites))

    stage_error: Optional[BaseException] = None

    def run(stage: str, fn, skip_if=None):
        nonlocal stage_error
        if stage not in stages or stage_error is not None:
            return
        if resume and skip_if is not None and skip_if():
            log.info("[pipeline] %s: outputs exist, skipping", stage)
            return
        log.info("[pipeline] running %s", stage)
        try:
            with stage_timer(stage):
                fn()
        except Exception as e:
            if not multiproc:
                raise
            # multi-host: a raise here would skip the PCA barriers and hang
            # every other process until the coordination timeout — record,
            # skip the remaining stages, walk the barriers, THEN re-raise
            stage_error = e
            log.error("[pipeline] %s failed on process %d: %s — deferring "
                      "re-raise until after the cross-process barriers",
                      stage, jax.process_index(), e)
            return
        executed.append(stage)

    wells = group_sites_by_well(sites)
    from ..io.sites import site_supp_folder

    front_end = {"segmentation", "instance_segmentation", "extract_patches"}
    fused = bool(getattr(config.patch, "fused", False)) and \
        front_end <= set(stages)
    if getattr(config.patch, "fused", False) and not fused and \
            front_end & set(stages):
        log.warning(
            "patch.fused requested but stages %s are missing %s — running "
            "the STAGED front-end instead (the fused stage replaces all "
            "three)", sorted(front_end & set(stages)),
            sorted(front_end - set(stages)))
    # streaming mode (latent_encoding.streaming + patch.fused): the fused
    # front-end, assemble's resize, and process_VAE's encode collapse into
    # ONE pass with patches HBM-resident throughout (pipeline/stream.py);
    # only the trajectory-relation half of assemble remains as its own
    # stage (it needs build_trajectories' cell_traj.pkl first).
    streaming = fused and \
        bool(getattr(config.latent_encoding, "streaming", False)) and \
        {"assemble", "process"} <= set(stages)
    if fused and not streaming and \
            getattr(config.latent_encoding, "streaming", False):
        log.warning(
            "latent_encoding.streaming requested but stages are missing "
            "%s — running the fused front-end + staged assemble/process "
            "instead", sorted({"assemble", "process"} - set(stages)))
    if streaming and "VAE" not in config.latent_encoding.network:
        # the streaming encoder is VAE-family only (pipeline/stream.py);
        # ResNet encoders normalize on host in process_vae's own branch
        log.warning(
            "latent_encoding.streaming requested but network '%s' has no "
            "streaming encode — running the fused front-end + staged "
            "assemble/process instead", config.latent_encoding.network)
        streaming = False
    if streaming:
        stages = ["seg_patch_stream"] + [s for s in stages
                                         if s not in front_end and
                                         s != "process"]
        from .patch_vae import resolve_latent_weights
        from .stream import seg_patch_stream

        def _latents_exist(well: str) -> bool:
            _, _, model_name = resolve_latent_weights(
                config.latent_encoding)
            from ..io.compact import resolve_any

            return all(os.path.exists(resolve_any(
                os.path.join(raw_dir, model_name, f"{well}{n}")))
                for n in ("_latent_space.pkl", "_latent_space_after.pkl"))

        def _stream_all():
            # rerun=True always: the encoder consumes patches from the live
            # frame hook, so skipping completed sites would stream nothing
            # for them; whole-stage resume is the skip_if below.
            seg_patch_stream(
                raw_dir, supp_dir, sites, config, rerun=True,
                site_parallelism=getattr(config.patch,
                                         "fused_site_parallelism", None),
                patch_type="mat")

        run("seg_patch_stream", _stream_all,
            skip_if=lambda: all(
                _well_outputs_exist(raw_dir, w, ["_static_patches.pkl",
                                                 "_file_paths.pkl"]) and
                _latents_exist(w) for w in wells))
    elif fused:
        stages = ["seg_patch_fused"] + [s for s in stages
                                        if s not in front_end]
        # device-resident fast path: the three front-end stages run as one
        # program chain per frame with HBM-resident hand-off
        # (pipeline/fused.py); artifacts are identical, so downstream
        # stages and resume semantics are unchanged.
        from .fused import seg_patch_fused

        def _fused_all():
            seg_patch_fused(
                raw_dir, supp_dir, sites, config, rerun=not resume,
                site_parallelism=getattr(config.patch,
                                         "fused_site_parallelism", None))

        run("seg_patch_fused", _fused_all,
            skip_if=lambda: all(
                os.path.exists(os.path.join(site_supp_folder(supp_dir, s),
                                            "cell_positions.pkl"))
                for s in sites))
    else:
        run("segmentation",
            lambda: segmentation(raw_dir, supp_dir, None, sites, config),
            skip_if=lambda: all(
                os.path.exists(
                    os.path.join(raw_dir, f"{s}_NNProbabilities.npy"))
                for s in sites))
        run("instance_segmentation",
            lambda: instance_segmentation(raw_dir, supp_dir, sites, config,
                                          rerun=not resume),
            skip_if=lambda: all(
                os.path.exists(os.path.join(site_supp_folder(supp_dir, s),
                                            "cell_positions.pkl"))
                for s in sites))
        run("extract_patches",
            lambda: extract_patches(raw_dir, supp_dir, sites, config))
    run("build_trajectories",
        lambda: build_trajectories(raw_dir, supp_dir, sites, config),
        skip_if=lambda: all(
            os.path.exists(os.path.join(site_supp_folder(supp_dir, s),
                                        "cell_traj.pkl"))
            for s in sites))
    if streaming:
        # file_paths/static_patches/latents were already streamed; only the
        # trajectory-relation half of assemble remains
        from .stream import assemble_relations

        run("assemble",
            lambda: [assemble_relations(raw_dir, supp_dir, ws, config)
                     for ws in wells.values()],
            skip_if=lambda: all(_well_outputs_exist(
                raw_dir, w, ["_static_patches_relations.pkl",
                             "_static_patches_labels.pkl"])
                for w in wells))
    else:
        run("assemble",
            lambda: [assemble_vae(raw_dir, supp_dir, ws, config,
                                  patch_type="mat")
                     for ws in wells.values()],
            skip_if=lambda: all(_well_outputs_exist(
                raw_dir, w, ["_static_patches.pkl", "_file_paths.pkl"])
                for w in wells))
    def _process_all():
        # prefetch the next well's pickles while this one encodes; drain
        # latent pickle saves on a writer thread (same overlap as the
        # run_vae CLI)
        from ..io.prefetch import AsyncWriter, Prefetcher
        from .patch_vae import load_well_inputs

        prefetched = Prefetcher(
            list(wells.items()),
            lambda kv: load_well_inputs(raw_dir, kv[0]))
        with AsyncWriter(depth=2) as writer:
            for (w, ws), preloaded in prefetched:
                process_vae(raw_dir, supp_dir, ws, config,
                            preloaded=preloaded, writer=writer)

    run("process", _process_all)
    run("trajectory_matching",
        lambda: [trajectory_matching(raw_dir, supp_dir, ws, config)
                 for ws in wells.values()],
        skip_if=lambda: all(_well_outputs_exist(
            raw_dir, w, ["_trajectories.pkl"]) for w in wells))
    if "pca" in stages:
        from .dim_reduction import dim_reduction

        dr = config.dim_reduction
        if dr.input_dirs:
            any_failed = stage_error is not None
            if multiproc:
                # the PCA fit pools latents across ALL wells (reference
                # run_dim_reduction.py:276-287): wait for every process's
                # per-well outputs on the shared filesystem, then fit once.
                # The allgather doubles as the barrier AND lets every
                # process agree whether any peer's stages failed — fitting
                # on a silently incomplete latent pool would be worse than
                # skipping.
                import numpy as np
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices("dynamorph:pre-pca")
                flags = multihost_utils.process_allgather(
                    np.array([stage_error is not None]))
                any_failed = bool(np.asarray(flags).any())
            try:
                if not any_failed and (not multiproc or is_main_process()):
                    with stage_timer("pca"):
                        dim_reduction("pca", dr.input_dirs,
                                      dr.output_dirs or dr.input_dirs,
                                      dr.weights_dir, config)
                    executed.append("pca")
            finally:
                if multiproc:
                    # all processes leave together even if the fit raised on
                    # process 0 — otherwise the other hosts hang in the
                    # barrier until the coordination timeout; the exception
                    # still propagates after the sync
                    multihost_utils.sync_global_devices("dynamorph:post-pca")
    if stage_error is not None:
        raise stage_error
    return executed
