"""Production-scale dress rehearsal: the full pipeline on reference-sized
frames (2048x2048, the reference's stated frame size —
extract_patches.py:47), with per-stage wall-clock timings.

Synthesizes a 2048x2048 x T-frame well with ~40 moving cells, then drives
segmentation (trained U-Net, direct mode) -> instance clustering -> patch
extraction -> tracking -> VAE assembly -> VQ-VAE training (time-matching
loss) -> latent encoding -> PCA, timing each stage with
core.profiling.stage_timer. Ground truth is only used to train the U-Net.

    python examples/production_scale_run.py [output_dir] [--frames N]
"""
import json
import os
import sys
import time


def main(root, n_frames=12):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import numpy as np

    from synthetic_workflow import make_experiment

    from dynamorph_tpu.core.compile_cache import enable_persistent_cache

    # warm-start repeated runs: reuse compiled XLA programs across processes
    enable_persistent_cache()

    from dynamorph_tpu.config.schema import (LatentEncodingConfig,
                                             PatchConfig, PipelineConfig,
                                             SegmentationInferenceConfig)
    from dynamorph_tpu.core.profiling import stage_timer
    from dynamorph_tpu.io.pickles import load_pickle
    from dynamorph_tpu.pipeline.segmentation import segmentation
    from dynamorph_tpu.seg.data import generate_ordered_patches
    from dynamorph_tpu.seg.model import Segment

    timings = {}

    def timed(name):
        class _T:
            def __enter__(self):
                self.t0 = time.perf_counter()
                self.ctx = stage_timer(name)
                self.ctx.__enter__()
                return self

            def __exit__(self, *a):
                self.ctx.__exit__(*a)
                timings[name] = time.perf_counter() - self.t0
                print(f"   [{name}] {timings[name]:.1f}s")

        return _T()

    size, n_cells = 2048, 40
    print(f"== synthetic well: {n_frames} frames of {size}x{size}, "
          f"{n_cells} cells ==")
    with timed("generate"):
        raw, supp = make_experiment(root, n_frames=n_frames, size=size,
                                    n_cells=n_cells)
    stack = np.load(os.path.join(raw, "C5-Site_0.npy"))
    truth = np.load(os.path.join(raw, "C5-Site_0_NNProbabilities.npy"))

    print("== train U-Net on ground-truth patches ==")
    with timed("unet_train"):
        patches = generate_ordered_patches(stack[:2], truth[:2],
                                           use_channels=[0, 1],
                                           x_size=256, y_size=256)
        seg_model = Segment(input_shape=(2, 256, 256), n_classes=3,
                            model_path=os.path.join(root, "seg_train"))
        history = seg_model.fit(patches, batch_size=16, n_epochs=14,
                                valid_patches=patches[:8])
        print(f"   seg loss {history[0]['loss']:.4f} -> "
              f"{history[-1]['loss']:.4f}")
    weights = os.path.join(root, "seg_weights")
    seg_model.save(weights)
    os.remove(os.path.join(raw, "C5-Site_0_NNProbabilities.npy"))

    config = PipelineConfig(
        segmentation_inference=SegmentationInferenceConfig(
            channels=[0, 1], window_size=256, weights=weights,
            inference_mode="direct"),
        patch=PatchConfig(channels=[0, 1], window_size=256, reload=False),
        latent_encoding=LatentEncodingConfig(
            channels=[0, 1], weights=os.path.join(root, "vae_train",
                                                  "model_ckpt")),
    )

    from dynamorph_tpu.pipeline.patch import (build_trajectories,
                                              extract_patches,
                                              instance_segmentation)
    from dynamorph_tpu.pipeline.patch_vae import assemble_vae

    fused = "--fused" in sys.argv
    if fused:
        print("== FUSED seg -> instance -> patch (device-resident) ==")
        from dynamorph_tpu.pipeline.fused import seg_patch_fused

        with timed("seg_patch_fused"):
            seg_patch_fused(raw, supp, ["C5-Site_0"], config)
    else:
        print("== segmentation (trained U-Net, direct whole-frame mode) ==")
        with timed("segmentation"):
            segmentation(raw, supp, "", ["C5-Site_0"], config)

        print("== instance clustering -> patches ==")
        with timed("instance_segmentation"):
            instance_segmentation(raw, supp, ["C5-Site_0"], config)
        with timed("extract_patches"):
            extract_patches(raw, supp, ["C5-Site_0"], config)
    print("== tracking -> assembly ==")
    with timed("build_trajectories"):
        build_trajectories(raw, supp, ["C5-Site_0"], config)
    with timed("assemble_vae"):
        assemble_vae(raw, supp, ["C5-Site_0"], config)

    sitedir = os.path.join(supp, "C5-supps", "C5-Site_0")
    n_cells_found = sum(
        len(v) for v in load_pickle(
            os.path.join(sitedir, "cell_positions.pkl")).values())
    trajs = load_pickle(os.path.join(sitedir, "cell_traj.pkl"))[0]
    print(f"   cells found across frames: {n_cells_found}, "
          f"trajectories: {len(trajs)}")

    print("== VQ-VAE training (trajectory time-matching loss) ==")
    from dynamorph_tpu.models import VQVAEz32
    from dynamorph_tpu.train.data import (reorder_with_trajectories,
                                          zscore)
    from dynamorph_tpu.train.trainer import train_vqvae

    dataset = load_pickle(os.path.join(raw, "C5_static_patches.pkl"))
    relations = load_pickle(os.path.join(raw, "C5_static_patches_relations.pkl"))
    dataset = np.squeeze(np.asarray(dataset)).astype(np.float32)
    with timed("vqvae_train"):
        ds = zscore(dataset)
        ds, relation_mat, inds = reorder_with_trajectories(ds, relations,
                                                           seed=0)
        model = VQVAEz32(num_embeddings=64, num_hiddens=16,
                         num_residual_hiddens=32, weight_matching=0.005)
        params, state, hist = train_vqvae(
            model, ds, os.path.join(root, "vae_train"),
            relation_mat=relation_mat, n_epochs=10, lr=1e-3,
            batch_size=32, transform=True, patience=None)
        print(f"   recon {hist[0]['train']['recon_loss']:.4f} -> "
              f"{hist[-1]['train']['recon_loss']:.4f}")

    print("== latent encoding + PCA ==")
    from dynamorph_tpu.pipeline.patch_vae import encode_patches
    from dynamorph_tpu.reduce.pca import fit_pca_device

    with timed("encode"):
        z_b, z_a = encode_patches(model, params, state, dataset,
                                  normalize="patch")
    with timed("pca"):
        pca = fit_pca_device(z_b.reshape(len(z_b), -1))
    print(f"   latents {z_b.shape} finite={np.isfinite(z_b).all()}, "
          f"PCA comps={pca.n_components_}")

    total = sum(timings.values())
    print("\n== stage timing summary ==")
    for k, v in timings.items():
        print(f"   {k:22s} {v:8.1f}s")
    print(f"   {'TOTAL':22s} {total:8.1f}s")
    with open(os.path.join(root, "timings.json"), "w") as fh:
        json.dump(timings, fh, indent=1)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
        else "/tmp/dynamorph_production_run"
    n = int(sys.argv[sys.argv.index("--frames") + 1]) \
        if "--frames" in sys.argv else 12
    main(out, n_frames=n)
