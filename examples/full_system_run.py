"""Full-system run with LEARNED components end to end:

1. generate a synthetic experiment (raw frames + ground-truth class maps)
2. TRAIN the U-Net on ground-truth patches
3. segment the raw stack with the TRAINED U-Net (direct whole-frame mode)
4. instance-cluster the *predicted* probabilities -> cells
5. extract patches -> track trajectories -> assemble the VAE dataset
6. TRAIN a VQ-VAE with the trajectory time-matching loss
7. encode latents with the TRAINED VQ-VAE -> PCA

Nothing downstream sees ground truth after step 2 — the pipeline runs on its
own predictions, validating every learned + classical stage together.

    python examples/full_system_run.py [output_dir]
"""
import os
import sys

import numpy as np


def main(root):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from synthetic_workflow import make_experiment

    from dynamorph_tpu.core.compile_cache import enable_persistent_cache

    # warm-start repeated runs: reuse compiled XLA programs across processes
    enable_persistent_cache()

    from dynamorph_tpu.config.schema import (LatentEncodingConfig,
                                             PatchConfig, PipelineConfig,
                                             SegmentationInferenceConfig)
    from dynamorph_tpu.io.pickles import load_pickle
    from dynamorph_tpu.pipeline.orchestrator import run_pipeline
    from dynamorph_tpu.pipeline.segmentation import segmentation
    from dynamorph_tpu.seg.data import generate_ordered_patches
    from dynamorph_tpu.seg.model import Segment

    print("== 1. synthetic experiment ==")
    raw, supp = make_experiment(root, n_frames=12, size=512)
    stack = np.load(os.path.join(raw, "C5-Site_0.npy"))
    truth = np.load(os.path.join(raw, "C5-Site_0_NNProbabilities.npy"))

    print("== 2. train U-Net on ground-truth patches ==")
    patches = generate_ordered_patches(stack[:8], truth[:8],
                                       use_channels=[0, 1],
                                       x_size=256, y_size=256)
    seg_model = Segment(input_shape=(2, 256, 256), n_classes=3,
                        model_path=os.path.join(root, "seg_train"))
    history = seg_model.fit(patches, batch_size=8, n_epochs=15,
                            valid_patches=patches[:4])
    print(f"   seg loss {history[0]['loss']:.4f} -> {history[-1]['loss']:.4f}"
          f" | val ROC-AUC {history[-1]['val_roc_auc']:.3f}")
    weights = os.path.join(root, "seg_weights")
    seg_model.save(weights)
    # remove ground-truth probabilities: downstream must use predictions
    os.remove(os.path.join(raw, "C5-Site_0_NNProbabilities.npy"))

    print("== 3. segment with the trained U-Net (direct mode) ==")
    config = PipelineConfig(
        segmentation_inference=SegmentationInferenceConfig(
            channels=[0, 1], window_size=256, weights=weights,
            num_pred_rnd=2, inference_mode="direct"),
        patch=PatchConfig(channels=[0, 1], window_size=256, reload=False),
        latent_encoding=LatentEncodingConfig(
            channels=[0, 1], network="VQ_VAE_z16", num_hiddens=16,
            num_residual_hiddens=32, num_embeddings=64, save_output=False),
    )
    segmentation(raw, supp, None, ["C5-Site_0"], config)
    pred = np.load(os.path.join(raw, "C5-Site_0_NNProbabilities.npy"))
    # segmentation quality vs held-back truth
    truth_fg = truth[:, 0, 0] < 0.3
    pred_fg = pred[:, 0, 0] < 0.3
    iou = (truth_fg & pred_fg).sum() / max((truth_fg | pred_fg).sum(), 1)
    print(f"   foreground IoU vs ground truth: {iou:.3f}")
    assert iou > 0.5, "trained U-Net failed to segment the synthetic cells"

    print("== 3b. fused device-resident front-end (same trained U-Net) ==")
    # exercises pipeline/fused.py with a REAL trained model: seg + DBSCAN +
    # patch extraction with the frame resident in HBM, into a side dir
    from dynamorph_tpu.pipeline.fused import seg_patch_fused

    supp_fused = os.path.join(root, "supp_fused")
    seg_patch_fused(raw, supp_fused, ["C5-Site_0"], config,
                    save_probabilities=False)
    cp_fused = load_pickle(os.path.join(
        supp_fused, "C5-supps", "C5-Site_0", "cell_positions.pkl"))
    n_fused = len(cp_fused[0])
    print(f"   fused front-end cells in frame 0: {n_fused} (truth: 4)")
    assert n_fused >= 3, "fused front-end lost the synthetic cells"

    print("== 4-5. instance seg -> patches -> trajectories -> assemble ==")
    executed = run_pipeline(raw, supp, ["C5-Site_0"], config, stages=[
        "instance_segmentation", "extract_patches", "build_trajectories",
        "assemble"])
    trajs = load_pickle(os.path.join(
        supp, "C5-supps", "C5-Site_0", "cell_traj.pkl"))
    n_cells = len(load_pickle(os.path.join(
        supp, "C5-supps", "C5-Site_0", "cell_positions.pkl"))[0])
    print(f"   cells found in frame 0: {n_cells} (truth: 4); "
          f"trajectories: {len(trajs[0])}")

    print("== 6. train VQ-VAE with time-matching loss ==")
    from dynamorph_tpu.models import VQVAEz16
    from dynamorph_tpu.train import data as du
    from dynamorph_tpu.train.checkpoint import save_checkpoint
    from dynamorph_tpu.train.trainer import train_vqvae

    fs = load_pickle(os.path.join(raw, "C5_file_paths.pkl"))
    dataset = load_pickle(os.path.join(raw, "C5_static_patches.pkl"))
    relations = load_pickle(os.path.join(
        raw, "C5_static_patches_relations.pkl"))
    dataset = du.zscore(np.squeeze(dataset)).astype(np.float32)
    ds, rel_mat, order = du.reorder_with_trajectories(dataset, relations,
                                                      seed=123)
    vae = VQVAEz16(num_embeddings=64, weight_matching=5.0)
    params, state, hist = train_vqvae(
        vae, ds, os.path.join(root, "vae_train"), relation_mat=rel_mat,
        n_epochs=25, lr=1e-3, batch_size=16, transform=True,
        val_split_ratio=0.2, patience=25)
    print(f"   VQ-VAE recon {hist[0]['train']['recon_loss']:.4f} -> "
          f"{hist[-1]['train']['recon_loss']:.4f}")
    vae_weights = os.path.join(root, "vae_weights")
    save_checkpoint(vae_weights, {"params": params, "state": state})

    print("== 7. encode + PCA ==")
    config.latent_encoding.weights = vae_weights
    executed = run_pipeline(raw, supp, ["C5-Site_0"], config,
                            stages=["process", "trajectory_matching"])
    z_b = load_pickle(os.path.join(raw, "vae_weights",
                                   "C5_latent_space.pkl"))
    from dynamorph_tpu.reduce.pca import fit_pca_device

    pca = fit_pca_device(z_b, 0.5)
    print(f"   latents {z_b.shape}, finite={np.isfinite(z_b).all()}, "
          f"PCA keeps {pca.n_components_} components")
    print("== FULL SYSTEM RUN COMPLETE ==")
    return {"iou": float(iou), "n_cells": n_cells,
            "n_trajs": len(trajs[0])}


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dynamorph_full"
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main(out)
