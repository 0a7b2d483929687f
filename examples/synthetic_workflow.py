"""End-to-end demo on synthetic data: generates a fake experiment (moving
cells over noisy background with known segmentation probabilities), runs the
full pipeline through latents + PCA, then the analysis layer (MSD curves,
movement states, PC montages).

Replaces the reference's hard-coded-path notebooks as living documentation.

    python examples/synthetic_workflow.py [output_dir]
"""
import os
import sys

import numpy as np


def make_experiment(root, n_frames=14, size=512, n_cells=4, r=18, seed=0):
    rng = np.random.RandomState(seed)
    raw = os.path.join(root, "raw")
    supp = os.path.join(root, "supp")
    os.makedirs(raw, exist_ok=True)
    os.makedirs(supp, exist_ok=True)
    yy, xx = np.mgrid[:size, :size]
    centers0 = rng.randint(80, size - 80, size=(n_cells, 2))
    vel = rng.randint(-3, 4, size=centers0.shape)
    images, segs = [], []
    for t in range(n_frames):
        centers = centers0 + vel * t
        img = rng.rand(2, 1, size, size) * 1000 + 30000
        fg = np.zeros((size, size), bool)
        for cy, cx in centers:
            m = (yy - cy) ** 2 + (xx - cx) ** 2 < r ** 2
            fg |= m
            img[:, 0][:, m] += 10000
        bg = np.where(fg, 0.05, 0.97)
        mg = np.where(fg, 0.9, 0.02)
        segs.append(np.stack([bg, mg, 1 - bg - mg])[:, None])
        images.append(img)
    np.save(os.path.join(raw, "C5-Site_0.npy"), np.stack(images))
    np.save(os.path.join(raw, "C5-Site_0_NNProbabilities.npy"),
            np.stack(segs))
    return raw, supp


def main(root):
    import jax

    from dynamorph_tpu.core.compile_cache import enable_persistent_cache

    # warm-start repeated runs: reuse compiled XLA programs across processes
    enable_persistent_cache()

    from dynamorph_tpu.config.schema import (LatentEncodingConfig,
                                             PatchConfig, PipelineConfig)
    from dynamorph_tpu.io.pickles import load_pickle
    from dynamorph_tpu.models import VQVAEz16
    from dynamorph_tpu.pipeline.orchestrator import run_pipeline
    from dynamorph_tpu.train.checkpoint import save_checkpoint

    print("== generating synthetic experiment ==")
    raw, supp = make_experiment(root)

    print("== writing random-init VQ-VAE checkpoint ==")
    model = VQVAEz16(num_embeddings=64)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    weights = os.path.join(root, "weights")
    save_checkpoint(weights, {"params": params, "state": state})

    config = PipelineConfig(
        patch=PatchConfig(channels=[0, 1], window_size=256, reload=False),
        latent_encoding=LatentEncodingConfig(
            channels=[0, 1], network="VQ_VAE_z16", num_hiddens=16,
            num_residual_hiddens=32, num_embeddings=64, weights=weights,
            save_output=False),
    )

    print("== running pipeline ==")
    executed = run_pipeline(
        raw, supp, ["C5-Site_0"], config,
        stages=["instance_segmentation", "extract_patches",
                "build_trajectories", "assemble", "process",
                "trajectory_matching"])
    print("executed stages:", executed)

    z_b = load_pickle(os.path.join(raw, "weights", "C5_latent_space.pkl"))
    trajs = load_pickle(os.path.join(raw, "C5_trajectories.pkl"))
    print(f"latents: {z_b.shape}, trajectories: {len(trajs)}")

    print("== analysis: MSD + movement states ==")
    from dynamorph_tpu.analysis.state_clustering import \
        movement_state_clustering
    from dynamorph_tpu.analysis.trajectory_dynamics import plot_msd
    from dynamorph_tpu.io.pickles import load_pickle as lp

    traj_pkl = lp(os.path.join(supp, "C5-supps", "C5-Site_0",
                               "cell_traj.pkl"))
    traj_positions = traj_pkl[1]
    points = plot_msd(traj_positions, os.path.join(root, "msd.png"))
    states = movement_state_clustering(traj_positions)
    print("MSD points:", len(points), "| movement states:",
          {k: len(v) for k, v in states.items()})

    print("== analysis: PCA + PC montages ==")
    from dynamorph_tpu.analysis.pc_samples import pc_sample_montage
    from dynamorph_tpu.reduce.pca import fit_pca_device

    pca = fit_pca_device(z_b, 0.5)
    pcs = pca.transform(z_b)
    patches = load_pickle(os.path.join(raw, "C5_static_patches.pkl"))
    pc_sample_montage(np.squeeze(patches)[:, :2] / 65535.0, pcs[:, 0],
                      os.path.join(root, "pc_samples"), n_buckets=3,
                      n_samples=4)
    print(f"PCA kept {pca.n_components_} components; montages in "
          f"{os.path.join(root, 'pc_samples')}")
    print("== done ==")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dynamorph_demo"
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    main(out)
