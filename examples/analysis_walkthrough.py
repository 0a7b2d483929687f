"""Analysis walkthrough: latents -> PCA -> trajectory summaries -> states ->
figures.

The runnable equivalent of the reference's hard-coded-path analysis
notebooks (reference NOVEMBER_Analysis.ipynb, 147 cells;
NOVEMBER_Progenitor.ipynb, 67 cells), whose flow is:

1. load per-well latent vectors + trajectories,
2. PCA the latent space,
3. summarise each trajectory (mean PCs + mean speed),
4. distribution/density figures (PC1 vs speed etc.),
5. semi-supervised GMM over trajectory summaries -> morphodynamic states,
6. state-colored embeddings, representative trajectories, MSD per state.

Synthesises a small dataset with two latent "states" (two wells of
trajectories with distinct morphology/motility), then runs the real
analysis stack end to end and writes every figure family.

    python examples/analysis_walkthrough.py [output_dir]
"""
import os
import sys

import numpy as np


def make_latent_dataset(rng, n_trajs=24, traj_len=12, latent_dim=64):
    """Two-condition synthetic latents: condition 1 cells are 'larger'
    (latent offset) and slower; condition 0 smaller and faster."""
    latents, traj_inds, traj_positions, conditions = [], [], [], []
    idx = 0
    for t in range(n_trajs):
        cond = t % 2
        base = rng.randn(latent_dim)
        base[:8] += 2.5 if cond else 0.0   # condition axis
        base[8:16] += rng.randn() * 2.0    # within-condition morphology axis
        speed = 1.5 if cond else 6.0
        pos = np.array([256.0, 256.0]) + rng.randn(2) * 40
        inds, positions = [], {}
        for k in range(traj_len):
            latents.append(base + rng.randn(latent_dim) * 0.4)
            inds.append(idx)
            positions[k] = pos.copy()
            pos = pos + rng.randn(2) * speed
            idx += 1
        traj_inds.append(inds)
        traj_positions.append(positions)
        conditions.append(cond)
    return (np.stack(latents).astype(np.float32), traj_inds,
            traj_positions, np.asarray(conditions))


def main(root):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(0)

    from dynamorph_tpu.analysis import plots

    from dynamorph_tpu.core.compile_cache import enable_persistent_cache

    # warm-start repeated runs: reuse compiled XLA programs across processes
    enable_persistent_cache()
    from dynamorph_tpu.analysis.state_clustering import (
        trajectory_summaries, well_conditioned_gmm)
    from dynamorph_tpu.analysis.trajectory_dynamics import plot_msd
    from dynamorph_tpu.reduce.pca import fit_pca_device

    # 1-2) latents -> PCA (the notebooks' 'PCA of traj vectors' stage)
    latents, traj_inds, traj_positions, conds = make_latent_dataset(rng)
    pca = fit_pca_device(latents, variance_fraction=0.8)
    pcs = pca.transform(latents)
    print(f"latents {latents.shape} -> PCs {pcs.shape}")
    plots.plot_explained_variance(pca.explained_variance_ratio_,
                                  os.path.join(root, "explained_variance.png"))

    # 3) per-trajectory summaries: mean PCs + log mean speed
    X, speeds = trajectory_summaries(traj_inds, traj_positions, pcs)
    print(f"trajectory summary matrix {X.shape}")

    # 4) distribution / density figures
    per_sample_cond = np.repeat(conds, [len(t) for t in traj_inds])
    plots.plot_embedding_scatter(
        pcs, os.path.join(root, "pca_by_condition.png"),
        labels=per_sample_cond, conditions=["cond0", "cond1"], alpha=0.4)
    plots.plot_joint_kde(X[:, 1], X[:, 0],
                         os.path.join(root, "pc1_speed_kde.png"),
                         xlabel="PC 1", ylabel="log speed")
    plots.plot_distribution_comparison(
        pcs[per_sample_cond == 1, 0], pcs[:, 0],
        os.path.join(root, "pc1_distribution.png"),
        labels=["cond1", "all"])

    # 5) semi-supervised GMM -> morphodynamic states
    init = np.stack([np.median(X[conds == 0], 0),
                     np.median(X[conds == 1], 0)])
    gmm = well_conditioned_gmm(X, conds, init, n_iter=30)
    states = gmm["states"]
    print("state counts:", np.bincount(states),
          "well prior:\n", np.round(gmm["well_prob_mat"], 3))

    # 6) state-colored figures + MSD per state
    per_sample_state = np.repeat(states, [len(t) for t in traj_inds])
    plots.plot_embedding_scatter(
        pcs, os.path.join(root, "pca_by_state.png"),
        labels=per_sample_state, conditions=["state0", "state1"], alpha=0.4)
    plots.plot_violin_modes(
        {"state0": speeds[states == 0], "state1": speeds[states == 1]},
        os.path.join(root, "speed_by_state.png"), ylabel="mean step (px)")
    for s in (0, 1):
        member_pos = [traj_positions[i] for i in np.where(states == s)[0]]
        plot_msd(member_pos, os.path.join(root, f"msd_state{s}.png"))

    # sanity: the states should recover the two synthetic conditions
    agreement = max(np.mean(states == conds), np.mean(states == 1 - conds))
    print(f"state/condition agreement: {agreement:.2f}")
    assert agreement > 0.9, "states failed to recover the two conditions"
    n_pngs = len([f for f in os.listdir(root) if f.endswith('.png')])
    print(f"walkthrough complete: {n_pngs} figures in {root}")
    return agreement


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dynamorph_walkthrough"
    main(out)
