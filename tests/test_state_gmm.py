"""trajectory_summaries + well_conditioned_gmm (the notebook-parity GMM
state assignment, reference NOVEMBER_Analysis.ipynb 'GMM' cells) and the
analysis walkthrough example."""
import numpy as np

from dynamorph_tpu.analysis.state_clustering import (trajectory_summaries,
                                                     well_conditioned_gmm)


def _two_state_data(rng, n_traj=20, traj_len=8, d=4):
    pcs, traj_inds, traj_pos, conds = [], [], [], []
    idx = 0
    for t in range(n_traj):
        cond = t % 2
        base = rng.randn(d)
        base[0] += 4.0 * cond
        pos = rng.rand(2) * 100
        inds, positions = [], {}
        for k in range(traj_len):
            pcs.append(base + rng.randn(d) * 0.3)
            inds.append(idx)
            positions[k] = pos.copy()
            pos = pos + rng.randn(2) * (1.0 if cond else 5.0)
            idx += 1
        traj_inds.append(inds)
        traj_pos.append(positions)
        conds.append(cond)
    return np.stack(pcs), traj_inds, traj_pos, np.asarray(conds)


def test_trajectory_summaries_shapes(rng):
    pcs, ti, tp, conds = _two_state_data(rng)
    X, speeds = trajectory_summaries(ti, tp, pcs)
    assert X.shape == (20, 1 + pcs.shape[1])
    assert speeds.shape == (20,)
    # fast condition (0) has larger speeds
    assert speeds[conds == 0].mean() > speeds[conds == 1].mean()
    # col 0 is the log speed feature
    assert np.all(np.isfinite(X))


def test_gmm_recovers_states(rng):
    pcs, ti, tp, conds = _two_state_data(rng)
    X, _ = trajectory_summaries(ti, tp, pcs)
    init = np.stack([np.median(X[conds == 0], 0),
                     np.median(X[conds == 1], 0)])
    out = well_conditioned_gmm(X, conds, init, n_iter=30)
    states = out["states"]
    agreement = max(np.mean(states == conds), np.mean(states == 1 - conds))
    assert agreement >= 0.9
    assert out["posterior"].shape == (20, 2)
    np.testing.assert_allclose(out["posterior"].sum(1), 1.0, atol=1e-9)
    assert out["well_prob_mat"].shape == (2, 2)
    assert np.isfinite(out["centers"]).all()
    assert (out["stds"] > 0).all()  # no collapsed components


def test_gmm_does_not_nan_on_tight_clusters(rng):
    """Regression: tight clusters used to collapse a component's std to 0
    (divide-by-zero NaNs); min_std_ratio floors the scale."""
    X = np.concatenate([rng.randn(10, 3) * 0.01,
                        rng.randn(10, 3) * 0.01 + 5.0])
    y = np.repeat([0, 1], 10)
    init = np.stack([X[:10].mean(0), X[10:].mean(0)])
    out = well_conditioned_gmm(X, y, init, n_iter=40)
    assert np.isfinite(out["posterior"]).all()
    assert len(np.unique(out["states"])) == 2


def test_analysis_walkthrough_end_to_end(tmp_path):
    import importlib.util
    import os
    import sys

    path = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "analysis_walkthrough.py")
    spec = importlib.util.spec_from_file_location("analysis_walkthrough",
                                                  path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["analysis_walkthrough"] = mod
    spec.loader.exec_module(mod)
    agreement = mod.main(str(tmp_path))
    assert agreement > 0.9
    pngs = [f for f in os.listdir(tmp_path) if f.endswith(".png")]
    assert len(pngs) == 8
