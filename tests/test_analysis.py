"""Trajectory dynamics (MSD) and profiling hooks."""
import json
import os

import numpy as np

from dynamorph_tpu.analysis.trajectory_dynamics import (
    fit_msd_powerlaw, generate_msd_distri, generate_short_traj_collections,
    msd_curve, plot_msd)
from dynamorph_tpu.core.profiling import stage_timer


def _brownian_traj(rng, n=30, d=2.0):
    pos = np.cumsum(rng.randn(n, 2) * np.sqrt(d), axis=0)
    return {t: pos[t] for t in range(n)}


def test_msd_diffusive_exponent(rng):
    trajs = [_brownian_traj(rng) for _ in range(200)]
    points = msd_curve(trajs)
    alpha, d = fit_msd_powerlaw(points, first_n_points=5,
                                with_intercept=True)
    assert 0.7 < alpha < 1.3  # Brownian motion: alpha ~ 1
    assert d > 0


def test_msd_ballistic_exponent():
    # straight-line motion: MSD ~ lag^2
    trajs = [{t: np.array([3.0 * t, 4.0 * t]) for t in range(20)}]
    points = msd_curve(trajs)
    alpha, _ = fit_msd_powerlaw(points, first_n_points=5)
    np.testing.assert_allclose(alpha, 2.0, atol=1e-6)


def test_msd_distri_counts():
    trajs = [{0: np.zeros(2), 1: np.ones(2), 2: 2 * np.ones(2)}]
    msd = generate_msd_distri(trajs, max_lag=3)
    assert len(msd[1]) == 2 and len(msd[2]) == 1 and len(msd[3]) == 0
    np.testing.assert_allclose(msd[1], [2.0, 2.0])  # |(1,1)|^2


def test_short_traj_collections():
    traj = {t: np.array([t, 0.0]) for t in range(6)}
    segs = generate_short_traj_collections([traj], length=4)
    assert len(segs) == 3
    np.testing.assert_allclose(segs[0][0], [0, 0])  # origin-normalised


def test_plot_msd(tmp_path, rng):
    trajs = [_brownian_traj(rng) for _ in range(10)]
    out = str(tmp_path / "msd.png")
    points = plot_msd(trajs, out)
    assert os.path.exists(out)
    assert len(points) > 5


def test_plot_msd_empty_trajectories(tmp_path):
    """No displacement samples -> empty (0, 2) curve and a valid figure,
    not an IndexError."""
    from dynamorph_tpu.analysis.trajectory_dynamics import msd_curve, plot_msd

    assert msd_curve([]).shape == (0, 2)
    pts = plot_msd([{0: (1.0, 2.0)}], str(tmp_path / "msd.png"))
    assert pts.shape == (0, 2)
    assert (tmp_path / "msd.png").exists()


def test_stage_timer_writes_jsonl(tmp_path):
    log_path = str(tmp_path / "timing.jsonl")
    with stage_timer("unit_test_stage", log_path=log_path, site="s1"):
        pass
    rec = json.loads(open(log_path).read().strip())
    assert rec["stage"] == "unit_test_stage"
    assert rec["site"] == "s1"
    assert rec["seconds"] >= 0
