"""Morphodynamic state clustering tests."""
import numpy as np

from dynamorph_tpu.analysis.state_clustering import (
    kmeans_on_short_trajs, movement_state_clustering, short_traj_morphology)


def test_short_traj_morphology_shapes(rng):
    vs = rng.randn(20, 4)
    trajs = [[0, 1, 2, 3, 4, 5], [10, 11, 12]]
    feats = short_traj_morphology(vs, trajs, length=3)
    assert feats.shape == (4 + 1, 12)


def test_kmeans_on_short_trajs_separates_states(rng):
    # two descriptor regimes
    vs = np.concatenate([rng.randn(30, 4) + 10, rng.randn(30, 4) - 10])
    trajs = [list(range(0, 30)), list(range(30, 60))]
    km, feats, labels = kmeans_on_short_trajs(vs, trajs, length=3,
                                              n_clusters=2)
    n_windows_per_traj = 28
    first = labels[:n_windows_per_traj]
    second = labels[n_windows_per_traj:]
    assert len(set(first.tolist())) == 1
    assert len(set(second.tolist())) == 1
    assert first[0] != second[0]

    _, feats_d, _ = kmeans_on_short_trajs(vs, trajs, length=3, n_clusters=2,
                                          diffs=True)
    assert feats_d.shape[1] == 2 * 4  # (length-1) * D


def test_movement_state_clustering_extra_clusters(rng):
    """n_clusters > 3 gets synthesized state names instead of an
    IndexError after the k-means has run."""
    def walk(scale, n=20):
        pos = np.cumsum(rng.randn(n, 2) * scale, axis=0)
        return {t: pos[t] for t in range(n)}

    trajs = [walk(s) for s in (0.01, 0.5, 2.0, 40.0) for _ in range(4)]
    states = movement_state_clustering(trajs, length=5, n_clusters=4)
    assert set(states) == {"stagnant", "minor_moving", "moving", "moving_2"}
    assert sum(len(v) for v in states.values()) == 16


def test_trajectory_summary_speed_scales_with_t_lag():
    """log-speed stays in um/h for t_lag > 1: a constant-velocity walk must
    report the same speed at any lag (displacement spans t_lag frames)."""
    from dynamorph_tpu.analysis.state_clustering import trajectory_summaries

    pos = {t: np.array([3.0 * t, 0.0]) for t in range(12)}
    pcs = np.zeros((12, 2))
    X1, _ = trajectory_summaries([list(range(12))], [pos], pcs, t_lag=1)
    X3, _ = trajectory_summaries([list(range(12))], [pos], pcs, t_lag=3)
    np.testing.assert_allclose(X1[0, 0], X3[0, 0], rtol=1e-9)


def test_movement_state_clustering(rng):
    def walk(scale, n=20):
        pos = np.cumsum(rng.randn(n, 2) * scale, axis=0)
        return {t: pos[t] for t in range(n)}

    trajs = [walk(0.01) for _ in range(5)] + \
            [walk(1.0) for _ in range(5)] + \
            [walk(20.0) for _ in range(5)]
    states = movement_state_clustering(trajs, length=5, n_clusters=3)
    assert set(states) == {"stagnant", "minor_moving", "moving"}
    assert sum(len(v) for v in states.values()) == 15
    # k-means over raw windows is direction-sensitive (reference semantics),
    # so only assert the robust invariants: no large-scale walk may be
    # labelled stagnant, and no tiny-scale walk may be labelled moving.
    assert not (set(states["stagnant"]) & set(range(10, 15)))
    assert not (set(states["moving"]) & set(range(5)))
    # the stagnant bucket contains at least some of the tiny walks
    assert set(states["stagnant"]) & set(range(5))
