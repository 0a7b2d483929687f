"""Native UMAP fit invariants (reduce/umap_native.py — VERDICT r4 item 5).

umap-learn is uninstallable offline, so there is no same-algorithm oracle;
these tests pin the properties that make the embedding USEFUL and the
component SHIPPABLE: bit-determinism under seed, curve-parameter parity
with umap-learn's published find_ab_params values, local-structure
preservation at least as good as the PCA baseline (sklearn trustworthiness
on a nonlinear manifold), cluster separation, and the dim_reduction stage
executing end-to-end with ``method: umap`` and no umap-learn present.
Reference behavior: run_dim_reduction.py:143-207.
"""
import os
import sys

import numpy as np
import pytest

from dynamorph_tpu.reduce.umap_native import (NativeUMAP, find_ab_params,
                                              fuzzy_simplicial_set,
                                              knn_graph, smooth_knn)


@pytest.fixture()
def clusters():
    rng = np.random.RandomState(0)
    centers = rng.randn(3, 10) * 8
    x = np.concatenate([centers[i] + rng.randn(150, 10) for i in range(3)])
    y = np.repeat([0, 1, 2], 150)
    return x.astype(np.float32), y


def test_find_ab_params_matches_umap_learn_published():
    """umap-learn's canonical defaults (spread=1, min_dist=0.1) fit to
    a=1.577, b=0.895 — the same curve-fit must land there."""
    a, b = find_ab_params(1.0, 0.1)
    assert abs(a - 1.577) < 0.01
    assert abs(b - 0.895) < 0.005


def test_knn_graph_exact(clusters):
    """Blocked MXU-form kNN equals brute-force numpy, excluding self."""
    x, _ = clusters
    x = x[:80]
    inds, dists = knn_graph(x, 5, block=32)
    d2 = ((x[:, None] - x[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    want = np.argsort(d2, axis=1)[:, :5]
    np.testing.assert_array_equal(np.sort(inds, 1), np.sort(want, 1))
    np.testing.assert_allclose(
        np.sort(dists, 1),
        np.sort(np.sqrt(np.take_along_axis(d2, want, 1)), 1), rtol=1e-4)


def test_smooth_knn_mass_target():
    """The bisected sigma puts log2(k) total membership mass on each
    point's neighborhood (the UMAP smooth-kNN condition)."""
    rng = np.random.RandomState(1)
    dists = np.sort(rng.rand(50, 15) + 0.05, axis=1)
    rho, sigma = smooth_knn(dists)
    mass = np.exp(-np.maximum(dists - rho[:, None], 0) / sigma[:, None]
                  ).sum(1)
    np.testing.assert_allclose(mass, np.log2(15), atol=1e-3)


def test_fuzzy_graph_symmetric(clusters):
    x, _ = clusters
    g = fuzzy_simplicial_set(x[:100], 10)
    asym = abs(g - g.T)
    assert asym.max() < 1e-12
    assert g.data.max() <= 1.0 + 1e-6 and g.data.min() > 0


def test_deterministic_under_seed(clusters):
    x, _ = clusters
    e1 = NativeUMAP(a=1.58, b=0.9, n_neighbors=10,
                    random_state=3).fit_transform(x)
    e2 = NativeUMAP(a=1.58, b=0.9, n_neighbors=10,
                    random_state=3).fit_transform(x)
    np.testing.assert_array_equal(e1, e2)
    e3 = NativeUMAP(a=1.58, b=0.9, n_neighbors=10,
                    random_state=4).fit_transform(x)
    assert not np.array_equal(e1, e3)


def test_cluster_separation(clusters):
    """Well-separated 10-D Gaussian clusters stay separated in the 2-D
    embedding: nearest-centroid assignment recovers the labels."""
    x, y = clusters
    emb = NativeUMAP(a=1.58, b=0.9, n_neighbors=15,
                     random_state=0).fit_transform(x)
    cents = np.stack([emb[y == i].mean(0) for i in range(3)])
    pred = np.argmin(((emb[:, None] - cents[None]) ** 2).sum(-1), 1)
    assert (pred == y).mean() > 0.99


def test_neighbor_preservation_vs_pca_baseline():
    """On a nonlinear manifold (swiss roll) the embedding's
    trustworthiness must beat chance comfortably and not lose to the
    linear PCA baseline (the VERDICT acceptance bar)."""
    from sklearn.datasets import make_swiss_roll
    from sklearn.decomposition import PCA
    from sklearn.manifold import trustworthiness

    x, _ = make_swiss_roll(n_samples=400, random_state=0)
    x = x.astype(np.float32)
    emb = NativeUMAP(n_neighbors=15, random_state=0).fit_transform(x)
    t_umap = trustworthiness(x, emb, n_neighbors=10)
    t_pca = trustworthiness(x, PCA(2).fit_transform(x), n_neighbors=10)
    assert t_umap > 0.9
    assert t_umap >= t_pca - 0.01


def test_input_validation():
    with pytest.raises(ValueError, match="together"):
        NativeUMAP(a=1.58)
    with pytest.raises(ValueError, match="samples"):
        NativeUMAP().fit_transform(np.zeros((2, 4), np.float32))
    with pytest.raises(ValueError, match="expected"):
        NativeUMAP().fit_transform(np.zeros((8,), np.float32))


def test_dim_reduction_stage_umap_offline(tmp_path, monkeypatch):
    """`method: umap` executes end-to-end with umap-learn ABSENT: the
    pipeline stage pools latents, runs the native fit over the grid, and
    writes the reference-named artifacts."""
    import types  # noqa: F401

    monkeypatch.setitem(sys.modules, "umap", None)

    from dynamorph_tpu.config.schema import PipelineConfig
    from dynamorph_tpu.io.pickles import save_pickle
    from dynamorph_tpu.pipeline.dim_reduction import dim_reduction

    rng = np.random.RandomState(0)
    idir = tmp_path / "in"
    idir.mkdir()
    save_pickle(rng.rand(60, 16).astype(np.float32),
                str(idir / "C5_latent_space_after.pkl"))
    config = PipelineConfig()
    config.dim_reduction.file_name_prefixes = "C5"
    config.dim_reduction.fit_model = True
    config.dim_reduction.conditions = None
    wdir = str(tmp_path / "weights")
    dim_reduction("umap", [str(idir)], [str(idir)], wdir, config)
    made = sorted(os.listdir(wdir))
    assert "UMAP.png" in made
    assert any(f.startswith("umap_nbr") and f.endswith(".pkl")
               for f in made)
