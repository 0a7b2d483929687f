"""UMAP wrapper contract tests with a stubbed ``umap`` module (umap-learn is
not installed in this environment): parameter grid, pickle naming, fit-only
return, and the transform filename contract — reference
run_dim_reduction.py:143-207 (fit_umap) and :94-127 (umap_transform).
"""
import sys
import types

import numpy as np


class _FakeModel:
    """Picklable stand-in for a saved (pre-0.5) UMAP model."""

    def __init__(self, scale):
        self.scale = scale

    def transform(self, x):
        return np.asarray(x)[:, :2] * self.scale


def test_fit_umap_grid_and_pickles(tmp_path, monkeypatch):
    """fit_umap sweeps n_neighbors x zip(a_s, b_s), saves
    [embedding, labels] pickles named umap_nbr{n}_a{a}_b{b}.pkl plus one
    multi-panel UMAP.png, and returns nothing (fit-only: umap>=0.5 models
    can't be pickled for transform, reference run_dim_reduction.py:166)."""
    calls = []

    class FakeUMAP:
        def __init__(self, a=None, b=None, n_neighbors=15):
            calls.append((n_neighbors, a, b))
            self._n = n_neighbors

        def fit_transform(self, x):
            return np.random.RandomState(self._n).rand(len(x), 2)

    fake = types.ModuleType("umap")
    fake.UMAP = FakeUMAP
    monkeypatch.setitem(sys.modules, "umap", fake)

    from dynamorph_tpu.io.pickles import load_pickle
    from dynamorph_tpu.reduce.umap_wrap import fit_umap

    data = np.random.RandomState(0).rand(30, 8)
    labels = np.arange(30) % 2
    out = fit_umap(data, str(tmp_path), labels, conditions=["mock", "inf"])
    assert out is None
    # default grid: n_nbrs=(15, 50, 200) x zip(a_s=(1.58,), b_s=(0.9,))
    assert calls == [(15, 1.58, 0.9), (50, 1.58, 0.9), (200, 1.58, 0.9)]
    for n in (15, 50, 200):
        p = tmp_path / f"umap_nbr{n}_a1.58_b0.9.pkl"
        assert p.exists(), p
        emb, labs = load_pickle(str(p))
        assert emb.shape == (30, 2)
        np.testing.assert_array_equal(labs, labels)
    assert (tmp_path / "UMAP.png").exists()


def test_fit_umap_custom_grid(tmp_path, monkeypatch):
    """a_s/b_s zip pairwise (not a product) and land in the filenames."""
    calls = []

    class FakeUMAP:
        def __init__(self, a=None, b=None, n_neighbors=15):
            calls.append((n_neighbors, a, b))

        def fit_transform(self, x):
            return np.zeros((len(x), 2))

    fake = types.ModuleType("umap")
    fake.UMAP = FakeUMAP
    monkeypatch.setitem(sys.modules, "umap", fake)

    from dynamorph_tpu.reduce.umap_wrap import fit_umap

    fit_umap(np.zeros((6, 4)), str(tmp_path), np.zeros(6), ["c"],
             n_nbrs=(5,), a_s=(1.0, 2.0), b_s=(0.5, 0.25))
    assert calls == [(5, 1.0, 0.5), (5, 2.0, 0.25)]
    assert (tmp_path / "umap_nbr5_a1.0_b0.5.pkl").exists()
    assert (tmp_path / "umap_nbr5_a2.0_b0.25.pkl").exists()


def test_umap_transform_filename_contract(tmp_path):
    """umap_transform applies every umap*.pkl model in weights_dir to
    <prefix>_latent_space<suffix>.pkl and writes
    <prefix>_latent_space<suffix>_<model_name>.pkl; non-umap pickles in the
    weights dir are ignored (reference run_dim_reduction.py:109-127)."""
    from dynamorph_tpu.io.pickles import load_pickle, save_pickle
    from dynamorph_tpu.reduce.umap_wrap import umap_transform

    wdir, idir, odir = tmp_path / "w", tmp_path / "i", tmp_path / "o"
    wdir.mkdir()
    idir.mkdir()
    save_pickle(_FakeModel(2.0), str(wdir / "umap_nbr15_a1.58_b0.9.pkl"))
    save_pickle(_FakeModel(3.0), str(wdir / "pca_model.pkl"))  # ignored
    save_pickle(np.ones((5, 4)), str(idir / "C5_latent_space_after.pkl"))

    umap_transform(str(idir), str(odir), str(wdir), "C5")

    out = odir / "C5_latent_space_after_umap_nbr15_a1.58_b0.9.pkl"
    assert out.exists()
    np.testing.assert_allclose(load_pickle(str(out)), np.ones((5, 2)) * 2.0)
    assert not (odir / "C5_latent_space_after_pca_model.pkl").exists()


def test_missing_umap_raises_clear_error(tmp_path, monkeypatch):
    monkeypatch.setitem(sys.modules, "umap", None)  # force ImportError

    import pytest

    from dynamorph_tpu.reduce.umap_wrap import fit_umap

    with pytest.raises(ImportError, match="umap-learn is required"):
        fit_umap(np.zeros((4, 4)), str(tmp_path), np.zeros(4), ["c"])
