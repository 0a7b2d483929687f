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


def test_fit_umap_legend_on_last_drawn_panel(tmp_path, monkeypatch):
    """With a grid that doesn't fill the 3-wide row, the condition legend
    lands on the last DRAWN panel (the reference gates on the grid's last
    axis and would draw no legend here, run_dim_reduction.py:194)."""
    legend_calls = []

    class FakeUMAP:
        def __init__(self, a=None, b=None, n_neighbors=15):
            pass

        def fit_transform(self, x):
            return np.random.RandomState(0).rand(len(x), 2)

    fake = types.ModuleType("umap")
    fake.UMAP = FakeUMAP
    monkeypatch.setitem(sys.modules, "umap", fake)

    import matplotlib.axes

    real_legend = matplotlib.axes.Axes.legend

    def spy_legend(self, *a, **k):
        legend_calls.append(self)
        return real_legend(self, *a, **k)

    monkeypatch.setattr(matplotlib.axes.Axes, "legend", spy_legend)

    from dynamorph_tpu.reduce.umap_wrap import fit_umap

    fit_umap(np.random.RandomState(1).rand(12, 4), str(tmp_path),
             np.arange(12) % 2, ["mock", "inf"],
             n_nbrs=(5, 7), a_s=(1.0,), b_s=(0.5,))   # 2 panels, 3-wide row
    assert len(legend_calls) == 1
    assert (tmp_path / "UMAP.png").exists()


def test_umap_transform_skips_embedding_pickles(tmp_path):
    """fit_umap's [embedding, labels] pickles share the umap* namespace;
    umap_transform must skip them instead of crashing on list.transform."""
    from dynamorph_tpu.io.pickles import load_pickle, save_pickle
    from dynamorph_tpu.reduce.umap_wrap import umap_transform

    wdir, idir, odir = tmp_path / "w", tmp_path / "i", tmp_path / "o"
    wdir.mkdir()
    idir.mkdir()
    save_pickle([np.zeros((5, 2)), np.zeros(5)],
                str(wdir / "umap_nbr15_a1.58_b0.9.pkl"))   # embedding pickle
    save_pickle(_FakeModel(2.0), str(wdir / "umap_nbr50_a1.58_b0.9.pkl"))
    save_pickle(np.ones((5, 4)), str(idir / "C5_latent_space_after.pkl"))

    umap_transform(str(idir), str(odir), str(wdir), "C5")

    assert (odir / "C5_latent_space_after_umap_nbr50_a1.58_b0.9.pkl").exists()
    assert not (odir /
                "C5_latent_space_after_umap_nbr15_a1.58_b0.9.pkl").exists()


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


def test_missing_umap_falls_back_to_native(tmp_path, monkeypatch):
    """Without umap-learn, fit_umap runs the NATIVE fit
    (reduce/umap_native.py) under the same grid/naming contract, so the
    stage executes end-to-end in offline environments (VERDICT r4 item 5).
    The pre-0.5 transform path still requires the real package."""
    monkeypatch.setitem(sys.modules, "umap", None)  # umap-learn absent

    from dynamorph_tpu.io.pickles import load_pickle
    from dynamorph_tpu.reduce.umap_wrap import fit_umap

    data = np.random.RandomState(0).rand(40, 6).astype(np.float32)
    labels = np.arange(40) % 2
    fit_umap(data, str(tmp_path), labels, conditions=["a", "b"],
             n_nbrs=(5,))
    p = tmp_path / "umap_nbr5_a1.58_b0.9.pkl"
    assert p.exists()
    emb, labs = load_pickle(str(p))
    assert emb.shape == (40, 2) and np.isfinite(emb).all()
    np.testing.assert_array_equal(labs, labels)
    assert (tmp_path / "UMAP.png").exists()
