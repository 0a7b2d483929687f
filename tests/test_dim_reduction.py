"""PCA parity vs sklearn and dim-reduction pipeline test."""

import numpy as np
import pytest

from dynamorph_tpu.io.pickles import load_pickle, save_pickle
from dynamorph_tpu.reduce.pca import PCAModel, fit_pca, fit_pca_device, process_pca


def test_pca_matches_sklearn(rng):
    sklearn = pytest.importorskip("sklearn")
    from sklearn.decomposition import PCA

    X = rng.randn(200, 32).astype(np.float64)
    X[:, :4] *= 10  # concentrate variance

    ours = fit_pca_device(X, 0.5)
    ref = PCA(0.5, svd_solver="auto").fit(X)

    assert ours.n_components_ == ref.n_components_
    np.testing.assert_allclose(ours.mean_, ref.mean_, atol=1e-5)
    np.testing.assert_allclose(ours.explained_variance_ratio_,
                               ref.explained_variance_ratio_, rtol=1e-4)
    # components match up to sign
    for a, b in zip(ours.components_, ref.components_):
        sign = np.sign(np.dot(a, b))
        np.testing.assert_allclose(a * sign, b, atol=1e-3)
    # transforms match up to per-component sign
    to = ours.transform(X)
    tr = ref.transform(X)
    signs = np.sign(np.sum(to * tr, axis=0))
    np.testing.assert_allclose(to * signs, tr, atol=1e-2)


def test_distributed_pca_matches_svd_path(rng):
    """Sharded Gram-accumulation PCA == SVD PCA (components up to sign)."""
    from dynamorph_tpu.reduce.pca import fit_pca_distributed

    X = rng.randn(203, 24)  # non-divisible by the 8-device mesh
    X[:, :3] *= 8
    svd = fit_pca_device(X, 0.5)
    dist = fit_pca_distributed(X, 0.5)
    assert dist.n_components_ == svd.n_components_
    np.testing.assert_allclose(dist.mean_, svd.mean_, atol=1e-4)
    np.testing.assert_allclose(dist.explained_variance_ratio_,
                               svd.explained_variance_ratio_, rtol=1e-3)
    for a, b in zip(dist.components_, svd.components_):
        sign = np.sign(np.dot(a, b))
        np.testing.assert_allclose(a * sign, b, atol=1e-3)


def test_fit_and_process_pca_roundtrip(tmp_path, rng):
    X = rng.randn(100, 16).astype(np.float32)
    labels = rng.randint(0, 2, 100)
    weights = tmp_path / "weights"
    model = fit_pca(X, str(weights), labels, ["a", "b"])
    assert (weights / "pca_model.pkl").exists()
    assert (weights / "PCA.png").exists()

    # the saved artifact is a REAL sklearn PCA (reference-pipeline pickle
    # compatibility: their run_dim_reduction pickle.loads it directly, in
    # an environment without this package) that transforms identically
    from sklearn.decomposition import PCA as SkPCA

    saved = load_pickle(str(weights / "pca_model.pkl"))
    assert isinstance(saved, SkPCA)
    np.testing.assert_allclose(saved.transform(X), model.transform(X),
                               atol=1e-5)

    in_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    in_dir.mkdir()
    save_pickle(X, str(in_dir / "C5_latent_space_after.pkl"))
    process_pca(str(in_dir), str(out_dir), str(weights), "C5")
    out = load_pickle(str(out_dir / "C5_latent_space_after_PCAed.pkl"))
    assert out.shape == (100, model.n_components_)
    np.testing.assert_allclose(out, model.transform(X), atol=1e-5)


def test_process_pca_accepts_sklearn_models(tmp_path, rng):
    """Reference-written pca_model.pkl (sklearn object) must work too."""
    sklearn = pytest.importorskip("sklearn")
    from sklearn.decomposition import PCA

    X = rng.randn(60, 8)
    weights = tmp_path / "w"
    weights.mkdir()
    ref = PCA(0.5).fit(X)
    save_pickle(ref, str(weights / "pca_model.pkl"))

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    save_pickle(X, str(in_dir / "C4_latent_space_after.pkl"))
    process_pca(str(in_dir), str(tmp_path / "o"), str(weights), "C4")
    out = load_pickle(str(tmp_path / "o" / "C4_latent_space_after_PCAed.pkl"))
    np.testing.assert_allclose(out, ref.transform(X))


def test_multipage_tiff_roundtrip(tmp_path, rng):
    from dynamorph_tpu.io.tiff import write_multipage_tiff

    import cv2

    stack = (rng.rand(3, 32, 48, 3) * 65535).astype(np.uint16)
    path = str(tmp_path / "s.tif")
    write_multipage_tiff(path, stack)
    ok, pages = cv2.imreadmulti(path, flags=cv2.IMREAD_UNCHANGED)
    assert ok and len(pages) == 3
    for i, p in enumerate(pages):
        # cv2 reads RGB TIFF as BGR
        np.testing.assert_array_equal(p[..., ::-1], stack[i])

    gray = (rng.rand(2, 16, 16) * 65535).astype(np.uint16)
    path2 = str(tmp_path / "g.tif")
    write_multipage_tiff(path2, gray)
    ok, pages = cv2.imreadmulti(path2, flags=cv2.IMREAD_UNCHANGED)
    assert ok and len(pages) == 2
    np.testing.assert_array_equal(pages[0], gray[0])


def test_pca_signs_topology_independent(rng):
    """Both fit algorithms must produce the SAME component signs (max-|value|
    element positive), so saved pca_model.pkl artifacts don't flip between
    single- and multi-device hosts."""
    from dynamorph_tpu.reduce.pca import fit_pca_device, fit_pca_distributed

    X = (rng.rand(200, 24) @ rng.rand(24, 24)).astype(np.float32)
    a = fit_pca_device(X, 0.9)
    b = fit_pca_distributed(X, 0.9)
    k = min(a.n_components_, b.n_components_)
    np.testing.assert_allclose(a.components_[:k], b.components_[:k],
                               atol=1e-3)
    for comps in (a.components_, b.components_):
        mx = comps[np.arange(len(comps)), np.abs(comps).argmax(axis=1)]
        assert (mx > 0).all()
