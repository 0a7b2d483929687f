"""PCA over latent vectors, TPU-native.

Behavioral spec: reference run_dim_reduction.py:14-92 — fit PCA keeping the
top PCs that explain 50% of variance (sklearn `PCA(0.5)`), save
``pca_model.pkl`` + a PC1/PC2 scatter PNG, and transform latent pickles to
``*_PCAed.pkl``.

The fit runs as one XLA SVD/matmul on device instead of sklearn's CPU LAPACK
path; component-count selection replicates sklearn's n_components=0.5
semantics exactly. The saved ``pca_model.pkl`` is a REAL
sklearn.decomposition.PCA (re-materialised from the device fit) so the
reference pipeline — or any sklearn environment — unpickles it directly;
``process_pca`` accepts both that and this module's internal ``PCAModel``.
"""
from __future__ import annotations

import os
from typing import Sequence

import numpy as np

from ..io.pickles import load_pickle, save_pickle


class PCAModel:
    """Minimal sklearn-compatible PCA container (fit on device)."""

    def __init__(self, components: np.ndarray, mean: np.ndarray,
                 explained_variance: np.ndarray,
                 explained_variance_ratio: np.ndarray):
        self.components_ = components
        self.mean_ = mean
        self.explained_variance_ = explained_variance
        self.explained_variance_ratio_ = explained_variance_ratio
        self.n_components_ = components.shape[0]

    def transform(self, X: np.ndarray) -> np.ndarray:
        return (np.asarray(X) - self.mean_) @ self.components_.T


def _as_sklearn_pca(pca: "PCAModel", n_samples: int):
    """Re-materialise the device-fit model as a genuine
    sklearn.decomposition.PCA so the saved ``pca_model.pkl`` unpickles in
    ANY environment with sklearn — including the reference pipeline, whose
    run_dim_reduction.py pickle.loads it directly (CLAUDE.md pickle-
    compatibility rule). Falls back to the PCAModel itself if sklearn is
    absent."""
    try:
        from sklearn.decomposition import PCA as SkPCA
    except ImportError:                              # pragma: no cover
        return pca
    m = SkPCA(n_components=pca.n_components_)
    m.components_ = np.asarray(pca.components_, np.float64)
    m.mean_ = np.asarray(pca.mean_, np.float64)
    m.explained_variance_ = np.asarray(pca.explained_variance_, np.float64)
    m.explained_variance_ratio_ = np.asarray(
        pca.explained_variance_ratio_, np.float64)
    m.singular_values_ = np.sqrt(
        np.maximum(m.explained_variance_, 0.0) * max(n_samples - 1, 1))
    m.n_components_ = pca.n_components_
    m.n_features_in_ = int(m.components_.shape[1])
    m.n_samples_ = int(n_samples)
    m.noise_variance_ = 0.0
    m.whiten = False
    return m


def _sign_normalize(components: np.ndarray) -> np.ndarray:
    """Deterministic per-component sign: the max-|value| element of each row
    is made positive. Applied by BOTH fit paths so saved pca_model.pkl /
    transformed features are identical regardless of which algorithm (SVD vs
    sharded-Gram eigh) or host topology produced them — eigenvector signs
    are otherwise arbitrary."""
    flips = np.sign(components[np.arange(len(components)),
                               np.argmax(np.abs(components), axis=1)])
    flips[flips == 0] = 1.0
    return components * flips[:, None]


def fit_pca_device(train_data: np.ndarray,
                   variance_fraction: float = 0.5) -> PCAModel:
    """Full SVD on device; keep the smallest k with cumulative explained
    variance ratio > variance_fraction (sklearn PCA(0.5) semantics)."""
    import jax
    import jax.numpy as jnp

    X = jnp.asarray(train_data, jnp.float32)
    mean = jnp.mean(X, axis=0)
    Xc = X - mean
    # economy SVD: (n, d) with d possibly > n
    _, s, vt = jnp.linalg.svd(Xc, full_matrices=False)
    n = train_data.shape[0]
    explained_variance = (s ** 2) / (n - 1)
    ratio = explained_variance / jnp.sum(explained_variance)
    csum = np.cumsum(np.asarray(ratio))
    k = int(np.searchsorted(csum, variance_fraction, side="right") + 1)
    k = min(k, len(csum))
    return PCAModel(
        components=_sign_normalize(np.asarray(vt)[:k]),
        mean=np.asarray(mean),
        explained_variance=np.asarray(explained_variance)[:k],
        explained_variance_ratio=np.asarray(ratio)[:k],
    )


def fit_pca_distributed(train_data: np.ndarray,
                        variance_fraction: float = 0.5,
                        mesh=None) -> PCAModel:
    """PCA via the covariance eigendecomposition with the Gram accumulation
    sharded over the device mesh.

    This is the distributed form of SURVEY §2.2's "PCA fit over pooled
    latents -> psum/distributed matmul": rows shard over the mesh's ``data``
    axis, XLA turns sum_i x_i x_i^T into per-shard matmuls + an all-reduce,
    and only the (D, D) covariance is materialised globally. Mathematically
    identical to the SVD path (components up to sign; verified in tests);
    preferable when N >> D or N is too large to gather.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..core.mesh import local_mesh, shard_batch

    n, d = train_data.shape
    if mesh is None:
        # LOCAL devices only: the pooled fit runs on ONE process (the
        # orchestrator fits on process 0 after a barrier), so a global mesh
        # would block in cross-process collectives the other hosts never
        # join. Single local device -> plain SVD path.
        mesh = local_mesh()
    if mesh is None:
        return fit_pca_device(train_data, variance_fraction)
    X, n_pad = shard_batch(train_data.astype(np.float32), mesh)
    # padding rows are edge-replicated by shard_batch; mask them out of the
    # statistics with a weight vector
    w = np.ones((X.shape[0],), np.float32)
    if n_pad:
        w[-n_pad:] = 0.0
    w = jax.device_put(w, NamedSharding(mesh, P("data")))

    @jax.jit
    def stats(X, w):
        total = jnp.sum(w)
        mean = jnp.sum(X * w[:, None], axis=0) / total
        Xc = (X - mean) * w[:, None]
        cov = jnp.dot(Xc.T, Xc, preferred_element_type=jnp.float32) / (total - 1)
        return mean, cov

    mean, cov = stats(X, w)
    evals, evecs = jnp.linalg.eigh(cov)          # ascending
    evals = np.asarray(evals)[::-1]
    evecs = np.asarray(evecs)[:, ::-1].T          # (D, D) rows = components
    evals = np.maximum(evals, 0.0)
    ratio = evals / max(evals.sum(), 1e-30)
    csum = np.cumsum(ratio)
    k = int(np.searchsorted(csum, variance_fraction, side="right") + 1)
    k = min(k, d)
    return PCAModel(components=_sign_normalize(evecs[:k]),
                    mean=np.asarray(mean),
                    explained_variance=evals[:k],
                    explained_variance_ratio=ratio[:k])


def zoom_axis(x, y, ax, zoom_cutoff: float = 1):
    """Percentile-zoomed axes (reference run_dim_reduction.py:129-141)."""
    xlim = [np.percentile(x, zoom_cutoff), np.percentile(x, 100 - zoom_cutoff)]
    ylim = [np.percentile(y, zoom_cutoff), np.percentile(y, 100 - zoom_cutoff)]
    ax.set_xlim(left=xlim[0], right=xlim[1])
    ax.set_ylim(bottom=ylim[0], top=ylim[1])


def fit_pca(train_data: np.ndarray, weights_dir: str, labels,
            conditions: Sequence[str],
            variance_fraction: float = 0.5) -> PCAModel:
    """Fit + save pca_model.pkl + PCA.png scatter
    (reference run_dim_reduction.py:14-51)."""
    import matplotlib

    matplotlib.use("AGG")
    import matplotlib.pyplot as plt

    os.makedirs(weights_dir, exist_ok=True)
    import jax

    if len(jax.local_devices()) > 1:
        # multi-device hosts: shard the Gram accumulation over the LOCAL
        # mesh (equal components up to sign — see fit_pca_distributed)
        pca = fit_pca_distributed(train_data, variance_fraction)
    else:
        pca = fit_pca_device(train_data, variance_fraction)
    pcas = pca.transform(train_data)
    # saved as a real sklearn PCA: unpicklable by the reference pipeline
    # (and any sklearn env) — PCAModel would need this package installed
    save_pickle(_as_sklearn_pca(pca, len(train_data)),
                os.path.join(weights_dir, "pca_model.pkl"))

    plt.clf()
    fig, ax = plt.subplots()
    # fewer than 2 retained PCs: plot PC1 vs zeros
    pc2 = pcas[:, 1] if pcas.shape[1] > 1 else np.zeros(len(pcas))
    scatter = ax.scatter(pcas[:, 0], pc2, s=7, c=labels,
                         cmap="Paired", alpha=0.1)
    scatter.set_facecolor("none")
    zoom_axis(pcas[:, 0], pc2, ax, zoom_cutoff=1)
    try:
        ax.legend(handles=scatter.legend_elements()[0], loc="upper right",
                  title="condition", labels=list(conditions))
    except Exception:
        pass
    ax.set_xlabel("PC 1")
    ax.set_ylabel("PC 2")
    plt.savefig(os.path.join(weights_dir, "PCA.png"), dpi=300)
    plt.close(fig)
    return pca


def process_pca(input_dir: str, output_dir: str, weights_dir: str,
                prefix: str, suffix: str = "_after") -> None:
    """Transform latent pickles with a saved PCA model
    (reference run_dim_reduction.py:53-92). Note the reference formats the
    input name as '{prefix}_latent_space_{suffix}.pkl' with suffix='_after',
    i.e. '..._latent_space__after.pkl' — we reproduce its *output* naming but
    read the actual latent files written by process_vae."""
    os.makedirs(output_dir, exist_ok=True)
    model_path = os.path.join(weights_dir, "pca_model.pkl")
    try:
        pca = load_pickle(model_path)
    except Exception as ex:
        raise ValueError(f"Error in loading pre-saved PCA weights: {ex}")

    from ..io.compact import load_array_any

    input_fname = f"{prefix}_latent_space{suffix}.pkl"
    output_fname = f"{prefix}_latent_space{suffix}_PCAed.pkl"
    # latents may be pickle or compact npz (io/compact.py)
    dats = load_array_any(os.path.join(input_dir, input_fname))
    dats_ = pca.transform(dats)
    save_pickle(dats_, os.path.join(output_dir, output_fname))
