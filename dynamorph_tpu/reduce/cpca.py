"""Contrastive PCA over latent vectors.

Behavioral spec: reference HiddenStateExtractor/deprecated/cpca.py (which
delegated to the external `contrastive` package): find directions that
maximise target-set variance relative to background-set variance —
eigenvectors of C_target - alpha * C_background (Abid et al., Nat. Comm.
2018). Implemented here directly as one XLA eigendecomposition per alpha,
with the package's log-spaced alpha spectrum.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def _cov(X: np.ndarray) -> np.ndarray:
    Xc = X - X.mean(axis=0)
    return (Xc.T @ Xc) / max(len(X) - 1, 1)


def fit_cpca(target: np.ndarray, background: np.ndarray,
             n_components: int = 2,
             alphas: Sequence[float] = (0.0, 1.0, 10.0, 100.0)
             ) -> List[Tuple[float, np.ndarray, np.ndarray]]:
    """For each alpha: top eigenvectors of C_target - alpha*C_background.

    Returns a list of (alpha, components (k, D), projected target (N, k)).
    Runs on device when jax is importable, else numpy.
    """
    try:
        import jax.numpy as jnp

        def eigh(M):
            w, v = jnp.linalg.eigh(jnp.asarray(M, jnp.float32))
            return np.asarray(w), np.asarray(v)
    except ImportError:  # pragma: no cover
        def eigh(M):
            return np.linalg.eigh(M)

    c_t = _cov(np.asarray(target, np.float64))
    c_b = _cov(np.asarray(background, np.float64))
    t_centered = target - target.mean(axis=0)
    out = []
    for alpha in alphas:
        w, v = eigh(c_t - alpha * c_b)
        order = np.argsort(w)[::-1][:n_components]
        components = v[:, order].T          # (k, D)
        projected = t_centered @ components.T
        out.append((float(alpha), components, projected))
    return out


def auto_alphas(max_log_alpha: float = 3.0, n_alphas: int = 4
                ) -> np.ndarray:
    """Log-spaced alpha spectrum like the contrastive package's defaults."""
    return np.concatenate([[0.0], np.logspace(-1, max_log_alpha,
                                              n_alphas - 1)])
