"""UMAP dimensionality reduction (host-side, fit-only).

Behavioral spec: reference run_dim_reduction.py:143-207 — grid over
n_neighbors x (a, b), save [embedding, labels] pickles + multi-panel UMAP.png.
The reference keeps UMAP fit-only (saved models from umap>=0.5 can't be
pickled for transform, run_dim_reduction.py:255-256); same here.

umap-learn is an optional dependency; calls raise a clear ImportError when it
is unavailable in the environment.

Version pin + API surface (umap-learn is absent in the offline build/test
environment, so this module is exercised against a stub in tests/test_umap.py;
record here EXACTLY what the real package must provide):

- Pin: ``umap-learn>=0.5.1`` — the reference's own requirement
  (reference requirements/default.txt:16); the fit-only contract exists
  BECAUSE 0.5+ models aren't reliably picklable for later transform
  (reference run_dim_reduction.py:255-256).
- Constructor: ``umap.UMAP(a=<float>, b=<float>, n_neighbors=<int>)`` —
  keyword-only use; ``a``/``b`` are the curve parameters (both or neither
  must be given to umap-learn, which this module guarantees by iterating
  ``zip(a_s, b_s)``), stable in 0.5.x.
- Methods: ``UMAP.fit_transform(X: (N, D) float array) -> (N, 2) float
  array`` and, for pre-0.5 model pickles fed to ``umap_transform``,
  ``UMAP.transform(X) -> (N, 2)``.

Nothing else of the package is touched, so any 0.5.x release satisfies the
contract; re-validate the ``a``/``b`` kwarg handling if moving to 0.6+.
"""
from __future__ import annotations

import logging
import os
from typing import Sequence

import numpy as np

from ..io.pickles import save_pickle
from .pca import zoom_axis

log = logging.getLogger(__name__)


class _NativeUMAPModule:
    """umap-learn-shaped shim exposing the native fit (reduce/umap_native.py)
    under the ``umap.UMAP`` constructor contract this module documents."""

    @staticmethod
    def UMAP(**kwargs):
        from .umap_native import NativeUMAP

        return NativeUMAP(**kwargs)


def _require_umap():
    try:
        import umap  # noqa: F401

        return umap
    except ImportError:
        log.warning(
            "umap-learn is not installed — using the native JAX/numpy "
            "UMAP fit (reduce/umap_native.py: same fuzzy-simplicial-set "
            "construction; batched negative-sampling SGD, deterministic "
            "under seed). Install umap-learn>=0.5.1 for the exact "
            "upstream optimizer.")
        return _NativeUMAPModule


def fit_umap(train_data: np.ndarray, weights_dir: str, labels,
             conditions: Sequence[str], n_nbrs=(15, 50, 200),
             a_s=(1.58,), b_s=(0.9,)) -> None:
    """Fit UMAP over a parameter grid and save embeddings + plots
    (reference run_dim_reduction.py:143-207)."""
    import matplotlib

    matplotlib.use("AGG")
    import matplotlib.pyplot as plt

    umap = _require_umap()
    os.makedirs(weights_dir, exist_ok=True)
    # the loop iterates zip(a_s, b_s), so the panel count must too (the
    # reference sizes by the a x b product AND floors the row count,
    # run_dim_reduction.py:167-170 — it crashes or draws blank panels on
    # any non-default grid; sizing by what is actually drawn is identical
    # on the reference's default 3x1 grid)
    n_plots = len(n_nbrs) * len(list(zip(a_s, b_s)))
    n_cols = 3
    n_rows = max(int(np.ceil(n_plots / n_cols)), 1)
    fig, ax = plt.subplots(n_rows, n_cols, squeeze=False)
    ax = ax.flatten()
    for unused in ax[n_plots:]:
        unused.axis("off")
    fig.set_size_inches((6.5 * n_cols, 5 * n_rows))
    axis_count = 0
    for n_nbr in n_nbrs:
        for a, b in zip(a_s, b_s):
            reducer = umap.UMAP(a=a, b=b, n_neighbors=n_nbr)
            embedding = reducer.fit_transform(train_data)
            save_pickle([embedding, labels], os.path.join(
                weights_dir, f"umap_nbr{n_nbr}_a{a}_b{b}.pkl"))
            scatter = ax[axis_count].scatter(
                embedding[:, 0], embedding[:, 1], s=7, c=labels,
                cmap="Paired", alpha=0.1)
            scatter.set_facecolor("none")
            ax[axis_count].set_title(f"n_neighbors={n_nbr}", fontsize=12)
            zoom_axis(embedding[:, 0], embedding[:, 1], ax[axis_count])
            if axis_count == n_plots - 1:
                # condition legend on the last DRAWN panel only
                # (reference run_dim_reduction.py:194-199 gates on the
                # grid's last axis, which its own ceil-free sizing made
                # the same thing on the default grid)
                ax[axis_count].legend(
                    handles=scatter.legend_elements()[0],
                    title="condition", labels=list(conditions),
                    loc="center left", bbox_to_anchor=(1, 0.5),
                    fontsize="small")
            ax[axis_count].set_xlabel("UMAP 1")
            ax[axis_count].set_ylabel("UMAP 2")
            axis_count += 1
            fig.savefig(os.path.join(weights_dir, "UMAP.png"), dpi=300,
                        bbox_inches="tight")
    plt.close(fig)


def umap_transform(input_dir: str, output_dir: str, weights_dir: str,
                   prefix: str, suffix: str = "_after") -> None:
    """Apply saved UMAP models (reference run_dim_reduction.py:94-127)."""
    from ..io.pickles import load_pickle

    os.makedirs(output_dir, exist_ok=True)
    model_fnames = [f for f in os.listdir(weights_dir)
                    if f.startswith("umap") and f.endswith(".pkl")]
    for fname in model_fnames:
        model_name = os.path.splitext(fname)[0]
        try:
            model = load_pickle(os.path.join(weights_dir, fname))
        except ModuleNotFoundError as e:
            if e.name and e.name.split(".")[0] == "umap":
                # unpickling a fitted pre-0.5 model imports the real
                # package (the native fit has no transform contract)
                raise ImportError(
                    "umap-learn is required for UMAP transform of pre-0.5 "
                    "model pickles; install it or use method='pca'") from e
            raise
        if not hasattr(model, "transform"):
            # fit_umap saves [embedding, labels] pickles under the same
            # umap* prefix (fit-only contract); skip those rather than
            # crashing on list.transform
            log.warning("skipping %s: not a fitted UMAP model", fname)
            continue
        from ..io.compact import load_array_any

        # latents may be pickle or compact npz (io/compact.py)
        dats = load_array_any(os.path.join(
            input_dir, f"{prefix}_latent_space{suffix}.pkl"))
        dats_ = model.transform(dats)
        save_pickle(dats_, os.path.join(
            output_dir, f"{prefix}_latent_space{suffix}_{model_name}.pkl"))
