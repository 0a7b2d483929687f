"""Paper-figure generators: parameterized equivalents of every figure family
in the reference's plot scripts (reference plot_scripts/plottings.py:1-1061,
plotting_cm.py:1-94, B4_temp.py). The reference scripts are one-off code with
hard-coded cluster paths; these are reusable functions taking arrays and
writing files, runnable on any pipeline output.

Figure-family map (reference location -> function here):
- patch montages / movies (plottings.py:52-79)        -> plot_patches, save_patch_movie
- class-probability overlays (Fig 2 A2/A3, :96-125)   -> plot_class_probabilities
- instance separation coloring (Fig 2 B1, :180-204)   -> plot_instance_separation
- bounding boxes on frames (Fig 2 B2, :205-237)       -> draw_cell_boxes
- frame-to-frame matching figure (Fig 2 C1, :260-354) -> plot_frame_matching
- trajectory overlay on a frame (Fig 4 B, :897-924)   -> plot_trajectory_on_frame
- PCA/UMAP scatter per condition (plotting_cm.py:40-93,
  Fig 3 B/C :426-541)                                 -> plot_embedding_scatter
- explained variance (Supp Fig 6, :451-464)           -> plot_explained_variance
- PC-vs-property scatter/density (Supp Fig 2,
  :594-634)                                           -> plot_pc_vs_property
- PC/property correlation matrix (Supp Fig 4,
  :746-791)                                           -> plot_correlation_matrix
- trajectory vs non-trajectory distributions
  (Supp Fig 5, :795-833)                              -> plot_distribution_comparison
- PC1/speed joint KDE (Fig 4 A, :837-893)             -> plot_joint_kde
- two-mode violin plot (Fig 4 C, :934-963)            -> plot_violin_modes
- MSD curves of modes (Fig 4 D, :968-1061)            -> analysis/trajectory_dynamics.plot_msd
- PC-bin sample montages (Fig 3 B patches,
  PC_samples.py)                                      -> analysis/pc_samples.pc_sample_montage
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import matplotlib

matplotlib.use("Agg")
import matplotlib.cm
import numpy as np
from matplotlib.backends.backend_agg import FigureCanvasAgg
from matplotlib.figure import Figure

# Object-oriented matplotlib throughout (no pyplot globals) so every figure
# helper is safe on io.prefetch.AsyncWriter threads; the one exception is
# the seaborn JointGrid figure, which closes its pyplot figure locally.


def _fig_ax(**kw):
    fig = Figure(**kw)
    FigureCanvasAgg(fig)
    return fig, fig.add_subplot(111)

from .pc_samples import enhance_contrast


# ---------------------------------------------------------------------------
# Raw-image figures
# ---------------------------------------------------------------------------

def _to_rgb_u8(frame: np.ndarray) -> np.ndarray:
    """uint16-range grayscale frame -> (H, W, 3) uint8 canvas."""
    g = (np.asarray(frame, np.float64) / 256.0).clip(0, 255).astype(np.uint8)
    return np.repeat(g[:, :, None], 3, axis=2)


def plot_patches(patches: np.ndarray, out_dir: str, prefix: str = "patch",
                 a: float = 1.5, b: float = -10000.0) -> list:
    """Contrast-enhanced patch PNGs (reference plottings.py:52-63).

    patches: (N, H, W) uint16-range grayscale.
    """
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, p in enumerate(np.asarray(patches)):
        out = np.clip(enhance_contrast(p.astype(np.float64), a, b), 0, 65535)
        path = os.path.join(out_dir, f"{prefix}_{i}.png")
        cv2.imwrite(path, out.astype(np.uint16))
        paths.append(path)
    return paths


def save_patch_movie(patches: np.ndarray, path: str, fps: int = 5,
                     a: float = 1.5, b: float = -10000.0) -> str:
    """Animated GIF of a patch sequence (reference plottings.py:65-79)."""
    import imageio

    frames = []
    for p in np.asarray(patches):
        out = np.clip(enhance_contrast(p.astype(np.float64), a, b), 0, 65535)
        frames.append((out / 256.0).clip(0, 255).astype(np.uint8))
    # imageio>=2.28 routes .gif through Pillow, whose duration unit is
    # MILLISECONDS — seconds here would write 0 ms frame delays
    imageio.mimsave(path, frames, duration=1000.0 / fps)
    return path


def plot_class_probabilities(probs: np.ndarray, path: str,
                             class_names: Optional[Sequence[str]] = None) -> str:
    """Per-class probability maps side by side (Fig 2 A2/A3 equivalents,
    reference plottings.py:96-125). probs: (n_classes, H, W) in [0, 1]."""
    probs = np.asarray(probs)
    n = probs.shape[0]
    fig = Figure(figsize=(4 * n, 4))
    FigureCanvasAgg(fig)
    axes = fig.subplots(1, n)
    if n == 1:
        axes = [axes]
    for i, ax in enumerate(axes):
        im = ax.imshow(probs[i], vmin=0, vmax=1, cmap="viridis")
        ax.set_title(class_names[i] if class_names else f"class {i}")
        ax.axis("off")
    fig.colorbar(im, ax=axes, shrink=0.7)
    fig.savefig(path, dpi=150)
    return path


def plot_instance_separation(frame: np.ndarray, positions: np.ndarray,
                             position_labels: np.ndarray, path: str,
                             alpha: float = 0.7) -> str:
    """Blend each cell's pixels with a per-cell tab10 color on the raw frame
    (Fig 2 B1, reference plottings.py:180-204).

    positions: (M, 2) pixel coords; position_labels: (M,) cell ids (-1 noise).
    """
    import cv2

    mat = _to_rgb_u8(frame).astype(np.float64)
    cmap = matplotlib.colormaps["tab10"]
    positions = np.asarray(positions)
    position_labels = np.asarray(position_labels)
    for cid in np.unique(position_labels):
        if cid < 0:
            continue
        pts = positions[position_labels == cid]
        color = np.array(cmap.colors[int(cid) % 10]) * 255.0
        mat[pts[:, 0], pts[:, 1]] = (
            (1 - alpha) * mat[pts[:, 0], pts[:, 1]] + alpha * color)
    cv2.imwrite(path, mat.astype(np.uint8))
    return path


def draw_cell_boxes(frame: np.ndarray, centers: Sequence, path: str,
                    colors=None, half: int = 64, thickness: int = 3) -> str:
    """Square boxes around cell centers on the raw frame (Fig 2 B2,
    reference plottings.py:205-237 add_box)."""
    import cv2

    mat = _to_rgb_u8(frame)
    h, w = mat.shape[:2]
    if colors is None:
        colors = [(0, 255, 0)] * len(centers)
    for c, col in zip(centers, colors):
        y0, y1 = int(max(c[0] - half, 0)), int(min(c[0] + half, h - 1))
        x0, x1 = int(max(c[1] - half, 0)), int(min(c[1] + half, w - 1))
        cv2.rectangle(mat, (x0, y0), (x1, y1), tuple(int(v) for v in col),
                      thickness)
    cv2.imwrite(path, mat)
    return path


def plot_frame_matching(frame0: np.ndarray, frame1: np.ndarray,
                        positions0: np.ndarray, positions1: np.ndarray,
                        pairs: Sequence, path: str) -> str:
    """Two frames side by side with lines joining matched centroids
    (Fig 2 C1, reference plottings.py:260-354).

    pairs: sequence of (i0, i1) index pairs into positions0/positions1.
    """
    f0, f1 = _to_rgb_u8(frame0), _to_rgb_u8(frame1)
    h = max(f0.shape[0], f1.shape[0])
    gap = 20
    canvas = np.full((h, f0.shape[1] + gap + f1.shape[1], 3), 255, np.uint8)
    canvas[:f0.shape[0], :f0.shape[1]] = f0
    canvas[:f1.shape[0], f0.shape[1] + gap:] = f1
    off = f0.shape[1] + gap
    fig, ax = _fig_ax(figsize=(12, 6))
    ax.imshow(canvas)
    cmap = matplotlib.colormaps["tab10"]
    for k, (i, j) in enumerate(pairs):
        p0 = positions0[i]
        p1 = positions1[j]
        ax.plot([p0[1], p1[1] + off], [p0[0], p1[0]],
                color=cmap(k % 10), linewidth=1.5)
        ax.scatter([p0[1], p1[1] + off], [p0[0], p1[0]],
                   color=cmap(k % 10), s=12)
    ax.axis("off")
    fig.savefig(path, dpi=150, bbox_inches="tight")
    return path


def plot_trajectory_on_frame(frame: np.ndarray, positions: np.ndarray,
                             path: str, color=(53, 52, 205),
                             thickness: int = 2,
                             origin: Optional[np.ndarray] = None) -> str:
    """Draw a trajectory's path as line segments over its first frame
    (Fig 4 B, reference plottings.py:897-924).

    positions: (T, 2) (y, x) centroids; origin: top-left of the frame crop in
    stack coordinates (defaults to positions[0] - frame_center).
    """
    import cv2

    mat = _to_rgb_u8(frame)
    positions = np.asarray(positions, np.int64)
    if origin is None:
        origin = positions[0] - np.array([mat.shape[0] // 2,
                                          mat.shape[1] // 2])
    rel = positions - np.asarray(origin)
    for i in range(len(rel) - 1):
        cv2.line(mat, (int(rel[i][1]), int(rel[i][0])),
                 (int(rel[i + 1][1]), int(rel[i + 1][0])),
                 tuple(int(v) for v in color), thickness=thickness)
    cv2.imwrite(path, mat)
    return path


# ---------------------------------------------------------------------------
# Embedding figures
# ---------------------------------------------------------------------------

# one implementation for both figure families (reference defines it twice,
# plotting_cm.py:9-13 and run_dim_reduction.py:129-141, identically)
from ..reduce.pca import zoom_axis  # noqa: E402  (re-export)


def plot_embedding_scatter(embedding: np.ndarray, path: str,
                           labels: Optional[np.ndarray] = None,
                           conditions: Optional[Sequence[str]] = None,
                           values: Optional[np.ndarray] = None,
                           zoom_cutoff: float = 1.0, cmap: str = "Paired",
                           xlabel: str = "PC 1", ylabel: str = "PC 2",
                           dims=(0, 1), s: float = 7.0,
                           alpha: float = 0.1) -> str:
    """PCA/UMAP scatter, colored by condition labels or continuous values
    (reference plotting_cm.py:40-93 per-condition scatter; plottings.py:
    487-541 continuous size coloring with BuPu cmap)."""
    emb = np.asarray(embedding)
    x, y = emb[:, dims[0]], emb[:, dims[1]]
    fig, ax = _fig_ax()
    if values is not None:
        sc = ax.scatter(x, y, s=s, c=np.asarray(values), cmap=cmap,
                        alpha=alpha)
        fig.colorbar(sc, ax=ax)
    elif labels is not None:
        sc = ax.scatter(x, y, s=s, c=np.asarray(labels), cmap=cmap,
                        alpha=alpha)
        sc.set_facecolor("none")
        if conditions is not None:
            ax.legend(handles=sc.legend_elements()[0], loc="upper right",
                      title="condition", labels=list(conditions))
    else:
        ax.scatter(x, y, s=s, alpha=alpha)
    zoom_axis(x, y, ax, zoom_cutoff)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    fig.savefig(path, dpi=300)
    return path


def plot_explained_variance(explained_variance_ratio: np.ndarray,
                            path: str) -> str:
    """Cumulative explained variance vs number of PCs (Supp Fig 6,
    reference plottings.py:451-464)."""
    r = np.asarray(explained_variance_ratio)
    fig, ax = _fig_ax()
    ax.plot(np.arange(1, len(r) + 1), np.cumsum(r), ".-")
    ax.set_xlabel("Number of principal components")
    ax.set_ylabel("Cumulative explained variance")
    ax.set_ylim(0, 1)
    fig.savefig(path, dpi=300)
    return path


def plot_pc_vs_property(pc_values: np.ndarray, prop: np.ndarray, path: str,
                        xlabel: str = "PC 1", ylabel: str = "property",
                        log_prop: bool = False, density: bool = False) -> str:
    """Scatter (or 2-D histogram density) of a PC against a morphology
    property (Supp Fig 2, reference plottings.py:594-634)."""
    p = np.log(np.asarray(prop)) if log_prop else np.asarray(prop)
    fig, ax = _fig_ax()
    if density:
        h = ax.hist2d(pc_values, p, bins=40, cmap="Blues")
        fig.colorbar(h[3], ax=ax)
    else:
        ax.scatter(pc_values, p, s=5, alpha=0.2)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(("log " if log_prop else "") + ylabel)
    fig.savefig(path, dpi=300)
    return path


def plot_correlation_matrix(components: np.ndarray, properties: Dict[str, np.ndarray],
                            path: str, n_components: int = 6) -> str:
    """Pearson-correlation heatmap between leading PCs and morphology
    properties (Supp Fig 4, reference plottings.py:746-791)."""
    comp = np.asarray(components)[:, :n_components]
    names = list(properties)
    mat = np.zeros((comp.shape[1], len(names)))
    for j, name in enumerate(names):
        v = np.asarray(properties[name], np.float64)
        for i in range(comp.shape[1]):
            mat[i, j] = np.corrcoef(comp[:, i], v)[0, 1]
    fig, ax = _fig_ax(figsize=(1.2 * len(names) + 2,
                                    0.8 * comp.shape[1] + 2))
    im = ax.imshow(mat, vmin=-1, vmax=1, cmap="coolwarm")
    ax.set_xticks(range(len(names)))
    ax.set_xticklabels(names, rotation=45, ha="right")
    ax.set_yticks(range(comp.shape[1]))
    ax.set_yticklabels([f"PC {i + 1}" for i in range(comp.shape[1])])
    for i in range(mat.shape[0]):
        for j in range(mat.shape[1]):
            ax.text(j, i, f"{mat[i, j]:.2f}", ha="center", va="center",
                    fontsize=8)
    fig.colorbar(im, ax=ax, shrink=0.8)
    fig.savefig(path, dpi=300, bbox_inches="tight")
    return path


def plot_distribution_comparison(values_subset: np.ndarray,
                                 values_all: np.ndarray, path: str,
                                 xlabel: str = "PC 1",
                                 labels=("in trajectories", "all")) -> str:
    """Overlaid density estimates of a quantity inside trajectories vs the
    whole dataset (Supp Fig 5, reference plottings.py:795-833)."""
    import seaborn as sns

    fig, ax = _fig_ax()
    sns.kdeplot(np.asarray(values_subset), ax=ax, label=labels[0],
                fill=True, alpha=0.3)
    sns.kdeplot(np.asarray(values_all), ax=ax, label=labels[1],
                fill=True, alpha=0.3)
    ax.set_xlabel(xlabel)
    ax.legend()
    fig.savefig(path, dpi=300)
    return path


def plot_joint_kde(x: np.ndarray, y: np.ndarray, path: str,
                   xlabel: str = "PC 1", ylabel: str = "log speed",
                   xlim=None, ylim=None) -> str:
    """Joint KDE with marginal histograms (Fig 4 A,
    reference plottings.py:837-893)."""
    import pandas as pd
    import seaborn as sns

    df = pd.DataFrame({xlabel: np.asarray(x), ylabel: np.asarray(y)})
    sns.set_style("white")
    g = sns.JointGrid(x=xlabel, y=ylabel, data=df, xlim=xlim, ylim=ylim)
    g.ax_marg_x.hist(df[xlabel], bins=20)
    g.ax_marg_y.hist(df[ylabel], bins=20, orientation="horizontal")
    g.plot_joint(sns.kdeplot, cmap="Blues", fill=True)
    g.savefig(path, dpi=300)
    import matplotlib.pyplot as plt

    plt.close(g.figure)
    return path


def plot_violin_modes(groups: Dict[str, np.ndarray], path: str,
                      ylabel: str = "average displacement") -> str:
    """Violin plot comparing per-mode distributions (Fig 4 C,
    reference plottings.py:934-963)."""
    names = list(groups)
    fig, ax = _fig_ax()
    ax.violinplot([np.asarray(groups[n]) for n in names],
                  showmedians=True)
    ax.set_xticks(range(1, len(names) + 1))
    ax.set_xticklabels(names)
    ax.set_ylabel(ylabel)
    fig.savefig(path, dpi=300)
    return path


def force_aspect(ax, aspect: float = 1.0) -> None:
    """Force a plot's display aspect ratio regardless of data ranges
    (reference plot_scripts/plottings.py forceAspect / B4_temp.py:9-12)."""
    xmin, xmax = ax.get_xlim()
    ymin, ymax = ax.get_ylim()
    ax.set_aspect(abs((xmax - xmin) / (ymax - ymin)) / aspect)
