"""Instance segmentation: foreground clustering of semantic-segmentation maps.

Behavioral spec: reference SingleCellPatch/instance_clustering.py:20-137.
Foreground = mean background prob < fg_thr; DBSCAN(eps=10, min_samples=250)
over foreground pixel coordinates; size filter (500, 12000) px; cells with
>5% of pixels outside the 256x256 window are dropped.

The DBSCAN fit over 1e5-1e6 pixels is the stage's CPU bottleneck (reference
call stack, SURVEY.md §3.2). ``neighbor_counts_device`` offloads the O(N*r^2)
neighborhood counting to the TPU as a disk convolution; the exact
component-labelling stays on host for strict parity with sklearn's DBSCAN.
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

from ..io.pickles import save_pickle

# Frames with fewer foreground pixels than this early-out with no cells and
# no instance-map PNG (reference instance_clustering.py:69-70).
MIN_FG_PIXELS = 1000


def within_range(r, pos) -> bool:
    """Is pos inside window r = ((x_lo, x_hi), (y_lo, y_hi))
    (reference instance_clustering.py:20-36)."""
    if pos[0] >= r[0][1] or pos[0] < r[0][0]:
        return False
    if pos[1] >= r[1][1] or pos[1] < r[1][0]:
        return False
    return True


def check_segmentation_dim(segmentation: np.ndarray) -> np.ndarray:
    """Ensure (n_classes, z, x, y); add background channel for binary masks
    (reference instance_clustering.py:39-55)."""
    assert segmentation.ndim == 4, \
        "Semantic segmentation should be formatted with dimension (c, z, x, y)"
    if segmentation.shape[0] == 1:
        segmentation = np.concatenate([1 - segmentation, segmentation], axis=0)
    assert np.allclose(segmentation.sum(0), 1.0), \
        "Semantic segmentation doesn't sum up to 1"
    return segmentation


def instance_clustering(cell_segmentation: np.ndarray,
                        ct_thr: Tuple[int, int] = (500, 12000),
                        instance_map: bool = True,
                        map_path: Optional[str] = None,
                        fg_thr: float = 0.3,
                        dbscan_thr: Tuple[int, int] = (10, 250)):
    """Cluster foreground pixels of one frame into cell instances
    (reference instance_clustering.py:58-137).

    Returns (cell_positions [(id, center)...], fg pixel coords (N, 2),
    per-pixel labels (N,)).

    The DBSCAN fit uses the native exact grid solver
    (dynamorph_tpu/native/grid_dbscan.cpp, ~9x faster than sklearn at frame
    scale with IDENTICAL labels); sklearn is the automatic fallback.
    """
    cell_segmentation = check_segmentation_dim(cell_segmentation)
    all_cells = np.mean(cell_segmentation[0], axis=0) < fg_thr
    positions = np.array(list(zip(*np.where(all_cells))))
    return cluster_foreground_positions(
        positions, cell_segmentation.shape[-2:], ct_thr=ct_thr,
        instance_map=instance_map, map_path=map_path, dbscan_thr=dbscan_thr)


def cluster_foreground_positions(positions: np.ndarray,
                                 shape: Tuple[int, int],
                                 ct_thr: Tuple[int, int] = (500, 12000),
                                 instance_map: bool = True,
                                 map_path: Optional[str] = None,
                                 dbscan_thr: Tuple[int, int] = (10, 250),
                                 threads: Optional[int] = None):
    """DBSCAN + size/window filtering over precomputed foreground pixel
    coordinates (row-major order, as np.where yields). Split out from
    ``instance_clustering`` so the device-resident fused seg->patch path can
    hand over only the (N, 2) coordinates instead of the full probability
    map (reference instance_clustering.py:58-137 minus the thresholding).

    ``threads`` caps the native solver's core-test threads (labels are
    identical for any value) — callers that already run frames in parallel
    pass cores/frame_workers to avoid oversubscription."""
    from ..native.dbscan import grid_dbscan

    if len(positions) < MIN_FG_PIXELS:
        return [], np.zeros((0, 2), dtype=int), np.zeros((0,), dtype=int)

    positions_labels = grid_dbscan(positions, eps=dbscan_thr[0],
                                   min_samples=dbscan_thr[1],
                                   shape=shape, threads=threads)
    cell_ids, point_cts = np.unique(positions_labels, return_counts=True)

    cell_positions = []
    for cell_id, ct in zip(cell_ids, point_cts):
        if cell_id < 0:
            continue  # noise
        if ct <= ct_thr[0] or ct >= ct_thr[1]:
            continue  # too small / too big
        points = positions[positions_labels == cell_id]
        mean_pos = np.mean(points, 0).astype(int)
        # vectorized within_range over the cluster (same semantics as the
        # reference's per-pixel loop, instance_clustering.py:113)
        lo = mean_pos - 128
        hi = mean_pos + 128
        n_outliers = int(np.sum(np.any((points < lo) | (points >= hi),
                                       axis=1)))
        if n_outliers > len(points) * 0.05:
            continue
        cell_positions.append((cell_id, mean_pos))

    if instance_map and map_path is not None:
        save_instance_map(cell_positions, positions, positions_labels,
                          shape, map_path)
    return cell_positions, positions, positions_labels


def save_instance_map(cell_positions, positions, positions_labels,
                      shape, map_path: str) -> None:
    """Instance map PNG, cells colored by id%10
    (reference instance_clustering.py:119-136).

    Uses the object-oriented matplotlib API (no pyplot global state) so it
    is safe to run on a background writer thread (io/prefetch.AsyncWriter)
    while the main thread renders other figures."""
    import matplotlib
    from copy import copy

    from matplotlib.backends.backend_agg import FigureCanvasAgg
    from matplotlib.figure import Figure

    segmented = np.zeros(shape) - 1
    for cell_id, _ in cell_positions:
        pts = positions[positions_labels == cell_id]
        segmented[pts[:, 0], pts[:, 1]] = cell_id % 10
    fig = Figure()
    FigureCanvasAgg(fig)
    ax = fig.add_subplot(111)
    cmap = copy(matplotlib.colormaps["tab10"])
    cmap.set_under(color="k")
    ax.imshow(segmented, cmap=cmap, vmin=-0.001, vmax=10.001)
    font = {"color": "white", "size": 4}
    for cell_id, mean_pos in cell_positions:
        ax.text(mean_pos[1], mean_pos[0], str(cell_id), fontdict=font)
    ax.axis("off")
    fig.savefig(map_path, dpi=300)


def process_site_instance_segmentation(raw_data: str, raw_data_segmented: str,
                                       site_supp_files_folder: str,
                                       **kwargs) -> None:
    """Per-site instance segmentation driver
    (reference instance_clustering.py:140-182). Saves cell_positions.pkl,
    cell_pixel_assignments.pkl and per-frame instance-map PNGs."""
    image_stack = np.load(raw_data)
    segmentation_stack = np.load(raw_data_segmented)
    os.makedirs(site_supp_files_folder, exist_ok=True)

    cell_positions: Dict[int, list] = {}
    cell_pixel_assignments: Dict[int, tuple] = {}
    for t_point in range(image_stack.shape[0]):
        cell_segmentation = segmentation_stack[t_point]
        map_path = os.path.join(site_supp_files_folder,
                                "segmentation_%d.png" % t_point)
        res = instance_clustering(cell_segmentation, instance_map=True,
                                  map_path=map_path, **kwargs)
        cell_positions[t_point] = res[0]
        cell_pixel_assignments[t_point] = res[1:]
    save_pickle(cell_positions,
                os.path.join(site_supp_files_folder, "cell_positions.pkl"))
    save_pickle(cell_pixel_assignments,
                os.path.join(site_supp_files_folder,
                             "cell_pixel_assignments.pkl"))
