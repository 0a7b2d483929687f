"""Morphodynamic state clustering over latent trajectories.

Behavioral spec: reference HiddenStateExtractor/deprecated/
{morphology_clustering.py, movement_clustering.py} — k-means over short
trajectory windows of latent/PC descriptors (and their frame-to-frame
diffs) to discover discrete morphodynamic states, plus movement-magnitude
clustering (stagnant / minor-moving / moving). Cleaned, parameterised
equivalents of the reference's hard-coded scripts.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


def short_traj_morphology(vs: np.ndarray, traj_list: Sequence[Sequence[int]],
                          length: int = 5) -> np.ndarray:
    """Sliding windows of per-patch descriptors along trajectories
    (reference morphology_clustering.py:103-113).

    Args:
        vs: (N, D) per-patch descriptor matrix (latents or PCs).
        traj_list: list of trajectories as patch-index lists.

    Returns (n_windows, length * D) array.
    """
    out = []
    for traj in traj_list:
        for i in range(len(traj) - length + 1):
            window = traj[i: i + length]
            out.append(np.concatenate([vs[j] for j in window]))
    return np.stack(out) if out else np.zeros((0, length * vs.shape[1]))


def kmeans_on_short_trajs(vs: np.ndarray,
                          traj_list: Sequence[Sequence[int]],
                          length: int = 5, n_clusters: int = 4,
                          diffs: bool = False, seed: int = 0):
    """K-means over short trajectory windows (reference
    morphology_clustering.py:115-141). With ``diffs``, cluster frame-to-frame
    descriptor changes instead of raw values.

    Returns (fitted KMeans, window features, window labels).
    """
    from sklearn.cluster import KMeans

    feats = short_traj_morphology(vs, traj_list, length=length)
    if diffs:
        d = vs.shape[1]
        feats = feats.reshape(len(feats), -1, d)
        feats = np.diff(feats, axis=1).reshape(len(feats), -1)
    km = KMeans(n_clusters=n_clusters, random_state=seed, n_init=10)
    labels = km.fit_predict(feats)
    return km, feats, labels


def movement_state_clustering(trajectories_positions: Sequence[Dict],
                              length: int = 5, n_clusters: int = 3,
                              seed: int = 0):
    """Cluster trajectories into movement states by displacement magnitude
    (reference movement_clustering.py:96-160: stagnant / minor_moving /
    moving by mean step displacement of k-means clusters).

    Returns {state_name: [trajectory indices]}.
    """
    from sklearn.cluster import KMeans

    from .trajectory_dynamics import generate_short_traj_collections

    windows = []
    owners = []
    for ti, traj in enumerate(trajectories_positions):
        segs = generate_short_traj_collections([traj], length=length)
        for s in segs:
            # per-step displacement magnitudes (log1p-compressed): movement
            # states are magnitude phenomena; clustering raw windows (as the
            # deprecated reference script did) mostly encodes direction
            steps = np.linalg.norm(np.diff(s, axis=0), axis=1)
            windows.append(np.log1p(np.sort(steps)))
        owners.extend([ti] * len(segs))
    if not windows:
        return {"stagnant": [], "minor_moving": [], "moving": []}
    windows = np.stack(windows)
    owners = np.asarray(owners)

    km = KMeans(n_clusters=n_clusters, random_state=seed, n_init=10)
    win_labels = km.fit_predict(windows)
    # order clusters by mean displacement magnitude
    mags = []
    for c in range(n_clusters):
        mags.append(float(np.mean(windows[win_labels == c])))
    order = np.argsort(mags)
    names = ["stagnant", "minor_moving", "moving"][:n_clusters]
    cluster_name = {int(order[i]): names[i] for i in range(n_clusters)}

    # assign each trajectory the majority state of its windows
    out: Dict[str, List[int]] = {n: [] for n in names}
    for ti in np.unique(owners):
        labs = win_labels[owners == ti]
        major = np.bincount(labs, minlength=n_clusters).argmax()
        out[cluster_name[int(major)]].append(int(ti))
    return out
