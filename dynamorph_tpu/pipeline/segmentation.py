"""Semantic segmentation pipeline stage (drivers).

Behavioral spec: reference pipeline/segmentation.py:13-141.
"""
from __future__ import annotations

import logging
import os
from typing import Sequence

import numpy as np

from ..io.sites import site_supp_folder
from ..seg.inference import predict_whole_map
from ..seg.model import Segment

log = logging.getLogger(__name__)


def segmentation(raw_folder: str, supp_folder: str, val_folder: str,
                 sites: Sequence[str], config, **kwargs) -> None:
    """Semantic segmentation over sites (reference pipeline/segmentation.py:
    13-87): loads the U-Net, predicts each site's stack with tiled ensemble
    inference, saves <site>_NNProbabilities.npy + preview PNGs."""
    si = config.segmentation_inference
    if si.network != "UNet":
        raise NotImplementedError(
            f"segmentation model {si.network} not implemented")
    model = Segment(input_shape=(len(si.channels), si.window_size,
                                 si.window_size),
                    n_classes=si.num_classes)
    if not si.weights:
        raise ValueError("segmentation weights path must be provided")
    try:
        model.load(si.weights)
    except Exception as ex:
        log.error(ex)
        raise ValueError("Error in loading UNet weights")

    for site in sites:
        site_path = os.path.join(raw_folder, f"{site}.npy")
        if not os.path.exists(site_path):
            log.info("Site not found %s", site_path)
            continue
        log.info("Predicting %s", site_path)
        try:
            from ..core.profiling import stage_timer

            with stage_timer("segmentation", site=site):
                predict_whole_map(
                    site_path, model,
                    use_channels=np.array(si.channels).astype(int),
                    batch_size=si.batch_size,
                    n_supp=si.num_pred_rnd,
                    mode=getattr(si, "inference_mode", "tiled"), **kwargs)
        except Exception as ex:  # per-site failure tolerance (ref :76-86)
            log.error(ex)
            log.error("Error in predicting site %s", site)


def segmentation_validation(raw_folder: str, supp_folder: str,
                            val_folder: str, sites: Sequence[str],
                            config, **kwargs) -> None:
    """Render instance rims color-coded by predicted class onto raw frames
    as a multipage TIFF (reference pipeline/segmentation_validation.py:67-168).

    Rim color: green if mean non-MG prob > MG prob else red (:188-194).
    Note: the reference's 'mg'/'nonmg'/'both' category filters read a stale
    3-tuple cell_positions format that the current pipeline no longer writes;
    here cells are classified from the NN probabilities directly, and
    'unfiltered' renders every clustered cell.
    """
    from ..io.pickles import load_pickle

    category = config.segmentation_inference.seg_val_cat
    target = os.path.join(supp_folder, "validation_images")
    os.makedirs(target, exist_ok=True)

    for site in sites:
        raw_stack = np.load(os.path.join(raw_folder, f"{site}.npy"))
        nn_stack = np.load(os.path.join(raw_folder,
                                        f"{site}_NNProbabilities.npy"))
        supp = site_supp_folder(supp_folder, site)
        cell_pixels = load_pickle(
            os.path.join(supp, "cell_pixel_assignments.pkl"))
        cell_positions = load_pickle(os.path.join(supp, "cell_positions.pkl"))

        stack = []
        for t_point in range(len(raw_stack)):
            mat = raw_stack[t_point, 0, 0] if raw_stack.ndim == 5 \
                else raw_stack[t_point, :, :, 0]
            mat = np.stack([mat] * 3, 2)
            positions, inds = cell_pixels[t_point]
            if category == "unfiltered":
                ids = [i for i in np.unique(inds) if i >= 0]
            else:
                ids = []
                for cid, _ in cell_positions[t_point]:
                    pts = positions[inds == cid]
                    probs = nn_stack[t_point][
                        :, 0, pts[:, 0], pts[:, 1]].mean(1)
                    # class order is (BG, non-MG, MG) — a cell is MG when
                    # class 2 dominates class 1 (matches the rim colors:
                    # red=MG when probs[1] <= probs[2], _append_segmentation)
                    is_mg = probs[2] > probs[1]
                    if category == "both" or \
                            (category == "mg" and is_mg) or \
                            (category == "nonmg" and not is_mg):
                        ids.append(cid)
            for cid in ids:
                new_mat = _append_segmentation(positions, inds, cid,
                                               nn_stack, t_point, mat)
                if new_mat is not None:
                    mat = new_mat
            stack.append(mat)

        out = os.path.join(target, f"{site}_predictions.tif")
        _save_multipage_tiff(np.stack(stack, 0).astype("uint16"), out)
        log.info("saved validation overlay %s", out)


def find_rim(cell_positions: np.ndarray) -> np.ndarray:
    """Boundary pixels of a pixel set (reference
    segmentation_validation.py:10-17)."""
    masks = set(tuple(r) for r in cell_positions)
    inner = set((r[0] - 1, r[1]) for r in masks) & \
        set((r[0] + 1, r[1]) for r in masks) & \
        set((r[0], r[1] - 1) for r in masks) & \
        set((r[0], r[1] + 1) for r in masks)
    return np.array(list(masks - inner))


def _append_segmentation(positions, inds, cell_id, nn_stack, t_point, mat):
    """Draw one cell's rim, green for non-MG / red for MG
    (reference segmentation_validation.py:171-195)."""
    if cell_id < 0:
        return None
    pts = positions[inds == cell_id]
    rim = find_rim(pts)
    # nn_stack: (T, n_classes, 1, X, Y)
    mask_identities = nn_stack[t_point][:, 0, pts[:, 0], pts[:, 1]].mean(1)
    if mask_identities[1] > mask_identities[2]:
        mat[(rim[:, 0], rim[:, 1])] = np.array([0, 65535, 0]).reshape((1, 3))
    else:
        mat[(rim[:, 0], rim[:, 1])] = np.array([65535, 0, 0]).reshape((1, 3))
    return mat


def _save_multipage_tiff(stack: np.ndarray, path: str) -> None:
    """Multipage uint16 TIFF (the reference used skimage/tifffile; PIL cannot
    encode uint16 RGB, so we use our own baseline-TIFF writer)."""
    from ..io.tiff import write_multipage_tiff

    write_multipage_tiff(path, stack)


def draw_contour_overlay(phase: np.ndarray, seg: np.ndarray,
                         threshold: float = 30.0,
                         color=(255, 0, 0)) -> np.ndarray:
    """Paint the edges of a segmentation map onto a grayscale frame in
    ``color`` (reference segmentation_validation.py:20-34 ``drawContour`` +
    :57-63 ``load_and_plot``). ``seg`` is thresholded at ``threshold`` (the
    reference's ``p > 30`` on 8-bit PNGs); edges are mask pixels with at
    least one off-mask pixel in their 3x3 neighborhood (PIL FIND_EDGES
    semantics, numpy-implemented — no PIL dependency)."""
    mask = np.asarray(seg) > threshold
    interior = np.ones_like(mask)
    for dr in (-1, 0, 1):
        for dc in (-1, 0, 1):
            if dr == 0 and dc == 0:
                continue
            shifted = np.zeros_like(mask)
            rs = slice(max(dr, 0), mask.shape[0] + min(dr, 0))
            rd = slice(max(-dr, 0), mask.shape[0] + min(-dr, 0))
            cs = slice(max(dc, 0), mask.shape[1] + min(dc, 0))
            cd = slice(max(-dc, 0), mask.shape[1] + min(-dc, 0))
            shifted[rd, cd] = mask[rs, cs]
            interior &= shifted
    edges = mask & ~interior
    phase = np.asarray(phase)
    if phase.ndim == 2:
        if phase.dtype == np.uint8:
            rgb = np.stack([phase] * 3, axis=2)
        else:
            # min-max scale to [0, 255] — float frames may be zscored
            # (negative values) and must not wrap on the uint8 cast
            lo, hi = float(phase.min()), float(phase.max())
            scaled = np.clip((phase - lo) / max(hi - lo, 1e-12) * 255,
                             0, 255)
            rgb = np.stack([scaled] * 3, axis=2).astype(np.uint8)
    else:
        rgb = np.clip(phase, 0, 255).astype(np.uint8).copy()
    rgb[edges] = np.asarray(color, np.uint8)
    return rgb


def segmentation_validation_contours(raw_folder: str, supp_folder: str,
                                     val_folder: str, sites: Sequence[str],
                                     out_size=(1108, 1108)) -> None:
    """Per-frame contour-overlay validation PNGs: stitch the instance
    clustering's ``segmentation_<t>.png`` maps back onto the raw phase frames
    (reference segmentation_validation.py:196-233
    ``segmentation_validation_bryant``). Writes
    ``<val_folder>/<site>_<t>.png`` per frame."""
    import cv2

    os.makedirs(val_folder, exist_ok=True)
    for site in sites:
        raw_stack = np.load(os.path.join(raw_folder, f"{site}.npy"))
        seg_dir = site_supp_folder(supp_folder, site)
        log.info("building full frame validation for %s", site)
        for t_point in range(len(raw_stack)):
            seg_path = os.path.join(seg_dir, f"segmentation_{t_point}.png")
            if not os.path.exists(seg_path):
                log.warning("missing %s; skipping frame", seg_path)
                continue
            seg = cv2.imread(seg_path, cv2.IMREAD_GRAYSCALE)
            phase = raw_stack[t_point, 0, 0] if raw_stack.ndim == 5 \
                else raw_stack[t_point, :, :, 0]
            # min-max scale (same as draw_contour_overlay's float branch):
            # divide-by-max alone collapses zscored/negative-valued frames
            # to black and degenerates entirely when max <= 0
            lo, hi = float(phase.min()), float(phase.max())
            phase8 = (np.clip((phase - lo) / max(hi - lo, 1e-12), 0, 1)
                      * 255).astype(np.uint8)
            if out_size:
                phase8 = cv2.resize(phase8, tuple(out_size))
                seg = cv2.resize(seg, tuple(out_size),
                                 interpolation=cv2.INTER_NEAREST)
            overlay = draw_contour_overlay(phase8, seg)
            out = os.path.join(val_folder, f"{site}_{t_point}.png")
            cv2.imwrite(out, overlay[:, :, ::-1])  # RGB -> BGR for cv2


def validation_pngs_to_tiff(val_folder: str, site: str,
                            out_path: str = None) -> str:
    """Stack a site's per-frame validation PNGs into one multipage TIFF
    (reference segmentation_validation.py:235-264
    ``segmentation_validation_to_tiff``)."""
    import re

    import cv2

    from ..io.tiff import write_multipage_tiff

    pat = re.compile(rf"^{re.escape(site)}_(\d+)\.png$")
    matched = sorted(
        (int(m.group(1)), f) for f in os.listdir(val_folder)
        if (m := pat.match(f)))
    if not matched:
        raise ValueError(f"no validation PNGs for site {site} in {val_folder}")
    frames = [cv2.imread(os.path.join(val_folder, f))[:, :, ::-1]
              for _, f in matched]
    stack = np.stack(frames, 0).astype(np.uint16) * 257  # 8-bit -> 16-bit
    out_path = out_path or os.path.join(val_folder, f"{site}_composite.tif")
    write_multipage_tiff(out_path, stack)
    return out_path
