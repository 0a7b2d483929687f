"""Patch extraction + trajectory building pipeline stages.

Behavioral spec: reference pipeline/patch_VAE.py:22-112 (drivers) and
SingleCellPatch/extract_patches.py:156-278 (per-site extraction). The
per-cell window/mask/fill math runs on TPU in one fused program per frame
(ops/patch.py) instead of the reference's per-cell host loops; pickle output
format is unchanged ("stacks_<t>.pkl" dicts of {mat, masked_mat}).

Known reference bug NOT replicated: the reference indexes
``image_stack[channels]`` on axis 0 (time) instead of axis 1 (channel),
silently truncating frames (extract_patches.py:190-193); we select channels
on axis 1.
"""
from __future__ import annotations

import logging
import os
from typing import Dict, Optional, Sequence

import numpy as np

from ..io.compact import load_stack_any, resolve_any, save_stack, storage_path
from ..io.pickles import load_pickle, save_pickle
from ..io.sites import site_supp_folder
from ..ops.patch import extract_cell_patches, labels_to_map, median_background
from ..track.clustering import check_segmentation_dim
from ..track.matching import build_site_trajectories

log = logging.getLogger(__name__)


def _round_up(n: int, m: int) -> int:
    return max(m, ((n + m - 1) // m) * m)


def dispatch_cell_patches(raw_dev, labels_dev, bg_fill, kept_cells,
                          window_size: int = 256, cell_bucket: int = 32):
    """Device half of per-frame patch extraction, shared by the staged path
    (host-loaded frame + label map) and the fused seg->patch path
    (device-resident frame + device-scattered label map): enqueue the fused
    window/mask/fill program (ops/patch.py) and return the padded device
    buffers WITHOUT fetching, so callers can drain the download on a writer
    thread while the next frame runs. ``assemble_site_data`` is the host
    half.

    ``raw_dev``: (C, H, W) f32 (device or host); ``labels_dev``: (H, W)
    int32; ``bg_fill``: (C,) medians; ``kept_cells``: [(cell_id, center)].
    """
    import jax.numpy as jnp

    n = len(kept_cells)
    if n == 0:
        return None
    n_pad = _round_up(n, cell_bucket)
    centers = np.zeros((n_pad, 2), np.int32)
    ids = np.full((n_pad,), -999, np.int32)
    for i, (cid, pos) in enumerate(kept_cells):
        centers[i] = (pos[0], pos[1])
        ids[i] = cid
    return extract_cell_patches(
        jnp.asarray(raw_dev), jnp.asarray(labels_dev),
        jnp.asarray(centers), jnp.asarray(ids),
        jnp.asarray(bg_fill), window_size=window_size)


def assemble_site_data(out, kept_cells, site_supp_files_folder: str,
                       t_point: int, save_fig: bool = False
                       ) -> Dict[str, dict]:
    """Host half of per-frame patch extraction: fetch the padded bucket
    and assemble the reference ``stacks_<t>.pkl`` layout
    (extract_patches.py:228-278). Thread-safe (no device dispatch; pure
    fetch + numpy), so it can run on an io.prefetch.AsyncWriter thread."""
    site_data: Dict[str, dict] = {}
    n = len(kept_cells)
    if out is None or n == 0:
        return site_data
    # Fetch the full bucket: slicing on device would create a new tiny
    # program per distinct n (a fresh compile each time); fetching the
    # already-materialised buffers needs none. Masks travel as uint8
    # (4x smaller).
    mat = np.asarray(out["mat"])[:n]
    masked = np.asarray(out["masked_mat"])[:n]
    tm = np.asarray(out["tm"])[:n].astype(np.float32)
    tm2 = np.asarray(out["tm2"])[:n].astype(np.float32)

    for i, (cid, pos) in enumerate(kept_cells):
        cell_name = os.path.join(site_supp_files_folder,
                                 "%d_%d.h5" % (t_point, cid))
        # back to (C(+2), Z, H, W) float64 layout
        m = np.concatenate(
            [mat[i][:, None], tm[i][None, None], tm2[i][None, None]],
            0).astype("float64")
        mm = np.concatenate(
            [masked[i][:, None], tm[i][None, None],
             tm2[i][None, None]], 0).astype("float64")
        site_data[cell_name] = {"mat": m, "masked_mat": mm}
        if save_fig:
            im_path = os.path.join(
                site_supp_files_folder,
                "patch_t%d_id%d.jpg" % (t_point, cid))
            save_single_cell_im(m[:, 0], mm[:, 0], tm[i], tm2[i], im_path)
    return site_data


def filter_boundary_cells(all_cells, half: int, x_size: int, y_size: int,
                          skip_boundary: bool):
    """Optionally drop cells whose window crosses the frame boundary
    (reference extract_patches.py:206-212)."""
    kept = list(all_cells)
    if skip_boundary:
        kept = [(cid, pos) for cid, pos in kept
                if pos[0] - half >= 0 and pos[0] + half <= x_size
                and pos[1] - half >= 0 and pos[1] + half <= y_size]
    return kept


def process_site_extract_patches(site_path: str, site_segmentation_path: str,
                                 site_supp_files_folder: str,
                                 window_size: int = 256,
                                 channels: Optional[Sequence[int]] = None,
                                 save_fig: bool = False, reload: bool = True,
                                 skip_boundary: bool = False,
                                 cell_bucket: int = 32,
                                 storage: str = "pickle", **kwargs) -> None:
    """Extract per-cell patches for every frame of one site
    (reference extract_patches.py:156-278).

    Cells are padded to buckets of ``cell_bucket`` so jit compiles a handful
    of programs regardless of per-frame cell counts.

    ``storage="compact"`` writes float32 ``stacks_<t>.npz`` (io/compact.py)
    instead of the reference float64 pickles — exact for patch values,
    ~4x smaller. Reload accepts sites written in either format.
    """
    import jax.numpy as jnp

    image_stack = np.load(site_path)
    # channel selection on axis 1 (see module docstring re reference bug)
    if channels is not None:
        image_stack = image_stack[:, np.asarray(channels)]
    segmentation_stack = np.load(site_segmentation_path)
    cell_positions = load_pickle(
        os.path.join(site_supp_files_folder, "cell_positions.pkl"))
    cell_pixel_assignments = load_pickle(
        os.path.join(site_supp_files_folder, "cell_pixel_assignments.pkl"))

    from ..io.prefetch import AsyncWriter

    n_frames, n_channels, n_z, x_size, y_size = image_stack.shape
    half = window_size // 2
    writer = AsyncWriter(depth=2)
    try:
        for t_point in range(n_frames):
            stack_path = storage_path(
                os.path.join(site_supp_files_folder,
                             "stacks_%d.pkl" % t_point), storage)
            existing = resolve_any(stack_path)
            if reload and os.path.exists(existing):
                try:
                    load_stack_any(existing)
                    continue
                except Exception as e:
                    log.warning("failed reloading %s: %s", existing, e)
            raw_image = image_stack[t_point]            # (C, Z, H, W)
            cell_segmentation = check_segmentation_dim(
                segmentation_stack[t_point])
            positions, positions_labels = cell_pixel_assignments[t_point]
            kept_cells = filter_boundary_cells(cell_positions[t_point], half,
                                               x_size, y_size, skip_boundary)
            patch_out = None
            if kept_cells:
                raw2d = raw_image[:, 0].astype(np.float32)      # z squeezed
                bg_fill = median_background(
                    jnp.asarray(raw2d), jnp.asarray(
                        cell_segmentation[0, 0].astype(np.float32)))
                labels = labels_to_map((x_size, y_size), positions,
                                       positions_labels)
                patch_out = dispatch_cell_patches(
                    raw2d, labels, bg_fill, kept_cells,
                    window_size=window_size, cell_bucket=cell_bucket)

            # the patch-bucket download, pickle assembly and write drain on
            # the bounded writer thread, overlapping the next frame's
            # device programs (same pipelining as pipeline/fused.py)
            def fetch_and_save(out=patch_out, kept=kept_cells, t=t_point,
                               path=stack_path):
                save_stack(
                    assemble_site_data(out, kept, site_supp_files_folder,
                                       t, save_fig=save_fig), path,
                    storage=storage)

            writer.submit(fetch_and_save)
            cell_positions[t_point] = kept_cells
    finally:
        writer.close()
    save_pickle(cell_positions,
                os.path.join(site_supp_files_folder, "cell_positions.pkl"))


def save_single_cell_im(output_mat, masked_output_mat, tm, tm2,
                        im_path: str) -> None:
    """4-panel patch figure: unmasked, masked, target mask, enlarged mask
    (reference extract_patches.py:282-311).

    Object-oriented matplotlib (no pyplot global state) so it can run on
    the main thread while instance-map PNGs render on the background
    writer thread (io/prefetch.AsyncWriter)."""
    from matplotlib.backends.backend_agg import FigureCanvasAgg
    from matplotlib.figure import Figure

    from ..io.images import im_adjust

    im_phase = np.array(output_mat[0], copy=True)
    im_phase_masked = np.array(masked_output_mat[0], copy=True)
    for im in (im_phase, im_phase_masked):
        nz = im[im != 0]
        if len(nz):
            im[im == 0] = np.nanmin(nz)
    ims = [im_adjust(im_phase), im_adjust(im_phase_masked), tm, tm2]
    names = ["output_mat", "masked_output_mat", "tm", "tm2"]
    fig = Figure(figsize=(15, 10))
    FigureCanvasAgg(fig)
    for i, (im, name) in enumerate(zip(ims, names)):
        a = fig.add_subplot(2, 2, i + 1)
        a.imshow(np.squeeze(im), cmap="gray")
        a.axis("off")
        a.set_title(name, fontsize=12)
    fig.savefig(im_path, dpi=300, bbox_inches="tight")


def get_cell_rect_angle(tm: np.ndarray) -> float:
    """Rotation angle of the cell's long axis via min-area rect
    (reference extract_patches.py:353-370)."""
    import cv2

    out = cv2.findContours(tm.astype("uint8"), 1, 2)
    contours = out[0] if len(out) == 2 else out[1]
    areas = [cv2.contourArea(cnt) for cnt in contours]
    rect = cv2.minAreaRect(contours[int(np.argmax(areas))])
    w, h = rect[1]
    ang = rect[2]
    if w < h:
        ang = ang - 90
    return ang


def process_site_extract_patches_align_axis(
        site_path: str, site_segmentation_path: str,
        site_supp_files_folder: str, window_size: int = 256,
        channels: Optional[Sequence[int]] = None, save_fig: bool = False,
        skip_boundary: bool = False, cell_bucket: int = 32, **kwargs) -> None:
    """Long-axis-aligned patch extraction (reference extract_patches.py:
    373-492): extract an enlarged window (window*sqrt(2)+1), rotate so the
    cell long axis lies on x, crop the central window. Window/mask/fill math
    runs on device (ops/patch.py); the warpAffine rotation stays host-side
    cv2 for exact parity. Saves "stacks_rotated_<t>.pkl"."""
    import cv2
    import jax.numpy as jnp

    from ..seg.data import cv2_fn_wrapper

    output_window_size = window_size
    window_size = int(np.ceil(window_size * np.sqrt(2)) + 1)
    image_stack = np.load(site_path)
    if channels is not None:
        image_stack = image_stack[:, np.asarray(channels)]
    segmentation_stack = np.load(site_segmentation_path)
    cell_positions = load_pickle(
        os.path.join(site_supp_files_folder, "cell_positions.pkl"))
    cell_pixel_assignments = load_pickle(
        os.path.join(site_supp_files_folder, "cell_pixel_assignments.pkl"))

    n_frames, n_channels, n_z, x_size, y_size = image_stack.shape
    half = window_size // 2
    lo = window_size // 2 - output_window_size // 2
    hi = window_size // 2 + output_window_size // 2
    for t_point in range(n_frames):
        site_data: Dict[str, dict] = {}
        raw_image = image_stack[t_point]
        cell_segmentation = check_segmentation_dim(segmentation_stack[t_point])
        positions, positions_labels = cell_pixel_assignments[t_point]
        all_cells = cell_positions[t_point]
        kept_cells = list(all_cells)
        if skip_boundary:
            kept_cells = [
                (cid, pos) for cid, pos in kept_cells
                if pos[0] - half >= 0 and pos[0] + half <= x_size
                and pos[1] - half >= 0 and pos[1] + half <= y_size]
        if kept_cells:
            raw2d = raw_image[:, 0].astype(np.float32)
            bg_fill = median_background(
                jnp.asarray(raw2d),
                jnp.asarray(cell_segmentation[0, 0].astype(np.float32)))
            labels = labels_to_map((x_size, y_size), positions,
                                   positions_labels)
            n = len(kept_cells)
            n_pad = _round_up(n, cell_bucket)
            centers = np.zeros((n_pad, 2), np.int32)
            ids = np.full((n_pad,), -999, np.int32)
            for i, (cid, pos) in enumerate(kept_cells):
                centers[i] = (pos[0], pos[1])
                ids[i] = cid
            out = extract_cell_patches(
                jnp.asarray(raw2d), jnp.asarray(labels),
                jnp.asarray(centers), jnp.asarray(ids),
                bg_fill, window_size=window_size)
            mats = np.asarray(out["mat"])[:n]
            maskeds = np.asarray(out["masked_mat"])[:n]
            tms = np.asarray(out["tm"])[:n]
            tm2s = np.asarray(out["tm2"])[:n]

            for i, (cid, pos) in enumerate(kept_cells):
                cell_name = os.path.join(site_supp_files_folder,
                                         "%d_%d.h5" % (t_point, cid))
                tm, tm2 = tms[i], tm2s[i]
                ang = get_cell_rect_angle(tm)
                M = cv2.getRotationMatrix2D(
                    (window_size / 2, window_size / 2), ang, 1)
                _tm = cv2.warpAffine(tm.astype("uint8"), M,
                                     (window_size, window_size))
                _tm2 = cv2.warpAffine(tm2.astype("uint8"), M,
                                      (window_size, window_size))
                _mat = cv2_fn_wrapper(cv2.warpAffine,
                                      mats[i][:, None].astype("uint16"), M,
                                      (window_size, window_size))
                _masked = cv2_fn_wrapper(cv2.warpAffine,
                                         maskeds[i][:, None].astype("uint16"),
                                         M, (window_size, window_size))
                tm_c = _tm[None, None, lo:hi, lo:hi]
                tm2_c = _tm2[None, None, lo:hi, lo:hi]
                mat_c = _mat[..., lo:hi, lo:hi]
                masked_c = _masked[..., lo:hi, lo:hi]
                site_data[cell_name] = {
                    "mat": np.concatenate([mat_c, tm_c, tm2_c],
                                          0).astype("float64"),
                    "masked_mat": np.concatenate([masked_c, tm_c, tm2_c],
                                                 0).astype("float64"),
                }
                if save_fig:
                    im_path = os.path.join(
                        site_supp_files_folder,
                        "patch_rotated_t%d_id%d.jpg" % (t_point, cid))
                    save_single_cell_im(mat_c[:, 0], masked_c[:, 0],
                                        tm_c[0, 0], tm2_c[0, 0], im_path)
        save_pickle(site_data,
                    os.path.join(site_supp_files_folder,
                                 "stacks_rotated_%d.pkl" % t_point))


def process_site_build_trajectory(site_supp_files_folder: str,
                                  min_length: int = 10, **kwargs) -> None:
    """Track cells through time for one site; saves cell_traj.pkl
    (reference generate_trajectories.py:372-438)."""
    cell_positions = load_pickle(
        os.path.join(site_supp_files_folder, "cell_positions.pkl"))
    cell_pixel_assignments = load_pickle(
        os.path.join(site_supp_files_folder, "cell_pixel_assignments.pkl"))
    trajectories, trajectories_positions = build_site_trajectories(
        cell_positions, cell_pixel_assignments, min_length=min_length)
    save_pickle([trajectories, trajectories_positions],
                os.path.join(site_supp_files_folder, "cell_traj.pkl"))


def extract_patches(raw_folder: str, supp_folder: str, sites: Sequence[str],
                    config, **kwargs) -> None:
    """Driver over sites (reference pipeline/patch_VAE.py:22-74)."""
    for site in sites:
        site_path = os.path.join(raw_folder, f"{site}.npy")
        seg_path = os.path.join(raw_folder, f"{site}_NNProbabilities.npy")
        supp = site_supp_folder(supp_folder, site)
        if not os.path.exists(site_path) or not os.path.exists(seg_path):
            log.error("Site data not found %s", site_path)
            continue
        os.makedirs(supp, exist_ok=True)
        from ..core.profiling import stage_timer

        with stage_timer("extract_patches", site=site):
            process_site_extract_patches(
                site_path, seg_path, supp,
                window_size=config.patch.window_size,
                channels=config.patch.channels,
                save_fig=config.patch.save_fig,
                reload=config.patch.reload,
                skip_boundary=config.patch.skip_boundary,
                storage=getattr(config.patch, "storage", "pickle"))


def build_trajectories(raw_folder: str, supp_folder: str,
                       sites: Sequence[str], config, **kwargs) -> None:
    """Driver over sites (reference pipeline/patch_VAE.py:77-112)."""
    for site in sites:
        site_path = os.path.join(raw_folder, f"{site}.npy")
        supp = site_supp_folder(supp_folder, site)
        if not os.path.exists(site_path) or not os.path.exists(supp):
            log.error("Site data not found %s", site_path)
            continue
        process_site_build_trajectory(supp)


def instance_segmentation(raw_folder: str, supp_folder: str,
                          sites: Sequence[str], config, rerun: bool = True,
                          **kwargs) -> None:
    """Driver over sites (reference pipeline/segmentation.py:90-141)."""
    from ..track.clustering import process_site_instance_segmentation

    for site in sites:
        site_path = os.path.join(raw_folder, f"{site}.npy")
        seg_path = os.path.join(raw_folder, f"{site}_NNProbabilities.npy")
        supp = site_supp_folder(supp_folder, site)
        if not os.path.exists(site_path) or not os.path.exists(seg_path):
            log.error("Site data not found %s", site_path)
            continue
        if not rerun and os.path.exists(
                os.path.join(supp, "cell_positions.pkl")):
            log.info("Found previously saved instance clustering for %s, skip",
                     site)
            continue
        os.makedirs(supp, exist_ok=True)
        process_site_instance_segmentation(site_path, seg_path, supp)
