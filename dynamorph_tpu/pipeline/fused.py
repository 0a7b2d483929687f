"""Device-resident fused segmentation -> instance -> patch stage.

The staged pipeline round-trips every frame through the host three times:
``segmentation`` uploads the raw frame and downloads the probability map
(reference pipeline/segmentation.py:13-87), ``instance_segmentation``
re-reads both from disk, and ``extract_patches`` re-uploads the ~33 MB
frame it just downloaded (reference SingleCellPatch/extract_patches.py:
156-278). On TPU the natural design keeps the frame and the probability
map in HBM across stages: only DBSCAN (an irregular host/native-C++
algorithm) needs pixel coordinates on the host, and it needs 1 bit/pixel.

Per frame, this stage:

1. uploads the raw frame ONCE as uint16 (half the bytes of f32);
2. runs cast + scale + U-Net + foreground threshold in one jitted program,
   shipping the foreground mask to host as packed bits (512 KB vs the
   staged path's 16 MB probability download + 33 MB re-upload at 2048^2);
3. clusters instances on host (native grid-DBSCAN + the reference's
   size/window filters — track/clustering.py);
4. uploads the (pixel, label) list (~6 bytes/fg-pixel) and scatters it
   into the label map ON DEVICE, where the raw frame still lives;
5. runs the fused window/mask/fill patch program (ops/patch.py) and
   downloads only the final patches.

The loop is software-pipelined: uploads + U-Net dispatches for the next
``cluster_workers`` frames are enqueued ahead of the consume point
(``lookahead=True``), their DBSCAN runs on a host thread pool (the native
solver releases the GIL, and its core test is itself multithreaded —
native/grid_dbscan.cpp), and frame t's patch-bucket download, pickle
assembly and probability-map fetch all drain on the bounded writer
thread — so on a multi-core host the main thread's steady-state cost is
just dispatches, with clustering and transfers overlapped both ways.

Outputs are the same artifacts as the three staged stages: per-site
``cell_positions.pkl``, ``cell_pixel_assignments.pkl``, instance-map PNGs,
``stacks_<t>.pkl`` (via the shared ``dispatch_cell_patches`` +
``assemble_site_data`` halves in pipeline/patch.py), and —
unless ``save_probabilities=False`` — ``<site>_NNProbabilities.npy`` +
preview PNGs for downstream validation stages.

Parity: given identical probability maps, outputs are identical to the
staged path (tests/test_fused_seg_patch.py pins this with a deterministic
stub model). The U-Net itself runs at batch 1 here vs the staged direct
mode's frame batching, so real-model probabilities can differ by float
association at tile boundaries of XLA fusion choices — same class of
deltas as the staged tiled-vs-direct modes.
"""
from __future__ import annotations

import logging
import os
from typing import Optional, Sequence, Tuple

import numpy as np

from ..io.compact import save_stack, storage_path
from ..io.pickles import save_pickle
from ..io.sites import site_supp_folder
from ..ops.patch import (median_background, pack_mask_bits,
                         scatter_label_map)
from ..track.clustering import (cluster_foreground_positions,
                                save_instance_map)
from .patch import (_round_up, assemble_site_data, dispatch_cell_patches,
                    filter_boundary_cells)

log = logging.getLogger(__name__)

# Foreground-pixel upload bucket: bounds the number of compiled scatter
# programs (one per distinct padded size) regardless of per-frame counts.
_COORD_BUCKET = 1 << 16


def _site_programs(model, seg_ch, patch_ch, fg_thr, shape):
    """The two jitted per-frame programs, cached ON THE MODEL instance so
    every site of a plate reuses one compiled U-Net program — a fresh jit
    closure per site would recompile the whole network each time (~15-40 s
    per program through this environment's relay). The cache dies with the
    model, so no device buffers outlive it."""
    import jax
    import jax.numpy as jnp

    from ..core.constants import CHANNEL_MAX

    key = (seg_ch, patch_ch, fg_thr, shape)
    try:
        cache = model.__dict__.setdefault("_fused_program_cache", {})
    except AttributeError:        # exotic model without __dict__: no cache
        cache = {}
    if key in cache:
        return cache[key]

    predict = model._predict_fn
    x_size, y_size = shape

    @jax.jit
    def seg_frame(params, state, raw_u16):
        """(C, H, W) uint16 -> (f32 frame, probs, packed fg mask).

        One program: the frame is cast once and stays in HBM for the patch
        stage; foreground = mean-over-z background prob < fg_thr
        (reference instance_clustering.py:63-65)."""
        raw_f = raw_u16.astype(jnp.float32)
        seg_in = raw_f[jnp.array(seg_ch)] / CHANNEL_MAX
        probs = predict(params, state, seg_in[None])[0]  # (K, Z, H, W)
        fg = jnp.mean(probs[0], axis=0) < fg_thr
        return raw_f, probs, pack_mask_bits(fg)

    @jax.jit
    def patch_inputs(raw_f, probs, coords, labels):
        """Scatter the host DBSCAN labels into the device label map and
        compute the median background fill — both from HBM residents.
        coords/labels may arrive int16 (6 bytes/fg-pixel upload; frames
        <= 32766 px) and widen on device."""
        lab = scatter_label_map(coords.astype(jnp.int32),
                                labels.astype(jnp.int32),
                                (x_size, y_size))
        raw2d = raw_f[jnp.array(patch_ch)]
        bg_fill = median_background(raw2d, probs[0, 0])
        return lab, raw2d, bg_fill

    cache[key] = (seg_frame, patch_inputs)
    return cache[key]


def _params_on_device(model, device):
    """Replicate the model's params/state onto ``device`` once, cached on
    the model (site-parallel workers each pin one device; re-copying ~100 MB
    of U-Net weights per site would dominate)."""
    if device is None:
        return model.params, model.state
    import jax

    try:
        cache = model.__dict__.setdefault("_params_by_device", {})
    except AttributeError:
        cache = {}
    if device not in cache:
        cache[device] = jax.device_put((model.params, model.state), device)
    return cache[device]


def process_site_seg_patch_fused(
        site_path: str, model, site_supp_files_folder: str,
        seg_channels: Sequence[int], patch_channels: Sequence[int],
        window_size: int = 256, save_fig: bool = False,
        skip_boundary: bool = False, cell_bucket: int = 32,
        fg_thr: float = 0.3, ct_thr: Tuple[int, int] = (500, 12000),
        dbscan_thr: Tuple[int, int] = (10, 250),
        save_probabilities: bool = True,
        out_prob_path: Optional[str] = None, device=None,
        devices: Optional[Sequence] = None,
        lookahead: bool = True, storage: str = "pickle",
        cluster_workers: Optional[int] = None,
        frame_hook=None) -> None:
    """Segment + cluster + extract patches for one site with the frame and
    probability map resident in HBM throughout (see module docstring).

    ``model`` is a seg.Segment (or anything with ``params``/``state`` and a
    jittable ``_predict_fn(params, state, (B, C, H, W)) -> (B, K, Z, H, W)``).

    ``device``: optional jax.Device to pin this site's programs to —
    site-parallel workers give each site its own chip (see
    ``seg_patch_fused``); None uses the default device.

    ``devices``: optional LIST of jax.Devices — frames round-robin across
    them (frame t runs on ``devices[t % len]``), the TPU-native answer to
    the reference's per-t serial loop being embarrassingly parallel
    (instance_clustering.py:170-177). Every per-frame program and the
    model params are cached per device; clustering still consumes frames
    in order, so artifacts are identical for any device count. Overrides
    ``device``. The in-flight window is raised to cover the device fan-out
    so every chip has a frame queued.

    ``frame_hook``: optional callable
    ``(t_point, patch_out, kept_cells, frame_device)`` invoked on the main
    thread right after the frame's patch program is dispatched, while the
    padded patch buckets are still device-resident — the attachment point
    for the streaming encode path (pipeline/stream.py), which consumes
    patches from HBM instead of re-reading the stacks pickles.

    ``lookahead``: enqueue uploads + U-Net dispatches ahead of the host work
    on the current frame (software pipelining). HBM holds
    ``cluster_workers + 1`` frames' residents; if that doesn't fit, shrink
    ``cluster_workers`` to 1 (two frames resident) or disable ``lookahead``
    (one frame, strictly serial).

    ``cluster_workers``: host threads running DBSCAN on frames ahead of the
    consume point (the native solver releases the GIL, so frames genuinely
    cluster in parallel on multi-core hosts — the TPU-native answer to the
    reference's per-t serial loop, instance_clustering.py:170-177). Results
    are consumed in frame order, so every artifact is identical for any
    value. The native solver's own core-test threads are divided by the
    worker count so frame-level and point-level parallelism share the
    cores instead of oversubscribing. Default min(3, cpu_count); ignored
    (inline clustering) when ``lookahead`` is off.
    """
    import jax
    import jax.numpy as jnp

    from ..core.constants import CHANNEL_MAX

    image_stack = np.load(site_path)  # (T, C, Z, H, W)
    if image_stack.ndim != 5:
        raise ValueError(f"expected 5-D site stack, got {image_stack.shape}")
    os.makedirs(site_supp_files_folder, exist_ok=True)
    n_frames = image_stack.shape[0]
    x_size, y_size = image_stack.shape[-2:]
    half = window_size // 2
    seg_ch = tuple(int(c) for c in seg_channels)
    patch_ch = tuple(int(c) for c in patch_channels)
    seg_frame, patch_inputs = _site_programs(
        model, seg_ch, patch_ch, float(fg_thr), (int(x_size), int(y_size)))
    if devices is None:
        devices = [device]
    devices = list(devices) or [None]
    if not lookahead and len(devices) > 1:
        # lookahead=False forces strictly serial frame consumption
        # (window=0 below): round-robining frames over several devices
        # would buy zero parallelism while paying a first-compile of every
        # per-frame program plus a params upload PER DEVICE
        devices = devices[:1]

    def frame_device(t_point):
        return devices[t_point % len(devices)]

    def put(x, dev):
        return jax.device_put(x, dev) if dev is not None \
            else jax.device_put(x)

    from ..io.prefetch import AsyncWriter

    cell_positions = {}
    cell_pixel_assignments = {}
    prob_frames = [None] * n_frames if save_probabilities else None

    def dispatch_seg(t_point):
        raw_u16 = np.ascontiguousarray(image_stack[t_point, :, 0])
        dev = frame_device(t_point)
        params, state = _params_on_device(model, dev)
        return seg_frame(params, state, put(raw_u16, dev))

    if cluster_workers is None:
        cluster_workers = max(1, min(3, os.cpu_count() or 1))
    # frames in flight beyond the one being consumed (the effective
    # frame-level worker count): their uploads + U-Net dispatches are
    # enqueued (FIFO device queue) and their clustering runs on the pool.
    # lookahead=False keeps the strictly serial schedule with clustering
    # inline — no frame-level parallelism, so the native solver keeps the
    # host's FULL core budget instead of a 1/cluster_workers slice.
    # With frames fanned out over several devices, the window must at
    # least cover the fan-out or the later chips would sit idle.
    window = max(1, int(cluster_workers), len(devices)) if lookahead else 0
    # split the host cores between frame-level (pool) and point-level
    # (native core test) parallelism: N workers each spawning the solver's
    # independent default (up to 8 threads) would oversubscribe the host
    dbscan_threads = max(1, (os.cpu_count() or 1) // max(1, window))

    def host_cluster(packed):
        # unpack the bitmask -> row-major foreground coords (same order as
        # np.where in the staged path) -> DBSCAN + filters; runs on a
        # cluster-pool thread (device->host fetch of the packed mask and
        # the GIL-free native DBSCAN both overlap other frames)
        fg = np.unpackbits(np.asarray(packed), axis=1,
                           bitorder="little").astype(bool)[:, :y_size]
        positions = np.argwhere(fg)
        return cluster_foreground_positions(
            positions, (x_size, y_size), ct_thr=ct_thr,
            instance_map=False, dbscan_thr=dbscan_thr,
            threads=dbscan_threads)
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    cluster_pool = ThreadPoolExecutor(max_workers=window) if window else None
    inflight = deque()

    def enqueue(t):
        raw_f, probs, packed = dispatch_seg(t)
        fut = cluster_pool.submit(host_cluster, packed) if cluster_pool \
            else None
        inflight.append((t, raw_f, probs, packed, fut))

    writer = AsyncWriter(depth=2)
    try:
        next_t = 0
        while next_t < n_frames or inflight:
            while next_t < n_frames and len(inflight) < window + 1:
                enqueue(next_t)
                next_t += 1
            t_point, raw_f, probs, packed, fut = inflight.popleft()
            res = fut.result() if fut is not None else host_cluster(packed)
            all_cells, positions, positions_labels = res
            map_path = os.path.join(site_supp_files_folder,
                                    "segmentation_%d.png" % t_point)
            cell_pixel_assignments[t_point] = (positions, positions_labels)
            # instance-map PNG renders on the writer thread (OO matplotlib,
            # no pyplot globals) while the next frame runs on device; the
            # staged path writes no PNG when clustering early-outs on a
            # near-empty frame (track/clustering.py MIN_FG_PIXELS), so
            # neither do we — identical artifact trees
            if len(positions):
                writer.submit(save_instance_map, all_cells, positions,
                              positions_labels, (x_size, y_size), map_path)

            kept_cells = filter_boundary_cells(all_cells, half, x_size, y_size,
                                               skip_boundary)
            cell_positions[t_point] = kept_cells

            patch_out = None
            if kept_cells:
                dev = frame_device(t_point)
                n = len(positions)
                coord_bucket = min(_COORD_BUCKET, x_size * y_size)
                n_pad = _round_up(max(n, 1), coord_bucket)
                # pad slots get POSITIVE out-of-bounds coords (scatter
                # drops them; negative indices would wrap); int16 halves
                # the upload when coordinates fit (6 bytes/fg-pixel)
                cdtype = np.int16 if (
                    max(x_size, y_size) <= 32766
                    and int(positions_labels.max(initial=0)) <= 32766) \
                    else np.int32
                coords = np.full((n_pad, 2), max(x_size, y_size), cdtype)
                labs = np.zeros((n_pad,), cdtype)
                coords[:n] = positions
                labs[:n] = positions_labels
                lab_dev, raw2d_dev, bg_fill = patch_inputs(
                    raw_f, probs, put(coords, dev), put(labs, dev))
                patch_out = dispatch_cell_patches(
                    raw2d_dev, lab_dev, bg_fill, kept_cells,
                    window_size=window_size, cell_bucket=cell_bucket)
                if frame_hook is not None:
                    frame_hook(t_point, patch_out, kept_cells, dev)

            # the patch-bucket download, pickle assembly and write — and
            # the probability-map download — all drain on the bounded
            # writer thread, overlapping the next frame's DBSCAN and
            # device programs (the writer holds <= depth frames' buffers)
            def fetch_and_save(out=patch_out, kept=kept_cells, t=t_point,
                               p=probs):
                save_stack(
                    assemble_site_data(out, kept, site_supp_files_folder,
                                       t, save_fig=save_fig),
                    storage_path(
                        os.path.join(site_supp_files_folder,
                                     "stacks_%d.pkl" % t), storage),
                    storage=storage)
                if prob_frames is not None:
                    prob_frames[t] = np.asarray(p)

            writer.submit(fetch_and_save)

    finally:
        writer.close()
        if cluster_pool is not None:
            cluster_pool.shutdown(wait=True)

    if prob_frames is not None:
        from ..seg.data import plot_prediction_prob

        import cv2

        total = np.stack(prob_frames, 0)
        if out_prob_path is None:
            out_prob_path = os.path.splitext(site_path)[0] + \
                "_NNProbabilities"
        np.save(out_prob_path, total)
        # preview PNGs, same contract as the staged segmentation stage
        # (seg/inference.py::_finish_whole_map)
        cv2.imwrite(os.path.splitext(site_path)[0] + ".png",
                    image_stack[0, seg_ch[0], 0])
        plot_prediction_prob(total[0],
                             os.path.splitext(site_path)[0] + "_NNpred.png")

    # cell_positions.pkl is the resume/skip completion marker (orchestrator
    # + the per-site skip below), so it is written LAST: a crash anywhere
    # above leaves the site unmarked and it reprocesses cleanly.
    save_pickle(cell_pixel_assignments,
                os.path.join(site_supp_files_folder,
                             "cell_pixel_assignments.pkl"))
    save_pickle(cell_positions,
                os.path.join(site_supp_files_folder, "cell_positions.pkl"))


def build_seg_model(config):
    """The fused front-end's U-Net, built + loaded from
    ``config.segmentation_inference`` — exposed so multi-well callers
    (pipeline/stream.py) can build ONE model and share its compiled
    programs across every ``seg_patch_fused`` call (the per-frame programs
    are cached on the model instance, _site_programs)."""
    from ..seg.model import Segment

    si = config.segmentation_inference
    if si.network != "UNet":
        raise NotImplementedError(
            f"segmentation model {si.network} not implemented")
    model = Segment(input_shape=(len(si.channels), si.window_size,
                                 si.window_size),
                    n_classes=si.num_classes)
    if not si.weights:
        raise ValueError("segmentation weights path must be provided")
    model.load(si.weights)
    return model


def seg_patch_fused(raw_folder: str, supp_folder: str,
                    sites: Sequence[str], config, rerun: bool = True,
                    site_parallelism: Optional[int] = None,
                    model=None, frame_hook_for=None,
                    **kwargs) -> list:
    """Driver over sites: loads the U-Net once, then runs the fused
    device-resident stage per site with the staged drivers' per-site
    failure tolerance (reference pipeline/segmentation.py:76-86).
    Returns the list of ``(site, exception)`` pairs for sites that failed
    (empty on a clean run) — callers that must not publish partial
    downstream artifacts (pipeline/stream.py) check it; the staged
    contract (log + continue) is unchanged.

    ``rerun=False`` skips sites whose ``cell_positions.pkl`` (written last,
    the completion marker) already exists — same per-site resume semantics
    as the staged ``instance_segmentation`` driver.

    ``model``: optional pre-built seg model (``build_seg_model``) — pass it
    when calling this driver repeatedly (e.g. once per well) so the
    per-frame jitted programs cached on the instance survive across calls
    instead of recompiling each time (~15-40 s per program through the
    relay).

    ``frame_hook_for``: optional ``site -> frame_hook`` factory; each
    site's frames invoke its own hook (see
    ``process_site_seg_patch_fused``), which is how the streaming encoder
    routes per-site patch buckets without a driver call per site.

    ``site_parallelism``: number of sites processed concurrently (worker
    threads; the TPU-native analog of the reference's process-per-GPU
    fan-out, run_segmentation.py:74-84). Default: min(local device count,
    number of sites). The local devices are split round-robin into
    ``site_parallelism`` groups and each site FANS ITS FRAMES OUT over its
    group (frame t on group[t % len] — see ``process_site_seg_patch_fused``
    ``devices``), so fewer sites than chips no longer leaves chips idle:
    1 site on a v5e-8 host uses all 8 chips frame-parallel. Host stages
    (DBSCAN, pickle writes) release the GIL or run on per-site writer
    threads, so device compute genuinely overlaps.
    """
    import jax

    from ..core.profiling import stage_timer

    if model is None:
        model = build_seg_model(config)

    devices = jax.local_devices()
    k = site_parallelism if site_parallelism is not None \
        else min(len(devices), len(sites))
    k = max(1, min(k, len(devices), max(len(sites), 1)))

    si = config.segmentation_inference
    failed: list = []

    def run_site(site, site_devices):
        site_path = os.path.join(raw_folder, f"{site}.npy")
        if not os.path.exists(site_path):
            log.error("Site data not found %s", site_path)
            failed.append((site, FileNotFoundError(site_path)))
            return
        supp = site_supp_folder(supp_folder, site)
        if not rerun and os.path.exists(
                os.path.join(supp, "cell_positions.pkl")):
            log.info("Found previously saved fused outputs for %s, skip",
                     site)
            return
        os.makedirs(supp, exist_ok=True)
        kwargs.setdefault("cluster_workers",
                          getattr(config.patch, "cluster_workers", None))
        hook = frame_hook_for(site) if frame_hook_for is not None else \
            kwargs.get("frame_hook")
        site_kwargs = {k_: v for k_, v in kwargs.items()
                       if k_ != "frame_hook"}
        try:
            with stage_timer("seg_patch_fused", site=site):
                process_site_seg_patch_fused(
                    site_path, model, supp,
                    seg_channels=si.channels,
                    patch_channels=config.patch.channels,
                    window_size=config.patch.window_size,
                    save_fig=config.patch.save_fig,
                    skip_boundary=config.patch.skip_boundary,
                    storage=getattr(config.patch, "storage", "pickle"),
                    devices=site_devices, frame_hook=hook, **site_kwargs)
        except Exception as ex:
            log.error(ex)
            log.error("Error in fused seg->patch for site %s", site)
            failed.append((site, ex))

    if k <= 1:
        for site in sites:
            run_site(site, devices)  # frame-parallel over ALL local chips
        return failed
    # free-group checkout: the local devices split round-robin into k
    # groups (each site fans frames over its group); each task takes
    # whichever group is idle (a static index->group map can pile two long
    # sites on one group while others idle). First-compiles happen once
    # PER DEVICE (jit caches one executable per committed device),
    # concurrently across workers.
    from concurrent.futures import ThreadPoolExecutor
    from queue import Queue

    free: Queue = Queue()
    for g in range(k):
        free.put(devices[g::k])

    def run_site_on_free_group(site):
        group = free.get()
        try:
            run_site(site, group)
        finally:
            free.put(group)

    with ThreadPoolExecutor(max_workers=k) as pool:
        futs = [pool.submit(run_site_on_free_group, site)
                for site in sites]
        for f in futs:
            f.result()
    return failed
