"""Device-resident streaming front-end: raw stacks -> latents in ONE pass.

The staged pipeline disk-round-trips TWICE between patch extraction and
latent encoding: the fused front-end writes ``stacks_<t>.pkl``, assemble
re-reads them, resizes 256->128 on HOST via cv2 and writes
``static_patches``, and process_VAE re-reads THAT and re-uploads it
(reference pipeline/patch_VAE.py:115-175, :343-508). But the patches are
already HBM-resident the moment the fused patch program finishes
(pipeline/fused.py) — this module keeps them there:

    raw frame -> U-Net -> DBSCAN -> patch windows      (pipeline/fused.py)
      -> channel-select + 2x2-mean resize 256->128      (device, this file)
      -> per-patch z-score + VQ-VAE encode              (device, one jitted
                                                         program shared with
                                                         the staged encode)
      -> latents

``stacks_<t>``, ``static_patches``, ``file_paths`` and the latent pickles
are all still written — as AsyncWriter side-effects off the compute path —
so every downstream stage (trajectories, relations, PCA, plots) and the
resume semantics are unchanged.

Exactness (why the streamed latents BIT-match the staged path):

- resize: cv2's INTER_LINEAR at an exact integer-factor downscale reduces
  to the mean of the CENTRAL 2x2 of each fxf block (even f; the whole
  block at f=2) or the block's center pixel (odd f) — see
  ``_resize_select_fn`` for the sampling-position derivation. Pipeline
  patch values are uint16-origin integers (raw windows, 0 border pad) or
  integer-medians (masked fill), all multiples of 0.5 below 2^16, so the
  <=4-term sum is exact in float32 and the divisor is a power of two:
  float32(device) == float64(cv2) == float32(staged astype) bit-for-bit
  (pinned for factors 2, 3, 4 by tests/test_stream_encode.py).
- encode: the SAME jitted program as the staged path
  (pipeline/patch_vae._encode_fn with the fused per-patch z-score), at the
  SAME padded batch shape — tail chunks are padded up to the full batch
  with zero rows rather than compiled at a second shape, so per-sample
  numerics cannot drift between paths.

Batching discipline (relay/XLA compile hygiene): per-frame patch buckets
arrive padded to ``cell_bucket`` multiples; they are split into fixed
``chunk``-row slices and encoded ``batch_chunks`` chunks at a time, so the
whole stage compiles a handful of programs total regardless of per-frame
cell counts. Frames fanned out over several devices accumulate and encode
per device (the encode program is cached per device); latent rows are
re-ordered into the well-global sorted-name order at the end, which is
also what makes the result independent of device count and frame order.
"""
from __future__ import annotations

import functools
import logging
import os
import threading
from typing import Dict, List, Optional, Sequence

import numpy as np

log = logging.getLogger(__name__)


@functools.lru_cache(maxsize=8)
def _take_chunk_fn(k: int):
    """Jitted fixed-size chunk gather: rows [i*k, i*k + k) of a bucket.
    The chunk index is a TRACED scalar, so every chunk of a given bucket
    shape shares ONE compiled program — static slicing (``bucket[i*k:...]``
    on a device array) would compile a fresh program per distinct offset,
    which the remote-compile relay turns into ~15-40 s each."""
    import jax

    @jax.jit
    def f(arr, i):
        return jax.lax.dynamic_slice_in_dim(arr, i * k, k, axis=0)

    return f


@functools.lru_cache(maxsize=32)
def _resize_select_fn(channels: tuple, factor: int):
    """Jitted channel-select + cv2-INTER_LINEAR-exact integer-factor
    downscale: (N, C, H, W) -> (N, len(channels), H/factor, W/factor).

    cv2's bilinear at an exact integer factor f samples at
    ``src = f*(dst + 0.5) - 0.5 = f*dst + f/2 - 0.5``: for even f that
    falls exactly between rows ``f*dst + f/2 - 1`` and ``f*dst + f/2``
    with (0.5, 0.5) weights — the mean of the CENTRAL 2x2 of each fxf
    block (for f=2, the whole block); for odd f it lands exactly ON row
    ``f*dst + (f-1)//2`` — the block's center pixel, no arithmetic at
    all. Both forms are exact in float32 for the pipeline's
    uint16-origin patch values (integers and half-integers below 2^16:
    the <=4-term sum is exact and the divisor is a power of two), so the
    streamed resize bit-matches the staged cv2 path at ANY integer
    factor (pinned for f in {2, 3, 4} by tests/test_stream_encode.py)."""
    import jax
    import jax.numpy as jnp

    start = (factor - 1) // 2
    taps = 2 if factor % 2 == 0 else 1

    @jax.jit
    def f(mat):
        x = mat[:, jnp.array(channels)]
        n, c, h, w = x.shape
        x = x.reshape(n, c, h // factor, factor, w // factor, factor)
        x = x[:, :, :, start:start + taps, :, start:start + taps]
        return jnp.mean(x, axis=(3, 5))

    return f


class StreamingWellEncoder:
    """Accumulates one well's device-resident patch buckets from the fused
    front-end's ``frame_hook``, resizes + encodes them on device, and
    assembles the well artifacts (see module docstring).

    Thread-safe: site-parallel fused workers call ``add_frame``
    concurrently; dispatches are serialized under a lock (they are async
    enqueues — the lock is held for microseconds).

    Args:
        model / params / state: the latent model (e.g. models.VQVAEz16)
            and its weights; params/state are replicated per device on
            first use.
        channels: indices into the PATCH channels to feed the model
            (reference assemble channel select, patch_VAE.py:150-156);
            must address raw channels, not the appended tm/tm2 masks.
        window_size / input_size: patch and model sizes; the device
            resize requires window_size to be an integer multiple of
            input_size (the reference operating point is 256 -> 128).
        chunk: fixed row count patch buckets are split into (must divide
            ``cell_bucket``); batch_chunks: chunks per encode dispatch —
            the encode batch is ``chunk * batch_chunks``.
        writer: io.prefetch.AsyncWriter the resized-patch downloads (for
            the ``static_patches`` artifact) drain on; None fetches
            inline at finish().
    """

    def __init__(self, model, params, state, channels: Sequence[int],
                 window_size: int = 256, input_size: int = 128,
                 chunk: int = 32, batch_chunks: int = 16,
                 patch_key: str = "mat", writer=None,
                 keep_dataset: bool = True):
        if window_size % input_size:
            raise ValueError(
                f"streaming resize needs window_size ({window_size}) to be "
                f"an integer multiple of the model input ({input_size}); "
                "use the staged assemble for other geometries")
        self.model = model
        self._weights = (params, state)
        self.channels = tuple(int(c) for c in channels)
        self.factor = window_size // input_size
        self.chunk = int(chunk)
        self.batch_chunks = int(batch_chunks)
        self.patch_key = patch_key
        self.writer = writer
        self.keep_dataset = keep_dataset
        self._lock = threading.Lock()
        # device -> list of pending (chunk_array, names_tuple) not yet
        # folded into a full encode batch
        self._pending: Dict = {}
        self._by_dev_weights: Dict = {}
        # encode results in dispatch order: (names_per_chunk, zb, za)
        self._encoded: List = []
        # resized-patch host copies for the static_patches artifact:
        # (names_tuple, fetched-ndarray or device array)
        self._resized: List = []
        self._zero_chunk = {}

    # -- device helpers -------------------------------------------------
    def _weights_on(self, dev):
        if dev not in self._by_dev_weights:
            import jax

            w = self._weights if dev is None else jax.device_put(
                self._weights, dev)
            self._by_dev_weights[dev] = w
        return self._by_dev_weights[dev]

    def _encode_fn(self):
        from .patch_vae import _encode_fn

        # the staged path's exact jitted program (per-patch z-score fused)
        return _encode_fn(self.model, "patch")

    # -- producer side (fused frame_hook) -------------------------------
    def add_frame(self, site_supp_folder: str, t_point: int, patch_out,
                  kept_cells, dev) -> None:
        """Consume one frame's device-resident patch bucket: resize +
        select channels on ``dev``, split into fixed chunks, encode when a
        full batch accumulates. Names mirror assemble_site_data's keys."""
        n = len(kept_cells)
        if n == 0:
            return
        mat = patch_out[self.patch_key]
        if max(self.channels) >= mat.shape[1]:
            raise ValueError(
                f"streaming channels {self.channels} address beyond the "
                f"{mat.shape[1]} extracted patch channels (tm/tm2 masks "
                "are appended only in the pickle artifacts)")
        if mat.shape[0] % self.chunk:
            raise ValueError(
                f"patch bucket of {mat.shape[0]} rows is not a multiple of "
                f"the streaming chunk {self.chunk} — pass chunk == the "
                "fused stage's cell_bucket")
        names = [os.path.join(site_supp_folder, "%d_%d.h5" % (t_point, cid))
                 for cid, _ in kept_cells]
        item = None
        with self._lock:
            resized = _resize_select_fn(self.channels, self.factor)(mat)
            if self.keep_dataset:
                item = [tuple(names), resized]
                self._resized.append(item)
            pend = self._pending.setdefault(dev, [])
            n_pad = resized.shape[0]
            k = self.chunk
            take = _take_chunk_fn(k)
            for ci in range(n_pad // k):
                row0 = ci * k
                valid = names[row0: row0 + k]
                if not valid:
                    break  # pure-padding tail chunks carry no patches
                pend.append((take(resized, np.int32(ci)), tuple(valid)))
            while len(pend) >= self.batch_chunks:
                self._dispatch_encode(dev, pend[: self.batch_chunks])
                del pend[: self.batch_chunks]
        if item is not None and self.writer is not None:
            # OUTSIDE the lock: submit blocks once the writer's bounded
            # queue is full (it drains device->host downloads at tunnel
            # speed), and holding the lock through that would stall every
            # other site's frame hook on enc._lock
            def fetch(it=item):
                it[1] = np.asarray(it[1])  # device -> host download

            self.writer.submit(fetch)

    def _zero(self, dev, like):
        import jax
        import jax.numpy as jnp

        key = (dev, like.shape, like.dtype)
        if key not in self._zero_chunk:
            z = jnp.zeros(like.shape, like.dtype)
            self._zero_chunk[key] = z if dev is None else \
                jax.device_put(z, dev)
        return self._zero_chunk[key]

    def _dispatch_encode(self, dev, chunks) -> None:
        """Encode exactly ``batch_chunks`` chunks (padding with zero
        chunks) in ONE fixed-shape program dispatch; results stay on
        device until finish()."""
        import jax.numpy as jnp

        arrays = [c for c, _ in chunks]
        names = [nm for _, nm in chunks]
        while len(arrays) < self.batch_chunks:
            arrays.append(self._zero(dev, arrays[0]))
            names.append(())
        batch = jnp.concatenate(arrays, axis=0)
        params, state = self._weights_on(dev)
        z_b, z_a = self._encode_fn()(params, state, batch)
        self._encoded.append((names, z_b, z_a))

    # -- consumer side ---------------------------------------------------
    def finish(self):
        """Flush partial batches, fetch everything, and return the
        well-global artifacts in sorted-patch-name order:
        (file_paths, z_b (N, D), z_a (N, D), dataset float64 or None).
        """
        with self._lock:
            for dev, pend in self._pending.items():
                while pend:
                    take = pend[: self.batch_chunks]
                    self._dispatch_encode(dev, take)
                    del pend[: self.batch_chunks]
            self._pending.clear()

        names_all: List[str] = []
        zb_rows, za_rows = [], []
        k = self.chunk
        for names, z_b, z_a in self._encoded:
            zb = np.asarray(z_b).reshape(z_b.shape[0], -1)
            za = np.asarray(z_a).reshape(z_a.shape[0], -1)
            for ci, nm in enumerate(names):
                if not nm:
                    continue
                names_all.extend(nm)
                zb_rows.append(zb[ci * k: ci * k + len(nm)])
                za_rows.append(za[ci * k: ci * k + len(nm)])
        if not names_all:
            raise ValueError(
                "no patches streamed for this well — upstream segmentation/"
                "instance clustering produced no cells")
        order = np.argsort(np.asarray(names_all))
        z_b = np.concatenate(zb_rows, 0)[order]
        z_a = np.concatenate(za_rows, 0)[order]
        fs = [names_all[i] for i in order]

        dataset = None
        if self.keep_dataset:
            rows, rnames = [], []
            for nm, arr in self._resized:
                arr = np.asarray(arr)  # host already if the writer fetched
                rows.append(arr[: len(nm)])
                rnames.extend(nm)
            flat = np.concatenate(rows, 0)
            # the reference static_patches contract: float64 with the
            # stale z axis (assemble_VAE stacks (C, Z=1, H, W) mats)
            dataset = flat.astype(np.float64)[:, :, None][
                np.argsort(np.asarray(rnames))]
        return fs, z_b, z_a, dataset


def seg_patch_stream(raw_folder: str, supp_folder: str,
                     sites: Sequence[str], config, rerun: bool = True,
                     site_parallelism: Optional[int] = None,
                     batch_size: Optional[int] = None,
                     patch_type: Optional[str] = None, **fused_kwargs):
    """Run the fused front-end with the streaming encoder attached: one
    pass over the raw stacks produces the fused stage's artifacts PLUS
    ``<well>_file_paths.pkl``, ``<well>_static_patches.pkl`` and the
    latent pickles, with patches never leaving HBM between extraction and
    encode (module docstring). Relations/labels still require
    trajectories; run ``assemble_relations`` after ``build_trajectories``.

    ``patch_type``: which patch variant feeds the encoder — "mat" or
    "masked_mat" (default: ``config.latent_encoding.patch_type``, same
    contract as ``assemble_vae``; the orchestrator passes "mat").

    ``rerun=False`` only skips front-end work whose completion marker
    exists, but the encoder consumes patches from the LIVE frame hook —
    skipped sites would stream nothing, so streaming forces rerun=True
    and logs when the flag is overridden.

    Matches the artifact contracts of reference pipeline/patch_VAE.py:
    115-175 (assemble) and :343-508 (process_VAE).
    """
    import jax

    from ..core.profiling import stage_timer
    from ..io.compact import save_array, storage_path
    from ..io.pickles import save_pickle
    from ..io.prefetch import AsyncWriter
    from ..io.sites import group_sites_by_well, site_supp_folder
    from .fused import build_seg_model, seg_patch_fused
    from .patch_vae import (_build_model_from_config, _load_model_weights,
                            resolve_latent_weights)

    le = config.latent_encoding
    if "VAE" not in le.network:
        # the streaming encoder shares process_vae's VAE-family encode
        # program; the ResNet branch (patch_vae.py ResNet path) normalizes
        # on host and has no streaming form — route those through the
        # staged pipeline instead (the orchestrator does this gate too)
        raise ValueError(
            f"streaming latent encode supports the VAE family only, got "
            f"network '{le.network}' — run the fused front-end + staged "
            "assemble/process for ResNet encoders")
    patch_type = patch_type or le.patch_type
    if not rerun:
        log.warning("seg_patch_stream streams patches from the live frame "
                    "hook — rerun=False would skip completed sites and "
                    "stream nothing for them; forcing rerun=True")
        rerun = True
    model = _build_model_from_config(le, num_inputs=2)
    weights, model_path, model_name = resolve_latent_weights(le)
    params, state = _load_model_weights(model, model_path)
    output_dir = os.path.join(raw_folder, model_name)
    os.makedirs(output_dir, exist_ok=True)
    storage = getattr(le, "storage", "pickle")
    # ONE seg model for the whole run: its per-frame jitted programs are
    # cached on the instance, so wells/sites share compiled programs
    # instead of recompiling per driver call (CLAUDE.md: never rebuild jit
    # closures per site)
    seg_model = build_seg_model(config)

    window = config.patch.window_size
    input_size = getattr(le, "input_size", None) or 128
    # patch buckets arrive padded to cell_bucket multiples, so the default
    # chunk IS the bucket (any divisor of it also works)
    chunk = int(fused_kwargs.pop("chunk",
                                 fused_kwargs.get("cell_bucket", 32)))
    batch = batch_size or 512
    batch_chunks = max(1, batch // chunk)

    wells = group_sites_by_well(sites)
    with AsyncWriter(depth=2) as writer:
        for well in sorted(wells):
            well_sites = wells[well]
            enc = StreamingWellEncoder(
                model, params, state, channels=le.channels,
                window_size=window, input_size=input_size, chunk=chunk,
                batch_chunks=batch_chunks, patch_key=patch_type,
                writer=writer)

            def hook_for(site):
                supp = site_supp_folder(supp_folder, site)

                def hook(t_point, patch_out, kept_cells, dev,
                         _supp=supp):
                    enc.add_frame(_supp, t_point, patch_out, kept_cells,
                                  dev)

                return hook

            with stage_timer("seg_patch_stream", well=well):
                # ONE driver call per well (site-parallel inside); the
                # frame_hook_for factory binds each site's supp folder
                failures = seg_patch_fused(
                    raw_folder, supp_folder, well_sites, config,
                    rerun=rerun, site_parallelism=site_parallelism,
                    model=seg_model, frame_hook_for=hook_for,
                    **fused_kwargs)
                if failures:
                    # publishing well artifacts assembled from PARTIAL
                    # streams would look complete to the orchestrator's
                    # skip_if and never re-run — fail the stage instead
                    # (the staged path re-runs failed sites because their
                    # cell_positions.pkl completion marker is missing)
                    raise RuntimeError(
                        f"well {well}: fused front-end failed for sites "
                        f"{[s for s, _ in failures]} — not writing "
                        "partial latents/static_patches"
                    ) from failures[0][1]
                fs, z_b, z_a, dataset = enc.finish()

            save_pickle(fs, os.path.join(raw_folder,
                                         f"{well}_file_paths.pkl"))
            writer.submit(
                save_array, dataset,
                storage_path(os.path.join(raw_folder,
                                          f"{well}_static_patches.pkl"),
                             storage), storage=storage)
            writer.submit(
                save_array, z_b,
                storage_path(os.path.join(output_dir,
                                          f"{well}_latent_space.pkl"),
                             storage), storage=storage)
            writer.submit(
                save_array, z_a,
                storage_path(
                    os.path.join(output_dir,
                                 f"{well}_latent_space_after.pkl"),
                    storage), storage=storage)
            if le.save_output:
                from .patch_vae import _save_recon_images

                writer.submit(_save_recon_images, model, params, state,
                              dataset[:, :, 0], output_dir)


def assemble_relations(raw_folder: str, supp_folder: str,
                       sites: Sequence[str], config) -> None:
    """The assemble stage's trajectory-relation half, for streaming runs:
    file_paths/static_patches were already written by seg_patch_stream;
    relations/labels need cell_traj.pkl from build_trajectories
    (reference patch_VAE.py:157-175)."""
    from ..io.pickles import load_pickle, save_pickle
    from ..io.sites import group_sites_by_well
    from ..track.relations import generate_trajectory_relations

    for well, well_sites in group_sites_by_well(sites).items():
        fs = load_pickle(os.path.join(raw_folder,
                                      f"{well}_file_paths.pkl"))
        well_supp = os.path.join(supp_folder, f"{well}-supps")
        relations, labels = generate_trajectory_relations(
            fs, well_sites, well_supp)
        save_pickle(relations, os.path.join(
            raw_folder, f"{well}_static_patches_relations.pkl"))
        save_pickle(labels, os.path.join(
            raw_folder, f"{well}_static_patches_labels.pkl"))
