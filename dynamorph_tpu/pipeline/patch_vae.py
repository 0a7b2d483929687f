"""VAE dataset assembly + latent encoding pipeline stages.

Behavioral spec: reference pipeline/patch_VAE.py (assemble_VAE :115-175,
process_VAE :343-508, combine_dataset :178-254, trajectory_matching :257-318)
and HiddenStateExtractor/vq_vae_supp.py:114-146 (prepare_dataset_v2).

TPU-native redesign of the hot path: the reference encodes ONE patch per
forward (patch_VAE.py:445-452); here patches are encoded in large jitted
batches with async dispatch so host pickle-IO overlaps device compute. Output
pickle formats are unchanged.
"""
from __future__ import annotations

import functools
import logging
import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from ..io.compact import (load_array_any, load_stack_any, save_array,
                          storage_path)
from ..io.pickles import load_pickle, save_pickle
from ..io.sites import site_supp_folder, well_of
from ..models.registry import get_model_cls
from ..track.relations import generate_trajectory_relations
from ..train.data import zscore_patch

log = logging.getLogger(__name__)


def _resize_chw(dat: np.ndarray, hw: Tuple[int, int]) -> np.ndarray:
    """cv2 bilinear resize over trailing (H, W) of a (..., H, W) array
    (reference cv2_fn_wrapper, extract_patches.py:21-37)."""
    import cv2

    shape = dat.shape
    flat = dat.reshape((-1, shape[-2], shape[-1])).transpose((1, 2, 0))
    out = cv2.resize(flat, hw)
    if out.ndim == 2:
        out = out[:, :, None]
    new_h, new_w = out.shape[0], out.shape[1]
    return out.transpose((2, 0, 1)).reshape(tuple(shape[:-2]) + (new_h, new_w))


def prepare_dataset(dat_fs: Sequence[str], channels=None,
                    input_shape: Tuple[int, int] = (128, 128),
                    key: str = "masked_mat"):
    """Read stacks_*.pkl dicts, select channels, resize to ``input_shape``,
    stack sorted by patch name (reference vq_vae_supp.py:114-146)."""
    tensors = {}
    for dat_f in dat_fs:
        log.info("loading data %s", dat_f)
        file_dats = load_stack_any(dat_f)
        for k, v in file_dats.items():
            dat = np.asarray(v[key])
            cs = np.arange(dat.shape[0]) if channels is None else np.asarray(channels)
            dat = dat[cs].astype(float)
            tensors[k] = _resize_chw(dat, input_shape)
    ts_keys = sorted(tensors.keys())
    if not ts_keys:
        raise ValueError(
            "no patches found in any stacks_*.pkl — upstream segmentation/"
            "instance clustering produced no cells")
    dataset = np.stack([tensors[k] for k in ts_keys], 0)
    return dataset, ts_keys


def assemble_vae(raw_folder: str, supp_folder: str, sites: Sequence[str],
                 config, patch_type: Optional[str] = None) -> None:
    """Assemble per-well VAE input dataset + relations + labels
    (reference pipeline/patch_VAE.py:115-175)."""
    le = config.latent_encoding
    channels = le.channels
    patch_type = patch_type or le.patch_type
    assert len(channels) > 0, "At least one channel must be specified"
    assert len({well_of(s) for s in sites}) == 1, \
        "Sites should be from a single well/condition"
    well = well_of(sites[0])

    storage = getattr(le, "storage", "pickle")
    dat_fs = []
    for site in sites:
        folder = site_supp_folder(supp_folder, site)
        # stacks may exist as .pkl (reference contract) and/or .npz
        # (compact storage): dedupe by stem, preferring the configured
        # storage's extension when both are present
        stems: dict = {}
        prefer_ext = ".npz" if storage == "compact" else ".pkl"
        for f in sorted(os.listdir(folder)):
            stem, ext = os.path.splitext(f)
            if not f.startswith("stacks") or ext not in (".pkl", ".npz"):
                continue
            if stem not in stems or ext == prefer_ext:
                stems[stem] = f
        dat_fs.extend(os.path.join(folder, stems[s]) for s in sorted(stems))

    input_size = int(getattr(le, "input_size", 128) or 128)
    dataset, fs = prepare_dataset(dat_fs, channels=channels, key=patch_type,
                                  input_shape=(input_size, input_size))
    assert fs == sorted(fs)

    save_pickle(fs, os.path.join(raw_folder, f"{well}_file_paths.pkl"))
    save_array(dataset,
               storage_path(
                   os.path.join(raw_folder, f"{well}_static_patches.pkl"),
                   storage),
               storage=storage)

    well_supp = os.path.join(supp_folder, f"{well}-supps")
    relations, labels = generate_trajectory_relations(fs, sites, well_supp)
    save_pickle(relations,
                os.path.join(raw_folder, f"{well}_static_patches_relations.pkl"))
    save_pickle(labels,
                os.path.join(raw_folder, f"{well}_static_patches_labels.pkl"))


def encode_patches(model, params, state, dataset: np.ndarray,
                   batch_size: int = 512, mesh=None,
                   normalize: Optional[str] = None):
    """Batched TPU encode: (N, C, H, W) -> (z_before (N, D*), z_after (N, D*)).

    Pads the trailing batch to keep one compiled program; dispatch is async so
    the host loop stays ahead of the device. With more than one local device,
    batches are sharded over the mesh's ``data`` axis (params replicated) —
    the multi-chip scaling path replacing the reference's process-per-GPU
    fan-out (reference run_VAE.py:73-85).

    normalize="patch" fuses per-patch per-channel z-scoring
    (train_utils.py:252-274 semantics) into the jitted program, removing the
    host normalisation pass over the dataset.
    """
    import jax
    import jax.numpy as jnp

    if mesh is None and len(jax.local_devices()) > 1:
        from ..core.mesh import local_mesh

        mesh = local_mesh()
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        data_sh = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())
        params = jax.device_put(params, rep)
        state = jax.device_put(state, rep)
        n_dev = mesh.shape["data"]
        batch_size = ((batch_size + n_dev - 1) // n_dev) * n_dev

        def put(batch):
            return jax.device_put(batch, data_sh)
    else:
        def put(batch):
            return jnp.asarray(batch)

    encode = _encode_fn(model, normalize)
    n = len(dataset)
    outs = []
    for i in range(0, n, batch_size):
        batch = dataset[i: i + batch_size].astype(np.float32)
        if len(batch) < batch_size:
            pad = batch_size - len(batch)
            batch = np.concatenate(
                [batch, np.zeros((pad,) + batch.shape[1:], batch.dtype)], 0)
        outs.append(encode(params, state, put(batch)))
    z_b = np.concatenate([np.asarray(a) for a, _ in outs], 0)[:n]
    z_a = np.concatenate([np.asarray(b) for _, b in outs], 0)[:n]
    return z_b.reshape(n, -1), z_a.reshape(n, -1)


def resolve_latent_weights(le):
    """The latent_encoding weights contract, in ONE place (process_vae,
    the streaming encoder, and the orchestrator's skip_if all depend on
    agreeing about it): the reference accepts a list of weight dirs and
    uses the first (patch_VAE.py:364-368), a weights DIR containing
    ``model.pt`` loads that file, and latent outputs land under
    ``<raw_folder>/<basename(weights)>/``.

    Returns (weights, model_path, model_name): the first weights entry,
    the loadable path for ``_load_model_weights``, and the output
    directory name."""
    weights = le.weights
    if isinstance(weights, (list, tuple)):
        weights = weights[0]
    model_path = weights
    if model_path is not None and os.path.isdir(model_path) and \
            os.path.exists(os.path.join(model_path, "model.pt")):
        model_path = os.path.join(model_path, "model.pt")
    model_name = os.path.basename(os.path.normpath(weights)) \
        if weights else "model"
    return weights, model_path, model_name


def _build_model_from_config(le, num_inputs: int = 2):
    cls = get_model_cls(le.network)
    # num_inputs/num_residual_layers hardcoded in the reference process path
    # (patch_VAE.py:426-429).
    return cls(num_inputs=num_inputs,
               num_hiddens=le.num_hiddens,
               num_residual_hiddens=le.num_residual_hiddens,
               num_residual_layers=2,
               num_embeddings=le.num_embeddings,
               commitment_cost=le.commitment_cost)


def _load_model_weights(model, weights_path: str):
    """Load either an orbax checkpoint dir or a torch .pt state_dict."""
    import jax

    if os.path.isdir(weights_path):
        from ..train.checkpoint import restore_checkpoint

        ck = restore_checkpoint(weights_path)
        return ck["params"], ck["state"]
    # torch state_dict
    from ..models.torch_import import (import_vqvae_z16, import_vqvae_z32,
                                       load_state_dict_numpy)

    sd = load_state_dict_numpy(weights_path)
    name = type(model).__name__
    if name == "VQVAEz16":
        return import_vqvae_z16(sd, model.num_residual_layers)
    if name == "VQVAEz32":
        return import_vqvae_z32(sd, model.num_residual_layers)
    raise ValueError(f"No torch importer for {name}")


@functools.lru_cache(maxsize=16)
def _encode_fn(model, normalize):
    """Jitted encode, cached per (model, normalize): models are frozen
    dataclasses (hashable), so repeated wells reuse one compiled program
    instead of retracing a fresh lambda each call."""
    import jax
    import jax.numpy as jnp

    def _encode(p, s, x):
        if normalize == "patch":
            mean = jnp.mean(x, axis=(2, 3), keepdims=True)
            std = jnp.std(x, axis=(2, 3), keepdims=True)
            x = (x - mean) / (std + np.finfo(float).eps)
        return model.encode(p, s, x)[:2]

    return jax.jit(_encode)


def load_well_inputs(raw_folder: str, well: str):
    """Host-side inputs for one well's encode (prefetchable). Static patches
    load from either the pickle or compact (.npz) format, whichever exists."""
    fs = load_pickle(os.path.join(raw_folder, f"{well}_file_paths.pkl"))
    dataset = load_array_any(
        os.path.join(raw_folder, f"{well}_static_patches.pkl"))
    return fs, dataset


def process_vae(raw_folder: str, supp_folder: str, sites: Sequence[str],
                config, batch_size: int = 512,
                preloaded=None, writer=None) -> Dict[str, str]:
    """Encode a well's static patches to latent vectors
    (reference pipeline/patch_VAE.py:343-508), batched on TPU.

    Saves ``<well>_latent_space.pkl`` (pre-VQ) and
    ``<well>_latent_space_after.pkl`` (post-VQ) under
    ``<raw_folder>/<model_name>/``; optionally 20 recon JPEGs.

    ``preloaded``: optional (fs, dataset) from ``load_well_inputs`` — lets a
    caller prefetch the next well's pickles while this one encodes
    (io/prefetch.Prefetcher).

    ``writer``: optional io.prefetch.AsyncWriter — latent pickle saves
    (and recon JPEGs) submit to it instead of blocking, so a multi-well
    caller overlaps well k's serialization with well k+1's encode; the
    caller owns close() (which re-raises any failed write).
    """
    le = config.latent_encoding
    weights_dir, probed_path, model_name = resolve_latent_weights(le)
    assert len({well_of(s) for s in sites}) == 1, \
        "Sites should be from a single well/condition"
    well = well_of(sites[0])

    fs, dataset = preloaded if preloaded is not None \
        else load_well_inputs(raw_folder, well)
    # NOTE: per-patch z-scoring (reference patch_VAE.py:418) happens ON
    # DEVICE for the VAE branch — encode_patches(normalize="patch") fuses
    # it into the jitted encode, skipping a full host traversal + copy of
    # the dataset; the ResNet branch normalizes on host below.
    # squeeze only the stale z axis: the reference's bare np.squeeze
    # (patch_VAE.py:419) also drops a singleton batch/channel axis,
    # crashing single-patch wells on the 4-D assert below
    if dataset.ndim == 5 and dataset.shape[2] == 1:
        dataset = dataset[:, :, 0]
    else:
        dataset = np.squeeze(dataset)
    assert dataset.ndim == 4, f"dataset must be 4-D, got {dataset.ndim}"
    assert len(fs) == len(dataset)

    # the model.pt dir probe applies to the VAE family only; the ResNet
    # branch below passes the raw weights path through unchanged
    output_dir = os.path.join(raw_folder, model_name)
    os.makedirs(output_dir, exist_ok=True)

    from ..core.profiling import stage_timer

    if "VAE" in le.network:
        model = _build_model_from_config(le, num_inputs=2)
        params, state = _load_model_weights(model, probed_path)

        # encode_patches auto-meshes over all local devices when mesh=None
        with stage_timer("process_vae_encode", well=well, n=len(dataset)):
            z_b, z_a = encode_patches(model, params, state, dataset,
                                      batch_size, normalize="patch")
        storage = getattr(le, "storage", "pickle")
        put = writer.submit if writer is not None \
            else (lambda fn, *a, **kw: fn(*a, **kw))
        put(save_array, z_b,
            storage_path(os.path.join(output_dir,
                                      f"{well}_latent_space.pkl"), storage),
            storage=storage)
        put(save_array, z_a,
            storage_path(
                os.path.join(output_dir, f"{well}_latent_space_after.pkl"),
                storage),
            storage=storage)
        if le.save_output:
            put(_save_recon_images, model, params, state, dataset,
                output_dir)
    elif "ResNet" in le.network:
        import jax

        from ..models.resnet_simclr import EncodeProject

        model = EncodeProject(arch=le.network)
        params, state = _load_model_weights(model, weights_dir)
        dataset = zscore_patch(dataset).astype(np.float32)
        # per-well share-nothing work: shard over LOCAL devices only
        from ..core.mesh import local_mesh

        mesh = local_mesh()
        h_s = model.encode_batched(params, state, dataset, out="z",
                                   batch_size=batch_size, mesh=mesh)
        storage = getattr(le, "storage", "pickle")
        put = writer.submit if writer is not None \
            else (lambda fn, *a, **kw: fn(*a, **kw))
        put(save_array, h_s,
            storage_path(os.path.join(output_dir,
                                      f"{well}_latent_space.pkl"), storage),
            storage=storage)
    else:
        raise ValueError(f"Network {le.network} is not available")
    return {"output_dir": output_dir}


def _save_recon_images(model, params, state, dataset, output_dir, n: int = 20):
    """20 random reconstruction JPEGs (reference patch_VAE.py:464-489).

    Object-oriented matplotlib (no pyplot globals) so it can run on an
    io.prefetch.AsyncWriter thread while the next well encodes."""
    import jax
    import jax.numpy as jnp
    from matplotlib.backends.backend_agg import FigureCanvasAgg
    from matplotlib.figure import Figure

    from ..io.images import im_adjust

    from ..train.data import zscore_patch

    rng = np.random.RandomState(0)
    random_inds = rng.randint(0, len(dataset), (n,))
    # one jitted program reused for all n samples — eager apply would
    # dispatch every conv/VQ primitive as its own relay program
    apply = jax.jit(lambda p, s, x: model.apply(p, s, x))
    for i in random_inds:
        # dataset arrives raw; per-patch z-score is local to each sample
        sample = zscore_patch(dataset[i: i + 1]).astype(np.float32)
        output, _, _ = apply(params, state, jnp.asarray(sample))
        output = np.asarray(output)
        ims = [im_adjust(sample[0, 0]), im_adjust(output[0, 0]),
               im_adjust(sample[0, 1]), im_adjust(output[0, 1])]
        names = ["phase", "phase_recon", "im_retard", "retard_recon"]
        fig = Figure(figsize=(15, 10))
        FigureCanvasAgg(fig)
        for k, (im, name) in enumerate(zip(ims, names)):
            a = fig.add_subplot(2, 2, k + 1)
            a.imshow(np.squeeze(im), cmap="gray")
            a.axis("off")
            a.set_title(name, fontsize=12)
        fig.savefig(os.path.join(output_dir, "recon_%d.jpg" % i),
                    dpi=300, bbox_inches="tight")


def combine_dataset(input_dataset_names: Sequence[str],
                    output_dataset_name: str, save_mask: bool = True) -> None:
    """Merge multiple per-well datasets into one, global sort by patch name
    (reference pipeline/patch_VAE.py:178-254)."""
    separate_fs, separate_dataset = [], []
    separate_mask, separate_relations = [], []
    for n in input_dataset_names:
        separate_fs.append(load_pickle(n + "_file_paths.pkl"))
        separate_dataset.append(load_array_any(n + "_static_patches.pkl"))
        separate_relations.append(load_pickle(n + "_static_patches_relations.pkl"))
        if save_mask:
            separate_mask.append(load_array_any(n + "_static_patches_mask.pkl"))
        else:
            separate_mask.append([None] * len(separate_fs[-1]))

    all_fs = sorted(sum(separate_fs, []))
    assert len(all_fs) == len(set(all_fs)), "Found patches with identical name"
    save_pickle(all_fs, output_dataset_name + "_file_paths.pkl")

    name_to_src = {n: (i, j) for i, fs in enumerate(separate_fs)
                   for j, n in enumerate(fs)}
    name_to_idx = {n: i for i, n in enumerate(all_fs)}

    all_dataset = np.stack(
        [separate_dataset[i][j] for i, j in (name_to_src[n] for n in all_fs)], 0)
    save_pickle(all_dataset, output_dataset_name + "_static_patches.pkl")
    if save_mask:
        all_mask = np.stack(
            [separate_mask[i][j] for i, j in (name_to_src[n] for n in all_fs)], 0)
        save_pickle(all_mask, output_dataset_name + "_static_patches_mask.pkl")

    all_relations = {}
    for fs, relation in zip(separate_fs, separate_relations):
        for (a, b), v in relation.items():
            all_relations[(name_to_idx[fs[a]], name_to_idx[fs[b]])] = v
    save_pickle(all_relations,
                output_dataset_name + "_static_patches_relations.pkl")


def trajectory_matching(summary_folder: str, supp_folder: str,
                        sites: Sequence[str], config=None) -> None:
    """Map cell trajectories to patch-index lists
    (reference pipeline/patch_VAE.py:257-318)."""
    from ..track.relations import patch_name_to_tuple

    assert len({well_of(s) for s in sites}) == 1, \
        "Sites should be from a single well/condition"
    well = well_of(sites[0])
    fs = load_pickle(os.path.join(summary_folder, f"{well}_file_paths.pkl"))
    patch_id_mapping = {patch_name_to_tuple(f, sites): i
                        for i, f in enumerate(fs)}

    site_trajs = {}
    for site in sites:
        folder = os.path.join(supp_folder, f"{well}-supps", site)
        trajs = load_pickle(os.path.join(folder, "cell_traj.pkl"))
        for i, t in enumerate(trajs[0]):
            name = site + "/" + str(i)
            traj = [patch_id_mapping[(site, t_point, t[t_point])]
                    for t_point in sorted(t.keys())
                    if (site, t_point, t[t_point]) in patch_id_mapping]
            if len(traj) > 0.95 * len(t):
                site_trajs[name] = traj
    save_pickle(site_trajs,
                os.path.join(summary_folder, f"{well}_trajectories.pkl"))
