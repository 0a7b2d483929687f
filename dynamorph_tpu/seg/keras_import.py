"""Import reference-trained Keras U-Net weights (.h5) into KerasUNet.

The reference saves segmentation models with ``model.save_weights(path)``
(NNsegmentation/models.py:195-197) and reloads them for inference
(pipeline/segmentation.py:55-68) — Keras HDF5 weight files. This module
parses that format directly with h5py (no TensorFlow needed) and maps the
weights onto ``models.unet_keras.KerasUNet``'s flat layer-name pytree.

Accepted inputs:
- ``.h5``/``.hdf5`` from ``model.save_weights`` (layer groups at the root)
  or from full ``model.save`` (layer groups under ``model_weights``);
- ``.npz`` produced by ``tools/export_keras_unet.py`` (keys
  ``<layer>/<weight>:0``) — the TF-side exporter for golden-activation
  validation where TensorFlow exists.

Weight-name mapping (Keras -> pytree):
- Conv2D: ``kernel:0`` (kh, kw, in, out — exactly our NHWC HWIO layout) and
  optional ``bias:0``;
- BatchNormalization: ``gamma:0``/``beta:0`` -> params scale/offset,
  ``moving_mean:0``/``moving_variance:0`` -> state mean/var. ``bn_data``
  is built with ``scale=False`` (no gamma in the file) — gamma stays the
  imported tree's ones.

Nested-model indirection (the sm.Unet is ONE layer of the outer Keras
model, so its weight paths are ``<model_name>/<layer>/<weight>:0`` with a
session-dependent model name) is flattened by keying on the LAST two path
components, which are unique across the whole graph.
"""
from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

_KERAS_SUFFIXES = (".h5", ".hdf5")


def is_keras_weight_file(path: str) -> bool:
    return os.path.splitext(path)[1].lower() in _KERAS_SUFFIXES


def read_keras_layer_weights(path: str) -> Dict[str, Dict[str, np.ndarray]]:
    """Parse a Keras HDF5 weight file (or exporter .npz) into
    {layer_name: {weight_basename: array}} with ``:0`` suffixes stripped."""
    layers: Dict[str, Dict[str, np.ndarray]] = {}

    def add(full_name: str, arr: np.ndarray) -> None:
        parts = full_name.split("/")
        if len(parts) < 2:
            return
        layer, wname = parts[-2], parts[-1].split(":")[0]
        layers.setdefault(layer, {})[wname] = np.asarray(arr)

    if path.endswith(".npz"):
        with np.load(path) as f:
            for k in f.files:
                add(k, f[k])
        return layers

    import h5py

    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f

        def visit(name, obj):
            if isinstance(obj, h5py.Dataset):
                add(name, obj[()])

        root.visititems(visit)
    return layers


def import_keras_unet(path: str, n_channels: int = 2, n_classes: int = 3,
                      decoder_filters=(256, 128, 64, 32, 16)
                      ) -> Tuple[dict, dict]:
    """Load a reference ``.h5`` (or exporter ``.npz``) into a
    (params, state) pytree for ``KerasUNet``. Every expected layer must be
    present with matching shapes; unexpected extra layers are rejected so a
    2.5-D multislice checkpoint can't silently load as a 2-D model."""
    import jax

    from ..models.unet_keras import KerasUNet

    net = KerasUNet(n_channels=n_channels, n_classes=n_classes,
                    decoder_filters=tuple(decoder_filters))
    params, state = jax.eval_shape(lambda: net.init(
        jax.random.PRNGKey(0)))
    # materialize concrete arrays to overlay into (eval_shape gives only
    # structs; gamma-of-bn_data keeps ones, everything else is replaced)
    params = jax.tree_util.tree_map(
        lambda s: np.ones(s.shape, s.dtype), params)
    state = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), state)

    layers = read_keras_layer_weights(path)
    seen = set()

    def take(layer: str, wname: str, expect_shape) -> np.ndarray:
        if layer not in layers:
            raise ValueError(f"keras weight file {path} is missing layer "
                             f"'{layer}' — not a 2-D Segment checkpoint?")
        if wname not in layers[layer]:
            raise ValueError(f"layer '{layer}' has no weight '{wname}' "
                             f"(found {sorted(layers[layer])})")
        arr = layers[layer][wname].astype(np.float32)
        if tuple(arr.shape) != tuple(expect_shape):
            raise ValueError(
                f"shape mismatch for {layer}/{wname}: file has {arr.shape}, "
                f"model expects {tuple(expect_shape)} — check n_channels/"
                f"n_classes/decoder_filters")
        seen.add(layer)
        return arr

    for name, p in params.items():
        if "kernel" in p:  # conv layer
            p["kernel"] = take(name, "kernel", p["kernel"].shape)
            if "bias" in p:
                p["bias"] = take(name, "bias", p["bias"].shape)
        else:  # batch norm
            if name != "bn_data":  # scale=False: no gamma in the file
                p["scale"] = take(name, "gamma", p["scale"].shape)
            p["offset"] = take(name, "beta", p["offset"].shape)
            s = state[name]
            s["mean"] = take(name, "moving_mean", s["mean"].shape)
            s["var"] = take(name, "moving_variance", s["var"].shape)

    extra = {l for l, w in layers.items() if w} - seen
    if extra:
        raise ValueError(
            f"keras weight file {path} has unexpected weighted layers "
            f"{sorted(extra)} — a plain 2-D Segment checkpoint has none")
    return params, state


def verify_against_golden(net, params, state, golden_path: str,
                          atol: float = 2e-3) -> float:
    """Check the imported model against golden activations from
    ``tools/export_keras_unet.py`` (keys ``golden_input``/``golden_logits``
    in the .npz). Returns the max abs logit deviation; raises if > atol.

    Default atol covers the measured float32 accumulation spread between
    backends: ~4.8e-4 logit deviation vs a float64 oracle on TPU v5e
    (models/unet_keras.py) plus TF-f32-on-CPU's own rounding — a
    weight-correct import lands well under 2e-3; real weight-mapping bugs
    produce O(1) deviations."""
    import jax

    with np.load(golden_path) as f:
        if "golden_input" not in f or "golden_logits" not in f:
            raise ValueError(f"{golden_path} has no golden activations — "
                             "re-run tools/export_keras_unet.py")
        x = f["golden_input"].astype(np.float32)
        want = f["golden_logits"].astype(np.float32)
    got, _ = jax.jit(lambda p, s, x: net.apply(p, s, x))(params, state, x)
    dev = float(np.max(np.abs(np.asarray(got) - want)))
    if dev > atol:
        raise AssertionError(
            f"imported model deviates from TF goldens by {dev:.3e} "
            f"(atol {atol:.1e})")
    return dev
