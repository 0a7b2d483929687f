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


def is_multislice_weight_file(path: str, layers=None) -> bool:
    """True when the file carries the 2.5-D ``SegmentWithMultipleSlice``
    head layers (reference NNsegmentation/models.py:252-253).
    ``layers``: optional pre-parsed ``read_keras_layer_weights`` result."""
    if layers is None:
        layers = read_keras_layer_weights(path)
    return "post_conv" in layers and "pred_head" in layers


def _materialized_tree(net):
    """Concrete (params, state) arrays with the net's init shapes to
    overlay imported weights into (eval_shape gives only structs;
    gamma-of-bn_data keeps ones, everything else is replaced)."""
    import jax

    params, state = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0)))
    params = jax.tree_util.tree_map(
        lambda s: np.ones(s.shape, s.dtype), params)
    state = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), state)
    return params, state


def _overlay_layers(params, state, layers, path: str, kind: str) -> set:
    """Fill the flat layer-name pytree from parsed .h5 layers in place;
    returns the set of consumed layer names. Every expected layer must be
    present with matching shapes."""

    def take(layer: str, wname: str, expect_shape) -> np.ndarray:
        if layer not in layers:
            raise ValueError(f"keras weight file {path} is missing layer "
                             f"'{layer}' — not a {kind} checkpoint?")
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

    seen: set = set()
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
    return seen


def import_keras_unet(path: str, n_channels: int = 2, n_classes: int = 3,
                      decoder_filters=(256, 128, 64, 32, 16)
                      ) -> Tuple[dict, dict]:
    """Load a reference ``.h5`` (or exporter ``.npz``) into a
    (params, state) pytree for ``KerasUNet``. Every expected layer must be
    present with matching shapes; unexpected extra layers are rejected so a
    2.5-D multislice checkpoint can't silently load as a 2-D model (use
    ``import_keras_unet_multislice`` for those)."""
    from ..models.unet_keras import KerasUNet

    net = KerasUNet(n_channels=n_channels, n_classes=n_classes,
                    decoder_filters=tuple(decoder_filters))
    params, state = _materialized_tree(net)
    layers = read_keras_layer_weights(path)
    seen = _overlay_layers(params, state, layers, path, "2-D Segment")

    extra = {l for l, w in layers.items() if w} - seen
    if extra:
        hint = (" — this looks like a 2.5-D SegmentWithMultipleSlice "
                "checkpoint; use import_keras_unet_multislice / "
                "SegmentWithMultipleSlice.load"
                if {"post_conv", "pred_head"} <= extra else
                " — a plain 2-D Segment checkpoint has none")
        raise ValueError(
            f"keras weight file {path} has unexpected weighted layers "
            f"{sorted(extra)}{hint}")
    return params, state


def multislice_dims_from_file(path: str, layers=None
                              ) -> Tuple[int, int, int, int]:
    """Infer (n_channels, n_slices, unet_feat, n_classes) from a 2.5-D
    checkpoint's own kernels: pre_conv in-channels, post_conv in/out (the
    merge folds Z*unet_feat into channels, reference layers.py:51-86) and
    pred_head out-channels. ``layers``: optional pre-parsed
    ``read_keras_layer_weights`` result (avoids re-reading a ~100 MB .h5
    when the caller already holds it)."""
    if layers is None:
        layers = read_keras_layer_weights(path)
    for need in ("pre_conv", "post_conv", "pred_head", "final_conv"):
        if need not in layers or "kernel" not in layers[need]:
            raise ValueError(f"{path}: missing layer '{need}' — not a "
                             "SegmentWithMultipleSlice checkpoint")
    n_channels = int(layers["pre_conv"]["kernel"].shape[2])
    unet_feat = int(layers["final_conv"]["kernel"].shape[3])
    merged_in = int(layers["post_conv"]["kernel"].shape[2])
    if merged_in % unet_feat:
        raise ValueError(
            f"{path}: post_conv in-channels {merged_in} is not a multiple "
            f"of the U-Net feature width {unet_feat}")
    n_slices = merged_in // unet_feat
    n_classes = int(layers["pred_head"]["kernel"].shape[3])
    return n_channels, n_slices, unet_feat, n_classes


def import_keras_unet_multislice(path: str, n_channels: int = None,
                                 n_slices: int = None, unet_feat: int = None,
                                 n_classes: int = None,
                                 decoder_filters=(256, 128, 64, 32, 16),
                                 layers=None) -> Tuple[dict, dict]:
    """Load a reference 2.5-D ``SegmentWithMultipleSlice`` ``.h5``
    (reference NNsegmentation/models.py:206-258): the shared U-Net body
    (classes=unet_feat) plus the ``post_conv``/``pred_head`` 1x1 heads.
    Dimensions default to what the checkpoint itself encodes
    (``multislice_dims_from_file``). Returns a (params, state) pytree for
    ``seg.model.SegmentWithMultipleSlice`` with a ``KerasUNet`` body —
    the body params/state keyed by Keras layer name, plus ``post_conv`` /
    ``pred_head`` conv entries."""
    from ..models.unet_keras import KerasUNet
    from ..nn import functional as F

    if layers is None:
        layers = read_keras_layer_weights(path)
    fc, fz, ff, fk = multislice_dims_from_file(path, layers=layers)
    n_channels = fc if n_channels is None else n_channels
    n_slices = fz if n_slices is None else n_slices
    unet_feat = ff if unet_feat is None else unet_feat
    n_classes = fk if n_classes is None else n_classes
    if (fc, fz, ff, fk) != (n_channels, n_slices, unet_feat, n_classes):
        raise ValueError(
            f"{path} encodes (n_channels, n_slices, unet_feat, n_classes)="
            f"{(fc, fz, ff, fk)} but the caller requested "
            f"{(n_channels, n_slices, unet_feat, n_classes)}")

    net = KerasUNet(n_channels=n_channels, n_classes=unet_feat,
                    decoder_filters=tuple(decoder_filters))
    params, state = _materialized_tree(net)
    import jax

    key = jax.random.PRNGKey(0)
    params["post_conv"] = jax.tree_util.tree_map(
        np.asarray, F.init_conv(key, 1, 1, n_slices * unet_feat, unet_feat))
    params["pred_head"] = jax.tree_util.tree_map(
        np.asarray, F.init_conv(key, 1, 1, unet_feat, n_classes))

    seen = _overlay_layers(params, state, layers, path,
                           "SegmentWithMultipleSlice")
    extra = {l for l, w in layers.items() if w} - seen
    if extra:
        raise ValueError(
            f"keras weight file {path} has unexpected weighted layers "
            f"{sorted(extra)} beyond the 2.5-D graph")
    return params, state


def verify_against_golden(net, params, state, golden_path: str,
                          atol: float = 2e-3,
                          min_class_agreement: float = 0.999) -> float:
    """Check the imported model against golden activations from
    ``tools/export_keras_unet.py`` (keys ``golden_input``/``golden_logits``
    in the .npz). Returns the max abs logit deviation; raises if > atol OR
    if the predicted-class (argmax over the class axis) agreement with the
    goldens falls below ``min_class_agreement`` — the scalar logit
    tolerance alone cannot catch class-flipping regressions at pixels
    whose top-two logits sit within atol of each other.

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
    got = np.asarray(got)
    dev = float(np.max(np.abs(got - want)))
    if dev > atol:
        raise AssertionError(
            f"imported model deviates from TF goldens by {dev:.3e} "
            f"(atol {atol:.1e})")
    # class axis: (B, K, H, W) logits
    agreement = float(np.mean(got.argmax(axis=1) == want.argmax(axis=1)))
    if agreement < min_class_agreement:
        raise AssertionError(
            f"imported model's predicted classes agree with the TF goldens "
            f"on only {agreement:.4%} of pixels "
            f"(min {min_class_agreement:.4%}) — class-flipping import bug")
    return dev
