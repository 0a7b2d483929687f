"""ImageNet-pretrained baseline feature extractors (aux), offline-runnable.

Behavioral spec: reference HiddenStateExtractor/naive_imagenet.py:29-129 —
pretrained ResNet50 global-average-pool features over single-cell patches
(each grayscale channel resized to 224x224 and replicated to 3 channels),
used as a baseline against the learned VQ-VAE latents. (The reference's own
`predict` is dead code — it appends to an undefined ``ys``,
naive_imagenet.py:121; `extract_features` here is the working equivalent.)

TPU-native: the extractor is the JAX ResNet50 trunk from
models/resnet_simclr.py (batched, jitted, global-avg-pool "h" output).
Weights import from a torchvision-format ``resnet50`` state_dict — a local
file, no Keras download — via models/torch_import.import_torchvision_resnet;
with no weights the extractor runs with random init (structure/testing).
The matching input preprocessing is torchvision's (scale to [0, 1],
normalize by ImageNet channel mean/std), replacing the reference's
caffe-style keras preprocess_input.
"""
from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

from ..core.constants import CHANNEL_MAX

# torchvision ImageNet normalization constants
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def read_file_path(root: str) -> List[str]:
    """All .h5 files under ``root`` (reference naive_imagenet.py:11-26)."""
    files = []
    for dir_name, _, fs in os.walk(root):
        for f in fs:
            if f.endswith(".h5"):
                files.append(os.path.join(dir_name, f))
    return files


def preprocess_patch(dat: np.ndarray, cs=(0, 1),
                     channel_max=CHANNEL_MAX) -> np.ndarray:
    """Scale selected channels to [0, 1] (reference preprocessing
    semantics, naive_imagenet.py:106-117 without the x255)."""
    dat = np.asarray(dat)[np.asarray(cs)].astype(float)
    return dat / channel_max


def preprocess(patch: np.ndarray, cs: Sequence[int] = (0, 1),
               channel_max=CHANNEL_MAX, size: int = 224,
               mode: str = "torch") -> np.ndarray:
    """One (C, H, W) patch -> (len(cs), 3, size, size) float32 network
    inputs: per selected grayscale channel, resize to size^2, replicate to
    3 channels, scale to [0, 1], then model-specific normalization
    (reference naive_imagenet.py:63-85 resize/replicate semantics).

    ``mode="torch"``: torchvision ImageNet mean/std, matching the imported
    ResNet weights. ``mode="inception"``: scale to [-1, 1] — exactly the
    reference's [0,255] -> keras 'tf'-mode ``preprocess_input`` chain
    (g*255/127.5 - 1 == 2g - 1, naive_imagenet.py:60,85-87).
    """
    import cv2

    patch = np.asarray(patch)
    if cs is None:
        cs = range(patch.shape[0])
    stacks = []
    for c in cs:
        g = cv2.resize(patch[c].astype(np.float64), (size, size))
        g = g / np.asarray(channel_max, np.float64)
        rgb = np.stack([g] * 3, 0).astype(np.float32)
        if mode == "inception":
            rgb = rgb * 2.0 - 1.0
        else:
            rgb = (rgb - IMAGENET_MEAN[:, None, None]) \
                / IMAGENET_STD[:, None, None]
        stacks.append(rgb)
    return np.stack(stacks, 0)


def initiate_model(weights: Optional[object] = None, arch: str = "ResNet50"):
    """Build the ResNet feature extractor (reference naive_imagenet.py:29-45).

    Args:
        weights: torchvision-format state_dict ({name: array} or a torch
            checkpoint path) for offline pretrained init; None -> random.
        arch: ResNet18/50/101/152.

    Returns:
        (model, params, state) — model is an EncodeProject whose
        ``encode_fn(..., out="h")`` yields the global-avg-pool features
        (2048-d for ResNet50).
    """
    import jax

    from ..models.resnet_simclr import EncodeProject

    model = EncodeProject(arch=arch, num_inputs=3)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    if weights is not None:
        from ..models.torch_import import (import_torchvision_resnet,
                                           load_state_dict_numpy)

        sd = weights if isinstance(weights, dict) \
            else load_state_dict_numpy(weights)
        trunk_p, trunk_s = import_torchvision_resnet(sd, arch)
        params = {**params, **trunk_p}
        state = {**state, **trunk_s}
    return model, params, state


def initiate_model_inception(weights: Optional[str] = None,
                             pooling: str = "avg"):
    """Build the InceptionResNetV2 feature extractor (reference
    naive_imagenet.py:47-60, ``initiate_model_inception`` — dead code
    upstream, ported for baseline completeness).

    Args:
        weights: path to a keras_applications InceptionResNetV2 ``.h5``
            weight file (legacy layout, as distributed for
            ``weights='imagenet'``) for offline pretrained init; None ->
            random glorot init (structure/testing).

    Returns:
        (model, params, state) — use with ``extract_features(...,
        mode="inception")``; features are 1536-d pooled.
    """
    from ..models.inception_resnet_v2 import (
        InceptionResNetV2, import_keras_inception_resnet_v2)

    if weights is not None:
        return import_keras_inception_resnet_v2(weights, pooling=pooling)
    model = InceptionResNetV2(pooling=pooling)
    params, state = model.init(0)
    return model, params, state


def extract_features(patches, model, params, state, cs: Sequence[int] = (0, 1),
                     channel_max=CHANNEL_MAX, batch_size: int = 128,
                     size: int = 224, mode: str = "torch") -> np.ndarray:
    """Encode patches to pooled ImageNet features (the working equivalent of
    reference naive_imagenet.py:88-129 `predict`).

    Args:
        patches: (N, C, H, W) array, or a list of .h5 file paths whose
            'masked_mat' datasets are (H, W, C) (reference layout).

    Returns:
        (N, len(cs), feat_dim) float32 features.
    """
    xs = []
    for p in patches:
        if isinstance(p, (str, os.PathLike)):
            import h5py

            with h5py.File(p, "r") as f:
                p = np.transpose(np.asarray(f["masked_mat"]), (2, 0, 1))
        xs.append(preprocess(p, cs=cs, channel_max=channel_max, size=size,
                             mode=mode))
    x = np.concatenate(xs, 0)  # (N * n_channels, 3, size, size)
    feats = model.encode_batched(params, state, x, out="h",
                                 batch_size=batch_size)
    # derive per-patch channel count from the data so cs=None (all
    # channels, as preprocess supports) works too
    return feats.reshape(len(xs), x.shape[0] // len(xs), -1)
