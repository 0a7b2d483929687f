"""ImageNet-pretrained baseline feature extractors (aux).

Behavioral spec: reference HiddenStateExtractor/naive_imagenet.py — Keras
ResNet50/InceptionV2 pretrained extractors over patches, used as a baseline
for the learned VQ-VAE latents. (Note the reference's own `predict` path is
dead code — it references an undefined variable, naive_imagenet.py:121.)

These require downloadable ImageNet weights; in offline environments the
initialisers raise a clear error. File-path utilities and preprocessing are
dependency-free and always available.
"""
from __future__ import annotations

import os
from typing import List

import numpy as np

from ..core.constants import CHANNEL_MAX


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
    """Scale selected channels to [0, 1] (reference naive_imagenet.py
    preprocessing semantics)."""
    dat = np.asarray(dat)[np.asarray(cs)].astype(float)
    return dat / channel_max


def initiate_model():
    """ResNet50 ImageNet feature extractor (reference naive_imagenet.py:29).
    Requires TF/Keras with downloadable weights."""
    try:
        from tensorflow.keras.applications.resnet50 import (
            ResNet50, preprocess_input)

        model = ResNet50(weights="imagenet", include_top=False,
                         pooling="avg", input_shape=(224, 224, 3))
        return model, preprocess_input
    except Exception as e:
        raise RuntimeError(
            "ImageNet-pretrained baselines need TF/Keras with network access "
            "to download weights; unavailable in this environment") from e


def initiate_model_inception():
    """InceptionResNetV2 extractor (reference naive_imagenet.py:47)."""
    try:
        from tensorflow.keras.applications.inception_resnet_v2 import (
            InceptionResNetV2, preprocess_input)

        model = InceptionResNetV2(weights="imagenet", include_top=False,
                                  pooling="avg", input_shape=(224, 224, 3))
        return model, preprocess_input
    except Exception as e:
        raise RuntimeError(
            "ImageNet-pretrained baselines need TF/Keras with network access "
            "to download weights; unavailable in this environment") from e
