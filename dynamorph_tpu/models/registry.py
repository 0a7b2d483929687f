"""Model dispatch by config string.

The reference dispatches with ``getattr(vae, config.network)``
(run_training.py:885-897, pipeline/patch_VAE.py:424-433); we use an explicit
registry keyed by the same network names so reference configs work unchanged.
"""
from __future__ import annotations

from .vqvae import VQVAEz16, VQVAEz32
from .vae import VAEModel, IWAEModel, AAEModel

_REGISTRY = {
    "VQ_VAE_z16": VQVAEz16,
    "VQ_VAE_z32": VQVAEz32,
    "VAE": VAEModel,
    "IWAE": IWAEModel,
    "AAE": AAEModel,
}


def get_model_cls(name: str):
    if name not in _REGISTRY:
        raise ValueError(
            f"Unknown network {name!r}; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def available_models():
    return sorted(_REGISTRY)
