"""Reconstruction-quality evaluation over a patch dataset.

Behavioral spec: reference plot_scripts/recon_loss.py — per-sample
reconstruction losses of a trained VQ-VAE over random patch subsets (the only
quantitative quality numbers recorded in the reference: 0.00756 +/- 0.01691
train / 0.00795 +/- 0.00617 held-out, recon_loss.py:36-37). The reference
evaluates one patch per forward on CPU; here samples run in jitted batches.

The per-sample loss is the channel-variance-scaled MSE of the model's
forward pass (vae.py:319 semantics, batch of 1 == per-sample mean).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def evaluate_recon_losses(model, params, state, dataset: np.ndarray,
                          n_samples: Optional[int] = 5000, seed: int = 123,
                          batch_size: int = 256) -> np.ndarray:
    """Per-sample reconstruction losses over a random subset.

    Args:
        model: a VQ-VAE family model (apply() returning (decoded, losses, _)).
        dataset: (N, C, H, W) float32 patches (already normalised).
        n_samples: subset size (None = all, no sampling).
        seed: RNG seed for the subset draw (reference uses 123).

    Returns:
        (n_samples,) array of per-sample recon losses.
    """
    import jax
    import jax.numpy as jnp

    if n_samples is not None and n_samples < len(dataset):
        rng = np.random.RandomState(seed)
        idx = rng.choice(np.arange(len(dataset)), (n_samples,), replace=False)
        dataset = dataset[idx]

    cv = jnp.asarray(model.channel_var, jnp.float32).reshape(1, -1, 1, 1)

    @jax.jit
    def batch_losses(params, state, x):
        decoded, _, _ = model.apply(params, state, x, train=False)
        err = (decoded - x) ** 2 / cv
        return jnp.mean(err, axis=(1, 2, 3))

    out = []
    n = len(dataset)
    for i in range(0, n, batch_size):
        batch = dataset[i: i + batch_size].astype(np.float32)
        n_b = len(batch)
        if n_b < batch_size:
            batch = np.concatenate(
                [batch, np.zeros((batch_size - n_b,) + batch.shape[1:],
                                 batch.dtype)], 0)
        losses = np.asarray(batch_losses(params, state, jnp.asarray(batch)))
        out.append(losses[:n_b])
    return np.concatenate(out)


def recon_loss_summary(losses: np.ndarray) -> Tuple[float, float]:
    """(mean, std) in the reference's reporting format."""
    return float(np.mean(losses)), float(np.std(losses))
