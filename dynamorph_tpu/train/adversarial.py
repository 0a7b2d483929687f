"""Adversarial (AAE) training loop.

Behavioral spec: reference run_training.py:630-769 — per batch: (1) optimise
encoder+decoder on the reconstruction/matching loss, (2) optimise the
discriminator on D-loss, (3) optimise the encoder on G-loss; separate Adam
optimisers per parameter group (lr_recon / lr_dis / lr_gen); per-epoch
``model_epoch%d`` checkpoints.

TPU-native: the three updates are fused into ONE jitted step (three
value_and_grad calls inside the same program — XLA shares the forward
subgraphs), with gradients masked per parameter group via optax.masked.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from . import data as data_utils
from .checkpoint import save_checkpoint
from .metrics import MetricsWriter
from .steps import augment_batch


def _group_mask(params, group: str):
    return {k: jax.tree_util.tree_map(lambda _: k == group, v)
            for k, v in params.items()}


def train_adversarial(model, dataset: np.ndarray, output_dir: str,
                      relation_mat=None, mask: Optional[np.ndarray] = None,
                      n_epochs: int = 10, lr_recon: float = 1e-3,
                      lr_dis: float = 1e-3, lr_gen: float = 1e-3,
                      batch_size: int = 16, shuffle_data: bool = False,
                      transform: bool = True, seed: Optional[int] = None,
                      params=None, state=None):
    """Train an AAEModel. Returns (params, state, history)."""
    os.makedirs(output_dir, exist_ok=True)
    rng = np.random.RandomState(seed if seed is not None else 0)
    key = jax.random.PRNGKey(seed if seed is not None else 0)

    if params is None:
        init_key, key = jax.random.split(key)
        params, state = jax.jit(model.init)(init_key)

    # three optimizers over the full tree with per-group masks
    mask_enc_dec = {k: jax.tree_util.tree_map(lambda _: k in ("enc", "dec"), v)
                    for k, v in params.items()}
    mask_enc = _group_mask(params, "enc")
    mask_disc = _group_mask(params, "enc_d")
    opt_recon = optax.masked(optax.adam(lr_recon), mask_enc_dec)
    opt_gen = optax.masked(optax.adam(lr_gen), mask_enc)
    opt_dis = optax.masked(optax.adam(lr_dis), mask_disc)
    opt_state = (opt_recon.init(params), opt_gen.init(params),
                 opt_dis.init(params))

    def recon_loss_fn(params, state, batch, rel, bmask):
        _, losses, new_state = model.apply(params, state, batch, train=True,
                                           time_matching_mat=rel,
                                           batch_mask=bmask)
        return losses["total_loss"], (losses, new_state)

    def d_loss_fn(params, state, batch, k):
        losses, new_state = model.adversarial_loss(params, state, batch, k,
                                                   train=True)
        return losses["descriminator_loss"], (losses, new_state)

    def g_loss_fn(params, state, batch, k):
        losses, _ = model.adversarial_loss(params, state, batch, k,
                                           train=True)
        return losses["generator_loss"], losses

    @jax.jit
    def step(params, state, opt_state, batch, rel, bmask, key):
        if rel is not None:
            rel = rel.astype(jnp.float32)
        if bmask is not None:
            bmask = bmask.astype(jnp.float32)
        os_recon, os_gen, os_dis = opt_state
        k_aug, k_d, k_g = jax.random.split(key, 3)
        if transform:
            batch, bmask = augment_batch(k_aug, batch, bmask)
        # 1) reconstruction update (enc + dec)
        (_, (losses, new_state)), grads = jax.value_and_grad(
            recon_loss_fn, has_aux=True)(params, state, batch, rel, bmask)
        updates, os_recon = opt_recon.update(grads, os_recon, params)
        params = optax.apply_updates(params, updates)
        # 2) discriminator update
        (_, (adv_losses, new_state2)), grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(params, new_state, batch, k_d)
        updates, os_dis = opt_dis.update(grads, os_dis, params)
        params = optax.apply_updates(params, updates)
        # 3) generator (encoder) update
        (_, _), grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(params, new_state2, batch, k_g)
        updates, os_gen = opt_gen.update(grads, os_gen, params)
        params = optax.apply_updates(params, updates)
        all_losses = {**losses, **adv_losses}
        return params, new_state2, (os_recon, os_gen, os_dis), all_losses

    writer = MetricsWriter(output_dir)
    n = len(dataset)
    sample_ids = np.arange(n)
    if shuffle_data:
        rng.shuffle(sample_ids)
    n_batches = int(np.ceil(n / batch_size))
    history = []
    for epoch in range(n_epochs):
        totals = None  # on-device running sums; one host fetch per epoch
        for i in range(n_batches):
            bids = sample_ids[i * batch_size: (i + 1) * batch_size]
            batch = jnp.asarray(dataset[bids])
            rel = data_utils.slice_relation_mat(relation_mat, bids)
            rel = jnp.asarray(rel) if rel is not None else None
            bmask = data_utils.slice_mask(mask, bids)
            bmask = jnp.asarray(bmask) if bmask is not None else None
            step_key = jax.random.fold_in(jax.random.fold_in(key, epoch), i)
            params, state, opt_state, losses = step(
                params, state, opt_state, batch, rel, bmask, step_key)
            totals = losses if totals is None else jax.tree_util.tree_map(
                jnp.add, totals, losses)
        if shuffle_data:
            rng.shuffle(sample_ids)
        mean_loss = {k: float(v) / n_batches
                     for k, v in jax.device_get(totals).items()}
        writer.write("Loss", mean_loss, epoch)
        history.append({"epoch": epoch, **mean_loss})
        # per-epoch checkpoint (reference run_training.py:767)
        save_checkpoint(os.path.join(output_dir, f"model_epoch{epoch}"),
                        {"params": params, "state": state})
    writer.close()
    return params, state, history
