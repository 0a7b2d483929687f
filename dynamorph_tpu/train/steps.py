"""Jitted, mesh-sharded train/eval steps.

The reference trains on a single GPU with a hand-rolled batch loop
(reference run_training.py:455-551). TPU-native replacement: one jitted step,
batch sharded over the mesh's ``data`` axis with parameters replicated; XLA
inserts the gradient all-reduce (psum) and the cross-device BatchNorm
statistics automatically from the sharding annotations (jit/pjit global-view
semantics — equivalent math to single-device large-batch training).

On-device augmentation (random flip + rot90, reference run_training.py:
396-403) runs inside the step via lax.switch — no host round trip.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _dihedral(x, flip_idx, rot_idx):
    """flip in {0: none, 1: H, 2: W} then rot90 k times on one (C, H, W)
    patch — the reference's exact per-image transform and draw space
    (run_training.py:396-403: np.random.choice([0,1,2]) flip dim, then
    choice([0,1,2,3]) rotations)."""
    x = jax.lax.switch(flip_idx, [
        lambda v: v,
        lambda v: jnp.flip(v, axis=1),
        lambda v: jnp.flip(v, axis=2),
    ], x)
    return jax.lax.switch(rot_idx, [
        lambda v: v,
        lambda v: jnp.rot90(v, 1, axes=(1, 2)),
        lambda v: jnp.rot90(v, 2, axes=(1, 2)),
        lambda v: jnp.rot90(v, 3, axes=(1, 2)),
    ], x)


def augment_batch(key, batch, mask=None):
    """Random PER-IMAGE flip + k*90-degree rotation of NCHW patches
    (reference run_one_batch, run_training.py:396-403). Under vmap the
    per-sample switches lower to compute-all-branches + select —
    elementwise traffic only, no host loop.

    CONSCIOUS deviation: the recon mask transforms WITH its image. The
    reference augments only the batch and leaves batch_mask untouched
    (run_training.py:396-417), silently mis-aligning the masked recon loss
    for every flipped/rotated patch.
    """
    k1, k2 = jax.random.split(key)
    n = batch.shape[0]
    flips = jax.random.randint(k1, (n,), 0, 3)
    rots = jax.random.randint(k2, (n,), 0, 4)
    batch = jax.vmap(_dihedral)(batch, flips, rots)
    if mask is not None:
        mask = jax.vmap(_dihedral)(mask, flips, rots)
    return batch, mask


def make_train_step(model, optimizer: optax.GradientTransformation,
                    mesh: Optional[Mesh] = None, augment: bool = True,
                    needs_key: bool = False):
    """Build a jitted train step for a model with ``apply(params, state, x,
    train, time_matching_mat, batch_mask)`` -> (decoded, losses, new_state).

    If ``mesh`` is given, inputs are constrained: batch/mask sharded over
    'data', params/opt_state replicated.
    """

    def loss_fn(params, state, batch, rel, mask, key):
        kwargs = dict(train=True, time_matching_mat=rel, batch_mask=mask)
        if needs_key:
            _, losses, new_state = model.apply(params, state, batch, key, **kwargs)
        else:
            _, losses, new_state = model.apply(params, state, batch, **kwargs)
        return losses["total_loss"], (losses, new_state)

    def step(params, state, opt_state, batch, rel, mask, key):
        # relation blocks / masks arrive as uint8 (4x less host->device
        # traffic); compute in float32. The mask stays uint8 THROUGH the
        # augmentation (flips/rot90 shuffle 4x fewer bytes) and casts after.
        if rel is not None:
            rel = rel.astype(jnp.float32)
        if mesh is not None:
            data_sh = NamedSharding(mesh, P("data"))
            rep = NamedSharding(mesh, P())
            batch = jax.lax.with_sharding_constraint(batch, data_sh)
            if mask is not None:
                mask = jax.lax.with_sharding_constraint(mask, data_sh)
            params = jax.lax.with_sharding_constraint(params, rep)
        if augment:
            k_aug, key = jax.random.split(key)
            batch, mask = augment_batch(k_aug, batch, mask)
        if mask is not None:
            mask = mask.astype(jnp.float32)
        (_, (losses, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, state, batch, rel, mask, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, losses

    return jax.jit(step)


def make_triplet_steps(model, optimizer: optax.GradientTransformation,
                       mesh: Optional[Mesh] = None):
    """Jitted train/eval steps for the triplet (ResNet/SimCLR) path — the
    reference `train_with_loader` inner loop (reference run_training.py:
    554-627) as one fused forward+miner+backward+Adam program.

    With ``mesh``, batches and labels are sharded over 'data' and params
    replicated; the miner's (B, B) pairwise-distance matrix needs every
    embedding, so XLA all-gathers the (B, 128) projections — tiny next to
    the conv trunk — and psums the gradients (tested sharded == single,
    tests/test_multidevice.py).

    Returns ``(train_step, eval_step)``.
    """

    def loss_fn(params, state, batch, labels):
        _, losses, new_state = model.apply(params, state, batch,
                                           labels=labels, train=True)
        return losses["total_loss"], (losses, new_state)

    def step(params, state, opt_state, batch, labels):
        if mesh is not None:
            data_sh = NamedSharding(mesh, P("data"))
            batch = jax.lax.with_sharding_constraint(batch, data_sh)
            labels = jax.lax.with_sharding_constraint(labels, data_sh)
            params = jax.lax.with_sharding_constraint(
                params, NamedSharding(mesh, P()))
        (_, (losses, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, state, batch, labels)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state, opt_state, losses

    def eval_step(params, state, batch, labels):
        if mesh is not None:
            batch = jax.lax.with_sharding_constraint(
                batch, NamedSharding(mesh, P("data")))
        _, losses, _ = model.apply(params, state, batch, labels=labels,
                                   train=False)
        return losses

    return jax.jit(step), jax.jit(eval_step)


def make_eval_step(model, mesh: Optional[Mesh] = None, needs_key: bool = False):
    def step(params, state, batch, rel, mask, key):
        if rel is not None:
            rel = rel.astype(jnp.float32)
        if mask is not None:
            mask = mask.astype(jnp.float32)
        if mesh is not None:
            data_sh = NamedSharding(mesh, P("data"))
            batch = jax.lax.with_sharding_constraint(batch, data_sh)
        kwargs = dict(train=False, time_matching_mat=rel, batch_mask=mask)
        if needs_key:
            _, losses, _ = model.apply(params, state, batch, key, **kwargs)
        else:
            _, losses, _ = model.apply(params, state, batch, **kwargs)
        return losses

    return jax.jit(step)
