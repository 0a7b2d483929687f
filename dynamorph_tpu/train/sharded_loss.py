"""Trajectory-contiguous sharded time-matching loss (SURVEY.md §7 hard part).

The reference's time-matching loss is a dense (B, B) pairwise-latent-distance
matrix over the minibatch (reference HiddenStateExtractor/vae.py:322-336,
used by run_training.py:97-159 with trajectory-contiguous batches). Under
batch sharding over a device mesh, computing that matrix naively makes XLA
all-gather every device's z_flat shard — (B, L) traffic with L = 32*32*64 at
the z32 production config.

TPU-native replacement: assign WHOLE trajectories to device shards, so the
relation matrix is block-diagonal w.r.t. the shard partition. Then

- the diagonal (b, b) blocks carry the full relation semantics
  (w_a / w_t / w_n + hinge) and are computed locally;
- every cross-shard pair is a negative (relation 0), whose contribution
  max(w_n * sim + margin, 0) needs only pairwise distances — these are
  computed by a RING pass: each device's z shard rotates around the mesh
  via ppermute, n-1 steps, each step one (b, b) block of distances against
  the resident shard. Peak extra memory = one z shard; no (B, L) all-gather
  is ever materialised, and XLA overlaps the permute with the block matmul.

The result is numerically EQUAL to the dense loss whenever no trajectory
straddles a shard boundary (tested); a straddling trajectory's cross-shard
pairs degrade to negatives — the same class of approximation the reference
itself accepts at minibatch boundaries. Use `pack_trajectories` to build
shard-aligned batch orderings.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def cross_sq_dist_mean(a, b, precision=None):
    """(m, L), (k, L) -> (m, k) of mean_l (a_i - b_j)^2, matmul form.

    DEFAULT matmul precision, same measured accept as
    models.common.pairwise_sq_dist_mean (loss grads err 2.2e-3 vs exact,
    below training noise; HIGH would cost ~6% of the step)."""
    l = a.shape[1]
    sa = jnp.sum(a * a, axis=1)
    sb = jnp.sum(b * b, axis=1)
    dots = jnp.dot(a, b.T, precision=precision,
                   preferred_element_type=jnp.float32)
    d = sa[:, None] + sb[None, :] - 2.0 * dots
    return jnp.maximum(d, 0.0) / l


def make_traj_sharded_tm_loss(mesh: Mesh, axis_name: str = "data"):
    """Build a time-matching loss fn with the dense-loss signature
    ``(z_flat, rel, w_a, w_t, w_n, margin) -> scalar`` where ``rel`` is the
    BLOCK-DIAGONAL relation representation: shape (B, B/n), row-shard i
    holding its own (b, b) diagonal block (see ``blockdiag_relations``).

    Drop-in for ``common.time_matching_loss`` via the models' ``tm_loss_fn``
    field.
    """
    n = mesh.shape[axis_name]
    perm = [(j, (j + 1) % n) for j in range(n)]

    def loss(z_flat, rel_block, w_a, w_t, w_n, margin):
        b_total = z_flat.shape[0]

        def kernel(z, rel):
            # z: (b, L) local shard; rel: (b, b) local diagonal block
            sim = cross_sq_dist_mean(z, z)
            w = jnp.where(rel == 2, w_a, jnp.where(rel == 1, w_t, w_n))
            val = sim * w
            val = jnp.where(rel == 0, jnp.maximum(val + margin, 0.0), val)
            total = jnp.sum(val)
            # ring pass: all cross-shard pairs are negatives
            z_rot = z
            for _ in range(n - 1):
                z_rot = jax.lax.ppermute(z_rot, axis_name, perm)
                sim_x = cross_sq_dist_mean(z, z_rot)
                total = total + jnp.sum(
                    jnp.maximum(sim_x * w_n + margin, 0.0))
            total = jax.lax.psum(total, axis_name)
            return total / (b_total * b_total)

        return jax.shard_map(
            kernel, mesh=mesh,
            in_specs=(P(axis_name, None), P(axis_name, None)),
            out_specs=P())(z_flat, rel_block)

    return loss


def trajectory_ids_from_relations(relation_mat, n: int) -> np.ndarray:
    """Per-sample trajectory id from a (sparse or dense) relation matrix:
    connected components over relation >= 1 (same trajectory)."""
    from scipy.sparse import csr_matrix
    from scipy.sparse.csgraph import connected_components

    if relation_mat is None:
        return np.arange(n)
    mat = csr_matrix(relation_mat)
    mat.data = (mat.data >= 1).astype(np.int8)
    _, labels = connected_components(mat, directed=False)
    return labels


def pack_trajectories(bids: Sequence[int], traj_ids: np.ndarray,
                      n_shards: int) -> np.ndarray:
    """Permute a batch's sample ids so whole trajectories land in single
    shard chunks (first-fit-decreasing bin packing into n equal chunks).

    Returns the permuted bids (length preserved; every shard chunk is
    exactly len(bids)/n_shards samples). Trajectories larger than a chunk —
    or not placeable without splitting — are split greedily; their
    cross-shard pairs degrade to negatives in the blocked loss.
    """
    bids = np.asarray(bids)
    b = len(bids)
    assert b % n_shards == 0, "batch must divide the mesh"
    cap = b // n_shards
    groups: dict = {}
    for pos, sid in enumerate(bids):
        groups.setdefault(traj_ids[sid], []).append(pos)
    order = sorted(groups.values(), key=len, reverse=True)
    bins = [[] for _ in range(n_shards)]
    spill = []
    for g in order:
        placed = False
        for bin_ in bins:
            if len(bin_) + len(g) <= cap:
                bin_.extend(g)
                placed = True
                break
        if not placed:
            spill.extend(g)
    for item in spill:  # fill remaining capacity greedily
        for bin_ in bins:
            if len(bin_) < cap:
                bin_.append(item)
                break
    out = np.concatenate([bids[bin_] for bin_ in bins])
    assert len(out) == b
    return out


def blockdiag_relations(relation_mat, bids, n_shards: int) -> np.ndarray:
    """Slice the per-shard diagonal relation blocks for a (packed) batch.

    Returns (B, B/n) uint8 where rows [k*b:(k+1)*b] hold shard k's (b, b)
    diagonal block — the layout jax.shard_map expects for an array sharded
    P('data', None). Host->device traffic is B*B/n bytes vs B*B for the
    dense matrix (n x less on top of the uint8 4x).
    """
    bids = np.asarray(bids)
    b = len(bids) // n_shards
    blocks = []
    for k in range(n_shards):
        ids = bids[k * b:(k + 1) * b]
        block = relation_mat[ids][:, ids]
        if hasattr(block, "todense"):
            block = block.todense()
        blocks.append(np.asarray(block))
    return np.concatenate(blocks, axis=0).astype(np.uint8)
