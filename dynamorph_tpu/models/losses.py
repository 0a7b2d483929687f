"""Triplet mining losses.

Behavioral spec: reference HiddenStateExtractor/losses.py —
AllTripletMiner :74-161 (all valid triplets, mean over positive triplets,
fraction-positive metric) and HardNegativeTripletMiner :164-263.
Pure-jnp, fully jit-able (masks instead of boolean indexing).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from jax import lax


def pairwise_dist(embeddings: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean pairwise distances, clamped at 0
    (reference losses.py:29-50).

    HIGHEST-precision matmul: the (B, 128) embedding product is tiny, and
    bf16 operand rounding on the MXU would perturb margin/hinge decisions
    vs the exact-f32 torch reference the miners are parity-tested against.
    """
    dot = jnp.dot(embeddings, embeddings.T,
                  precision=lax.Precision.HIGHEST,
                  preferred_element_type=jnp.float32)
    sq = jnp.diag(dot)
    d = sq[None, :] - 2.0 * dot + sq[:, None]
    return jnp.maximum(d, 0.0)


def _triplet_mask(ids: jnp.ndarray) -> jnp.ndarray:
    """(B, B, B) mask of valid (anchor, positive, negative) index triplets
    (reference losses.py:94-121)."""
    n = ids.shape[0]
    eye = jnp.eye(n, dtype=bool)
    not_eq = ~eye
    distinct = (not_eq[:, :, None] & not_eq[:, None, :] & not_eq[None, :, :])
    ids_eq = ids[None, :] == ids[:, None]
    valid = ids_eq[:, :, None] & ~ids_eq[:, None, :]
    return distinct & valid


@dataclasses.dataclass(frozen=True)
class AllTripletMiner:
    """Loss over all valid triplets (reference losses.py:74-161).

    Returns (loss, fraction_positive_triplets)."""
    margin: float = 0.5

    def __call__(self, ids, embeddings):
        d = pairwise_dist(embeddings)
        pos = d[:, :, None]
        neg = d[:, None, :]
        mask = _triplet_mask(ids).astype(jnp.float32)
        loss = (pos - neg + self.margin) * mask
        loss = jnp.maximum(loss, 0.0)
        n_pos = jnp.sum((loss > 1e-16).astype(jnp.float32))
        n_val = jnp.sum(mask)
        f_pos = n_pos / (n_val + 1e-16)
        loss = jnp.sum(loss) / (n_pos + 1e-16)
        return loss, f_pos


@dataclasses.dataclass(frozen=True)
class HardNegativeTripletMiner:
    """Hardest-positive vs mean-negative triplet loss
    (reference losses.py:164-263). Returns (loss, None)."""
    margin: float = 0.5

    def __call__(self, ids, embeddings):
        d = pairwise_dist(embeddings)
        n = ids.shape[0]
        eye = jnp.eye(n, dtype=bool)
        mask_anc_pos = (~eye) & (ids[None, :] == ids[:, None])
        pos_dist = jnp.max(mask_anc_pos.astype(jnp.float32) * d,
                           axis=1, keepdims=True)
        mask_anc_neg = ids[None, :] != ids[:, None]
        max_d = jnp.max(d, axis=1, keepdims=True)
        neg = d + max_d * (1.0 - mask_anc_neg.astype(jnp.float32))
        neg_dist = jnp.mean(neg, axis=1)
        # (B, 1) - (B,) broadcasts to (B, B), as in the reference (:263)
        loss = jnp.maximum(pos_dist - neg_dist + self.margin, 0.0)
        return jnp.mean(loss), None
