"""Shared model building blocks: residual stacks and loss terms.

Behavioral spec from the reference (cited per function); implementation is
TPU-native: NHWC activations, matmul-form pairwise distances (no (B,B,L)
broadcast materialisation), stop_gradient straight-through.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn import functional as F


# ---------------------------------------------------------------------------
# Residual block (reference HiddenStateExtractor/vae.py:167-212)
# Each layer: ReLU -> Conv3x3(nh->nrh) -> BN -> ReLU -> Conv1x1(nrh->nh) -> BN
# applied as x = x + layer(x).
# ---------------------------------------------------------------------------

def init_residual_block(key, num_hiddens, num_residual_hiddens, num_residual_layers):
    params, state = [], []
    for i in range(num_residual_layers):
        k1, k2, key = jax.random.split(key, 3)
        bn1_p, bn1_s = F.init_batch_norm(num_residual_hiddens)
        bn2_p, bn2_s = F.init_batch_norm(num_hiddens)
        params.append({
            "conv1": F.init_conv(k1, 3, 3, num_hiddens, num_residual_hiddens),
            "bn1": bn1_p,
            "conv2": F.init_conv(k2, 1, 1, num_residual_hiddens, num_hiddens),
            "bn2": bn2_p,
        })
        state.append({"bn1": bn1_s, "bn2": bn2_s})
    return params, state


def apply_residual_block(params, state, x, train: bool):
    new_state = []
    for p, s in zip(params, state):
        h = F.relu(x)
        h = F.conv2d(p["conv1"], h, stride=1, padding=1)
        h, bn1_s = F.batch_norm(p["bn1"], s["bn1"], h, train)
        h = F.relu(h)
        h = F.conv2d(p["conv2"], h, stride=1, padding=0)
        h, bn2_s = F.batch_norm(p["bn2"], s["bn2"], h, train)
        x = x + h
        new_state.append({"bn1": bn1_s, "bn2": bn2_s})
    return x, new_state


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------

def masked_recon_loss(decoded, inputs, batch_mask, channel_var, reduction="mean"):
    """Channel-variance-scaled masked MSE (reference vae.py:319, :439, :575).

    ``channel_var`` is (C,); activations are NHWC so it broadcasts on axis -1.
    """
    if batch_mask is None:
        batch_mask = jnp.ones_like(inputs)
    err = (decoded * batch_mask - inputs * batch_mask) ** 2 / channel_var
    return jnp.mean(err) if reduction == "mean" else jnp.sum(err)


def pairwise_sq_dist_mean(z_flat, precision=None):
    """(B, L) -> (B, B) matrix of mean_l (z_i - z_j)^2.

    Matmul form: (|z_i|^2 + |z_j|^2 - 2 z_i.z_j) / L — O(B^2 L) FLOPs on the
    MXU with O(B^2) memory, vs the reference's (B, B, L) broadcast tensor
    (vae.py:325-326).

    ``precision=None`` (DEFAULT, bf16 MXU operands) is a MEASURED accept:
    adjacent-pair distances err up to ~13% from the a^2+b^2-2ab
    cancellation, but the training signal is unharmed — loss value rel err
    4.6e-6, loss GRADIENT rel l2 err 2.2e-3 with min per-row cosine 0.9994
    vs exact f64 at the z32 production shapes, far below SGD/augmentation
    noise — while HIGH would add ~6% to the train step (BASELINE.md
    "Time-matching distance precision"). Pass lax.Precision.HIGH to
    tighten gradients 10x if a config ever warrants it.
    """
    l = z_flat.shape[1]
    sq = jnp.sum(z_flat * z_flat, axis=1)
    dots = jnp.dot(z_flat, z_flat.T, precision=precision,
                   preferred_element_type=jnp.float32)
    d = sq[:, None] + sq[None, :] - 2.0 * dots
    return jnp.maximum(d, 0.0) / l


def time_matching_loss(z_flat, time_matching_mat, w_a, w_t, w_n, margin):
    """Trajectory time-matching loss (reference vae.py:322-335).

    Relation codes: 2 = adjacent frames of same trajectory (weight w_a),
    1 = same trajectory (w_t), 0 = negative pair (w_n, with hinge margin:
    clamp(sim*w_n + margin, min=0)).
    """
    sim = pairwise_sq_dist_mean(z_flat)
    rel = time_matching_mat
    w = jnp.where(rel == 2, w_a, jnp.where(rel == 1, w_t, w_n))
    val = sim * w
    val = jnp.where(rel == 0, jnp.maximum(val + margin, 0.0), val)
    return jnp.mean(val)


def vq_losses(z, quantized, commitment_cost):
    """Straight-through estimator + commitment losses (reference vae.py:58-63).

    Returns (st_quantized, loss) where loss = q_latent + beta * e_latent.
    """
    sg = jax.lax.stop_gradient
    e_latent = jnp.mean((sg(quantized) - z) ** 2)
    q_latent = jnp.mean((quantized - sg(z)) ** 2)
    st = z + sg(quantized - z)
    return st, q_latent + commitment_cost * e_latent


def nchw_to_nhwc(x):
    return jnp.transpose(x, (0, 2, 3, 1))


def nhwc_to_nchw(x):
    return jnp.transpose(x, (0, 3, 1, 2))


def fused_preconv_stride_conv(p_conv0, p_conv1, x, stride=2, padding=1):
    """conv1(pad(conv0_1x1(x))) as ONE convolution, exactly.

    The z16-family encoders open with a 1x1 channel-lift conv immediately
    followed by a strided 4x4 conv with no activation between
    (reference vae.py:274-275). Sequential execution materialises a
    full-resolution lifted intermediate (the dominant HBM traffic of the
    whole encoder: 8.6 GB at batch 8192); since both ops are linear they
    compose into a single conv with kernel W01[k,l,i,o] = sum_c W0[i,c]
    W1[k,l,c,o].

    The 1x1 conv's bias does NOT fold into a constant: conv1's zero-padding
    is applied AFTER conv0 in the original, so border positions see fewer
    b0-carrying taps. The exact correction is conv(ones, K_b) with
    K_b[k,l,o] = sum_c W1[k,l,c,o] b0[c] — a compile-time constant per
    input shape (XLA folds it).

    Measured: 1.6x faster whole-encode at batch 8192 on v5e.
    """
    w0 = p_conv0["kernel"][0, 0]                    # (Cin, Cmid)
    w1 = p_conv1["kernel"]                           # (k, k, Cmid, Cout)
    w01 = jnp.einsum("ic,klco->klio", w0, w1)
    pad = ((padding, padding), (padding, padding))
    y = jax.lax.conv_general_dilated(
        x, w01, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + p_conv1["bias"]
    if "bias" in p_conv0:
        kb = jnp.einsum("klco,c->klo", w1, p_conv0["bias"])[:, :, None, :]
        ones = jnp.ones((1,) + x.shape[1:3] + (1,), x.dtype)
        corr = jax.lax.conv_general_dilated(
            ones, kb, (stride, stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + corr
    return y
