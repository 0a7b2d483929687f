"""Functional NN layers, NHWC, with torch-exact geometry.

Design: parameters are plain pytrees (nested dicts of jnp arrays); every layer
is a pure function ``apply(params, x, ...)``. This keeps the whole model a
single traced XLA program (no framework state), makes sharding annotations
trivial, and makes weight import from the reference's PyTorch ``state_dict``
a mechanical transpose.

Geometry parity targets (verified by tests/test_nn_parity.py against
torch CPU):
- ``conv2d``            == torch.nn.Conv2d(stride, padding)
- ``conv_transpose2d``  == torch.nn.ConvTranspose2d(stride, padding)
  (reference decoders use k=4, s=2, p=1 — HiddenStateExtractor/vae.py:288-295)
- ``batch_norm``        == torch.nn.BatchNorm2d (eps=1e-5, momentum=0.1,
  biased batch var for normalisation, unbiased var into running stats)

Layouts: activations NHWC (TPU-native); conv kernels HWIO; conv-transpose
kernels stored HWOI-as-forward (see below); linear weights (in, out).
"""
from __future__ import annotations

import math
import jax
import jax.numpy as jnp
import numpy as np

# NHWC everywhere: TPU convolutions want channels-last.
_DIMS = ("NHWC", "HWIO", "NHWC")


def relu(x):
    return jnp.maximum(x, 0)


def sigmoid(x):
    return jax.nn.sigmoid(x)


# ---------------------------------------------------------------------------
# Initialisers (torch-default distributions, so random-init models behave like
# the reference's; exact parity uses models/torch_import.py instead).
# ---------------------------------------------------------------------------

def _kaiming_uniform_bound(fan_in: int, a: float = math.sqrt(5.0)) -> float:
    gain = math.sqrt(2.0 / (1.0 + a * a))
    return gain * math.sqrt(3.0 / fan_in)


def init_conv(key, kh: int, kw: int, in_ch: int, out_ch: int, dtype=jnp.float32,
              use_bias: bool = True):
    """Conv params: kernel (kh, kw, in, out) + optional bias (out,)."""
    k1, k2 = jax.random.split(key)
    fan_in = in_ch * kh * kw
    wb = _kaiming_uniform_bound(fan_in)
    bb = 1.0 / math.sqrt(fan_in)
    p = {"kernel": jax.random.uniform(k1, (kh, kw, in_ch, out_ch), dtype, -wb, wb)}
    if use_bias:
        p["bias"] = jax.random.uniform(k2, (out_ch,), dtype, -bb, bb)
    return p


def init_conv_transpose(key, kh: int, kw: int, in_ch: int, out_ch: int, dtype=jnp.float32):
    """ConvTranspose params: kernel (kh, kw, in, out) + bias (out,).

    Note torch's fan-in for ConvTranspose2d init is out_ch * kh * kw
    (weight shape (in, out, kh, kw), fan_in = size(1)*k*k).
    """
    k1, k2 = jax.random.split(key)
    fan_in = out_ch * kh * kw
    wb = _kaiming_uniform_bound(fan_in)
    bb = 1.0 / math.sqrt(fan_in)
    return {
        "kernel": jax.random.uniform(k1, (kh, kw, in_ch, out_ch), dtype, -wb, wb),
        "bias": jax.random.uniform(k2, (out_ch,), dtype, -bb, bb),
    }


def init_batch_norm(num_features: int, dtype=jnp.float32):
    """Returns (params, state): scale/offset trainable; running stats as state."""
    params = {
        "scale": jnp.ones((num_features,), dtype),
        "offset": jnp.zeros((num_features,), dtype),
    }
    state = {
        "mean": jnp.zeros((num_features,), dtype),
        "var": jnp.ones((num_features,), dtype),
    }
    return params, state


def init_linear(key, in_dim: int, out_dim: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    wb = _kaiming_uniform_bound(in_dim)
    bb = 1.0 / math.sqrt(in_dim)
    return {
        "weight": jax.random.uniform(k1, (in_dim, out_dim), dtype, -wb, wb),
        "bias": jax.random.uniform(k2, (out_dim,), dtype, -bb, bb),
    }


# ---------------------------------------------------------------------------
# Layer applications
# ---------------------------------------------------------------------------

def conv2d(params, x, stride: int = 1, padding=0):
    """2-D convolution, NHWC; matches torch.nn.Conv2d(stride, padding).

    ``padding`` is a symmetric int or a per-axis (pad_h, pad_w) pair (torch
    accepts the same tuple form — needed for 1x7/7x1 kernels)."""
    ph, pw = padding if isinstance(padding, tuple) else (padding, padding)
    y = jax.lax.conv_general_dilated(
        x,
        params["kernel"],
        window_strides=(stride, stride),
        padding=((ph, ph), (pw, pw)),
        dimension_numbers=_DIMS,
    )
    if "bias" in params:
        y = y + params["bias"]
    return y


def conv_transpose2d(params, x, stride: int = 2, padding: int = 1):
    """2-D transposed convolution matching torch.nn.ConvTranspose2d.

    Implemented as an input-dilated convolution with a spatially-flipped
    kernel: output = conv(dilate(x, stride), flip(W)), pad = k - 1 - padding.
    This is the exact adjoint of ``conv2d`` with the same (stride, padding)
    and reproduces torch geometry: out = (in-1)*stride - 2*padding + k.
    """
    w = params["kernel"]  # (kh, kw, in, out)
    kh, kw = w.shape[0], w.shape[1]
    w = jnp.flip(w, axis=(0, 1))
    ph, pw = kh - 1 - padding, kw - 1 - padding
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding=((ph, ph), (pw, pw)),
        lhs_dilation=(stride, stride),
        dimension_numbers=_DIMS,
    )
    return y + params["bias"]


def batch_norm(params, state, x, train: bool, momentum: float = 0.1, eps: float = 1e-5):
    """BatchNorm over NHWC axis -1, torch semantics.

    Returns (y, new_state). In train mode, normalises with biased batch
    statistics and folds the *unbiased* variance into the running stats with
    torch's momentum convention: running = (1-m)*running + m*batch.
    """
    if train:
        # one-pass batch statistics: E[d] and E[d^2] reduce in a single
        # fused traversal (vs jnp.var's dependent second pass — measured
        # 1.3x on the z32 encoder's largest activation, diff ~1e-6).
        # Shifting by the running mean (a constant w.r.t. this batch, so
        # still one traversal) keeps the E[d^2]-E[d]^2 subtraction free of
        # catastrophic cancellation even if an activation distribution
        # drifts to |mean| >> std: the running mean tracks the batch mean,
        # so d is near-centered and both terms stay O(var).
        c = jax.lax.stop_gradient(state["mean"])
        d = x - c
        dmean = jnp.mean(d, axis=(0, 1, 2))
        mean = c + dmean
        var = jnp.maximum(
            jnp.mean(d * d, axis=(0, 1, 2)) - dmean * dmean, 0.0)
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean) * (inv * params["scale"]) + params["offset"]
    return y, new_state


def linear(params, x):
    y = jnp.dot(x, params["weight"])
    if "bias" in params:
        y = y + params["bias"]
    return y


def init_linear_no_bias(key, in_dim: int, out_dim: int, dtype=jnp.float32):
    wb = _kaiming_uniform_bound(in_dim)
    return {"weight": jax.random.uniform(key, (in_dim, out_dim), dtype, -wb, wb)}


def batch_norm1d(params, state, x, train: bool, momentum: float = 0.1,
                 eps: float = 1e-5):
    """BatchNorm over (B, C) features, torch BatchNorm1d semantics.

    ``params`` may omit "offset" (reference BatchNorm1dNoBias,
    HiddenStateExtractor/resnet.py:65-68 — bias frozen at zero)."""
    if train:
        # two-pass jnp.var here (unlike batch_norm): projection-head
        # features are not bounded like conv activations, so the one-pass
        # E[x^2]-E[x]^2 cancellation is not safe; this path is not hot
        mean = jnp.mean(x, axis=0)
        var = jnp.var(x, axis=0)
        n = x.shape[0]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var + eps)
    y = (x - mean) * (inv * params["scale"])
    if "offset" in params:
        y = y + params["offset"]
    return y, new_state


# ---------------------------------------------------------------------------
# torch state_dict conversion helpers
# ---------------------------------------------------------------------------

def conv_kernel_from_torch(w: np.ndarray) -> np.ndarray:
    """torch Conv2d weight (O, I, kH, kW) -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def conv_transpose_kernel_from_torch(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight (I, O, kH, kW) -> (kH, kW, I, O)."""
    return np.transpose(w, (2, 3, 0, 1))


def linear_weight_from_torch(w: np.ndarray) -> np.ndarray:
    """torch Linear weight (out, in) -> (in, out)."""
    return np.transpose(w, (1, 0))
