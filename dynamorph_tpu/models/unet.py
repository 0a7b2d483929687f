"""ResNet34-encoder U-Net for 3-class semantic segmentation, TPU-native.

Behavioral spec: reference NNsegmentation/models.py:32-203 — a 1x1 pre-conv
(C -> 3) feeding segmentation_models.Unet(resnet34) with linear (logit)
output, decoder_filters (256, 128, 64, 32, 16) and batch-normed upsampling
decoder blocks. The reference runs on Keras/TF (channels-first); this is a
from-scratch functional JAX implementation, NHWC, jit-able end to end, with
the weighted per-pixel cross-entropy of NNsegmentation/layers.py:89-115.

ImageNet encoder pre-training is not bundled (no network access at build
time); `init` takes `key` and returns randomly-initialised params.
torchvision-format resnet34 weights are imported via
``models.torch_import.import_resnet34_encoder`` (or pass
``encoder_weights=`` to ``seg.model.Segment``), matching the reference's
``Unet('resnet34', encoder_weights='imagenet')``.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..nn import functional as F
from .common import nchw_to_nhwc, nhwc_to_nchw

# ResNet34 stage spec: (n_blocks, channels)
_STAGES = ((3, 64), (4, 128), (6, 256), (3, 512))


def _init_basic_block(key, in_ch, out_ch, stride):
    k1, k2, k3 = jax.random.split(key, 3)
    bn1p, bn1s = F.init_batch_norm(out_ch)
    bn2p, bn2s = F.init_batch_norm(out_ch)
    p = {
        "conv1": F.init_conv(k1, 3, 3, in_ch, out_ch, use_bias=False),
        "bn1": bn1p,
        "conv2": F.init_conv(k2, 3, 3, out_ch, out_ch, use_bias=False),
        "bn2": bn2p,
    }
    s = {"bn1": bn1s, "bn2": bn2s}
    if stride != 1 or in_ch != out_ch:
        dbn_p, dbn_s = F.init_batch_norm(out_ch)
        p["down"] = F.init_conv(k3, 1, 1, in_ch, out_ch, use_bias=False)
        p["down_bn"] = dbn_p
        s["down_bn"] = dbn_s
    return p, s


def _apply_basic_block(p, s, x, stride, train):
    ns = {}
    h = F.conv2d(p["conv1"], x, stride, 1)
    h, ns["bn1"] = F.batch_norm(p["bn1"], s["bn1"], h, train)
    h = F.relu(h)
    h = F.conv2d(p["conv2"], h, 1, 1)
    h, ns["bn2"] = F.batch_norm(p["bn2"], s["bn2"], h, train)
    if "down" in p:
        sc = F.conv2d(p["down"], x, stride, 0)
        sc, ns["down_bn"] = F.batch_norm(p["down_bn"], s["down_bn"], sc, train)
    else:
        sc = x
    return F.relu(h + sc), ns


def _max_pool_3x3_s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))


def _upsample2x(x):
    n, h, w, c = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


@dataclasses.dataclass(frozen=True)
class UNet:
    """pre_conv(1x1, C->3) + ResNet34 encoder + upsampling decoder -> logits.

    apply() takes (B, C, H, W) in [0, 1] and returns (B, n_classes, H, W)
    logits (linear activation, reference models.py:83).
    """
    n_channels: int = 2
    n_classes: int = 3
    decoder_filters: Tuple[int, ...] = (256, 128, 64, 32, 16)

    def init(self, key):
        keys = jax.random.split(key, 64)
        ki = iter(keys)
        params = {"pre_conv": F.init_conv(next(ki), 1, 1, self.n_channels, 3)}
        state = {}
        # stem
        bn_p, bn_s = F.init_batch_norm(64)
        params["stem"] = {"conv": F.init_conv(next(ki), 7, 7, 3, 64,
                                              use_bias=False), "bn": bn_p}
        state["stem"] = {"bn": bn_s}
        # encoder stages
        in_ch = 64
        for si, (n_blocks, ch) in enumerate(_STAGES):
            blocks_p, blocks_s = [], []
            for b in range(n_blocks):
                stride = 2 if (b == 0 and si > 0) else 1
                bp, bs = _init_basic_block(next(ki), in_ch, ch, stride)
                blocks_p.append(bp)
                blocks_s.append(bs)
                in_ch = ch
            params[f"layer{si + 1}"] = blocks_p
            state[f"layer{si + 1}"] = blocks_s
        # decoder blocks: skip channels for resnet34-unet
        skip_ch = [256, 128, 64, 64, 0]
        in_ch = 512
        dec_p, dec_s = [], []
        for f, sc in zip(self.decoder_filters, skip_ch):
            k1, k2 = jax.random.split(next(ki))
            bn1p, bn1s = F.init_batch_norm(f)
            bn2p, bn2s = F.init_batch_norm(f)
            dec_p.append({
                "conv1": F.init_conv(k1, 3, 3, in_ch + sc, f, use_bias=False),
                "bn1": bn1p,
                "conv2": F.init_conv(k2, 3, 3, f, f, use_bias=False),
                "bn2": bn2p,
            })
            dec_s.append({"bn1": bn1s, "bn2": bn2s})
            in_ch = f
        params["decoder"] = dec_p
        state["decoder"] = dec_s
        params["head"] = F.init_conv(next(ki), 3, 3, self.decoder_filters[-1],
                                     self.n_classes)
        return params, state

    def _encode(self, params, state, x, train):
        ns = {"stem": {}}
        h = F.conv2d(params["pre_conv"], x, 1, 0)
        h = F.conv2d(params["stem"]["conv"], h, 2, 3)
        h, ns["stem"]["bn"] = F.batch_norm(params["stem"]["bn"],
                                           state["stem"]["bn"], h, train)
        skip0 = h = F.relu(h)                       # stride 2, 64ch
        h = _max_pool_3x3_s2(h)
        skips = [skip0]
        for si, (n_blocks, ch) in enumerate(_STAGES):
            layer_ns = []
            for b in range(n_blocks):
                stride = 2 if (b == 0 and si > 0) else 1
                h, bns = _apply_basic_block(
                    params[f"layer{si + 1}"][b], state[f"layer{si + 1}"][b],
                    h, stride, train)
                layer_ns.append(bns)
            ns[f"layer{si + 1}"] = layer_ns
            if si < 3:
                skips.append(h)                     # strides 4, 8, 16
        # skips: [s2(64), s4(64), s8(128), s16(256)]; bottleneck h: s32(512)
        return h, skips, ns

    def apply(self, params, state, inputs, train: bool = False):
        """(B, C, H, W) -> (B, n_classes, H, W) logits, new_state."""
        x = nchw_to_nhwc(inputs)
        h, skips, ns = self._encode(params, state, x, train)
        skip_order = [skips[3], skips[2], skips[1], skips[0], None]
        dec_ns = []
        for p, s, skip in zip(params["decoder"], state["decoder"], skip_order):
            h = _upsample2x(h)
            if skip is not None:
                h = jnp.concatenate([h, skip], axis=-1)
            bns = {}
            h = F.conv2d(p["conv1"], h, 1, 1)
            h, bns["bn1"] = F.batch_norm(p["bn1"], s["bn1"], h, train)
            h = F.relu(h)
            h = F.conv2d(p["conv2"], h, 1, 1)
            h, bns["bn2"] = F.batch_norm(p["bn2"], s["bn2"], h, train)
            h = F.relu(h)
            dec_ns.append(bns)
        ns["decoder"] = dec_ns
        logits = F.conv2d(params["head"], h, 1, 1)
        return nhwc_to_nchw(logits), ns

    def predict(self, params, state, inputs):
        """Softmax probabilities with the z dim re-added:
        (B, C, H, W) -> (B, n_classes, 1, H, W)
        (reference models.py:159-182)."""
        logits, _ = self.apply(params, state, inputs, train=False)
        probs = jax.nn.softmax(logits, axis=1)
        return probs[:, :, None]


def weighted_ce_loss(logits, labels_with_weight):
    """Weighted per-pixel softmax cross-entropy on logits.

    labels_with_weight: (B, n_classes + 1, H, W) — first n_classes slices are
    (possibly soft) labels, last slice is the per-pixel weight
    (reference NNsegmentation/layers.py:89-115). Per-batch mean of the
    weighted per-pixel CE (keras reduces loss maps by mean).
    """
    w = labels_with_weight[:, -1]
    y = labels_with_weight[:, :-1]
    logp = jax.nn.log_softmax(logits, axis=1)
    ce = -jnp.sum(y * logp, axis=1)                 # (B, H, W)
    return jnp.mean(ce * w)
