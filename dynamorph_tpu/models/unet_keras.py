"""Keras-architecture U-Net: the exact graph of the reference's saved models.

The reference builds ``pre_conv(1x1, C->3)`` feeding
``segmentation_models.Unet('resnet34', decoder_block_type='upsampling',
decoder_filters=(256,128,64,32,16), decoder_use_batchnorm=True)`` with
channels-first Keras (reference NNsegmentation/models.py:73-96, pinned to
``segmentation_models==1.0.1`` in requirements/default.txt). That encoder is
qubvel's classification_models ResNet34 — structurally DIFFERENT from
torchvision's resnet34 that ``models.unet.UNet`` mirrors:

- an input ``bn_data`` BatchNorm (no gamma) before the stem;
- PRE-activation residual units (BN -> ReLU -> conv -> BN -> ReLU -> conv,
  add), with the first unit of every stage using a 'post' cut: the 1x1
  shortcut conv consumes the BN-ReLU'd tensor, not the raw input;
- a trailing ``bn1`` + ReLU after stage 4;
- encoder skip features taken from ``stage{2,3,4}_unit1_relu1`` (the
  pre-activation ReLU at each stage input) and ``relu0``;
- BatchNorm epsilon 2e-5 in the encoder, Keras-default 1e-3 in the decoder.

This module implements that graph natively in JAX (NHWC inside, channels
-first at the API boundary like the rest of the package) so Keras ``.h5``
weight files migrate weight-for-weight via ``seg.keras_import`` — geometry
choices (explicit zero-pad + valid convs, nearest-neighbor upsampling)
follow the Keras layers exactly.

Params/state are FLAT dicts keyed by Keras layer name ('conv0',
'stage1_unit1_bn1', 'decoder_stage0a_conv', ...), which makes the .h5
import a direct name map and keeps freeze/inspection simple.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..nn import functional as F
from .common import nchw_to_nhwc, nhwc_to_nchw
from .unet import _max_pool_3x3_s2, _upsample2x

# ResNet34 stage spec: (n_units, channels)
_STAGES = ((3, 64), (4, 128), (6, 256), (3, 512))
# BatchNorm epsilons: classification_models fixes 2e-5 for every encoder BN;
# segmentation_models' decoder uses the Keras default 1e-3.
_ENC_EPS = 2e-5
_DEC_EPS = 1e-3
# Keras BatchNormalization(momentum=0.99) updates running stats as
# running = 0.99*running + 0.01*batch — torch-convention momentum 0.01
# (F.batch_norm). Fine-tuning a migrated model must keep this rate: the
# torch default 0.1 would move the imported moving stats 10x faster than
# the Keras training the weights came from.
_BN_MOMENTUM = 0.01


def encoder_layer_names():
    """Keras layer names of the encoder (for freeze_encoder and import)."""
    names = ["bn_data", "conv0", "bn0"]
    for si, (n_units, _) in enumerate(_STAGES):
        for u in range(n_units):
            base = f"stage{si + 1}_unit{u + 1}_"
            names += [base + "bn1", base + "conv1", base + "bn2",
                      base + "conv2"]
            if u == 0:
                names.append(base + "sc")
    names.append("bn1")
    return names


@dataclasses.dataclass(frozen=True)
class KerasUNet:
    """pre_conv + classification_models-ResNet34 encoder + sm-Unet decoder.

    ``apply`` takes (B, C, H, W) in [0, 1] and returns (B, n_classes, H, W)
    logits ('linear' activation, reference models.py:83). H, W must be
    multiples of 32.
    """
    n_channels: int = 2
    n_classes: int = 3
    decoder_filters: Tuple[int, ...] = (256, 128, 64, 32, 16)
    # Matmul/conv precision for the whole graph. Migrated models default to
    # float32: the reference's TF inference ran f32, and on-chip bf16 error
    # measurably amplifies through the ~40-conv pre-activation graph
    # (measured on TPU v5e vs a float64 oracle: 4.8e-4 logit deviation at
    # f32 vs ~3% at the bf16 default on a random-weight net). Set to None
    # for the fast bf16 MXU path once outputs are validated.
    precision: str = "float32"

    def init(self, key):
        """Random init with the same shapes/layout the .h5 import fills —
        used by tests and as the base tree the importer overlays."""
        keys = jax.random.split(key, 128)
        ki = iter(keys)

        def bn(n_ch, scale=True):
            # scale=False (bn_data only): Keras keeps gamma fixed at 1 and
            # omits it from the weight file. The init still carries the
            # ones-gamma so the shared batch_norm primitive applies
            # unchanged; the importer skips it and Segment.fit zeroes its
            # gradient so it stays fixed under fine-tuning.
            del scale
            return F.init_batch_norm(n_ch)

        params, state = {}, {}
        params["pre_conv"] = F.init_conv(next(ki), 1, 1, self.n_channels, 3)
        p, s = bn(3, scale=False)
        params["bn_data"], state["bn_data"] = p, s
        params["conv0"] = F.init_conv(next(ki), 7, 7, 3, 64, use_bias=False)
        params["bn0"], state["bn0"] = bn(64)

        in_ch = 64
        for si, (n_units, ch) in enumerate(_STAGES):
            for u in range(n_units):
                base = f"stage{si + 1}_unit{u + 1}_"
                params[base + "bn1"], state[base + "bn1"] = bn(in_ch)
                params[base + "conv1"] = F.init_conv(
                    next(ki), 3, 3, in_ch, ch, use_bias=False)
                params[base + "bn2"], state[base + "bn2"] = bn(ch)
                params[base + "conv2"] = F.init_conv(
                    next(ki), 3, 3, ch, ch, use_bias=False)
                if u == 0:  # 'post' cut: 1x1 shortcut in every stage's unit1
                    params[base + "sc"] = F.init_conv(
                        next(ki), 1, 1, in_ch, ch, use_bias=False)
                in_ch = ch
        params["bn1"], state["bn1"] = bn(512)

        skip_ch = [256, 128, 64, 64, 0]
        in_ch = 512
        for i, (f_out, sc) in enumerate(zip(self.decoder_filters, skip_ch)):
            for half in ("a", "b"):
                cin = in_ch + sc if half == "a" else f_out
                name = f"decoder_stage{i}{half}"
                params[name + "_conv"] = F.init_conv(
                    next(ki), 3, 3, cin, f_out, use_bias=False)
                params[name + "_bn"], state[name + "_bn"] = bn(f_out)
            in_ch = f_out
        params["final_conv"] = F.init_conv(
            next(ki), 3, 3, self.decoder_filters[-1], self.n_classes)
        return params, state

    # -- forward --------------------------------------------------------
    def _unit(self, params, state, ns, h, si, u, train):
        """One pre-activation residual unit; returns (out, unit1_relu1)."""
        base = f"stage{si + 1}_unit{u + 1}_"
        stride = 2 if (u == 0 and si > 0) else 1
        x, ns[base + "bn1"] = F.batch_norm(
            params[base + "bn1"], state[base + "bn1"], h, train,
            momentum=_BN_MOMENTUM, eps=_ENC_EPS)
        x = F.relu(x)
        pre_relu = x
        if u == 0:
            shortcut = F.conv2d(params[base + "sc"], x, stride, 0)
        else:
            shortcut = h
        x = F.conv2d(params[base + "conv1"], x, stride, 1)
        x, ns[base + "bn2"] = F.batch_norm(
            params[base + "bn2"], state[base + "bn2"], x, train,
            momentum=_BN_MOMENTUM, eps=_ENC_EPS)
        x = F.relu(x)
        x = F.conv2d(params[base + "conv2"], x, 1, 1)
        return x + shortcut, pre_relu

    def apply(self, params, state, inputs, train: bool = False):
        """(B, C, H, W) -> (B, n_classes, H, W) logits, new_state."""
        if self.precision is not None:
            with jax.default_matmul_precision(self.precision):
                return self._apply(params, state, inputs, train)
        return self._apply(params, state, inputs, train)

    def _apply(self, params, state, inputs, train):
        ns = {}
        x = nchw_to_nhwc(inputs)
        h = F.conv2d(params["pre_conv"], x, 1, 0)
        h, ns["bn_data"] = F.batch_norm(
            params["bn_data"], state["bn_data"], h, train,
            momentum=_BN_MOMENTUM, eps=_ENC_EPS)
        h = F.conv2d(params["conv0"], h, 2, 3)
        h, ns["bn0"] = F.batch_norm(params["bn0"], state["bn0"], h, train,
                                    momentum=_BN_MOMENTUM, eps=_ENC_EPS)
        relu0 = h = F.relu(h)
        # Keras: ZeroPadding2D(1) + MaxPooling2D(3, 2, 'valid'). Post-ReLU
        # activations are >= 0, so the shared -inf-padded pool is identical.
        h = _max_pool_3x3_s2(h)

        skips = {}
        for si, (n_units, _) in enumerate(_STAGES):
            for u in range(n_units):
                h, pre_relu = self._unit(params, state, ns, h, si, u, train)
                if u == 0 and si > 0:
                    # stage{2,3,4}_unit1_relu1: sm's encoder skip features
                    skips[si] = pre_relu
        h, ns["bn1"] = F.batch_norm(params["bn1"], state["bn1"], h, train,
                                    momentum=_BN_MOMENTUM, eps=_ENC_EPS)
        h = F.relu(h)

        skip_order = [skips[3], skips[2], skips[1], relu0, None]
        for i, skip in enumerate(skip_order):
            h = _upsample2x(h)
            if skip is not None:
                h = jnp.concatenate([h, skip], axis=-1)
            for half in ("a", "b"):
                name = f"decoder_stage{i}{half}"
                h = F.conv2d(params[name + "_conv"], h, 1, 1)
                h, ns[name + "_bn"] = F.batch_norm(
                    params[name + "_bn"], state[name + "_bn"], h, train,
                    momentum=_BN_MOMENTUM, eps=_DEC_EPS)
                h = F.relu(h)
        logits = F.conv2d(params["final_conv"], h, 1, 1)
        return nhwc_to_nchw(logits), ns

    def predict(self, params, state, inputs):
        """Softmax probabilities with the z dim re-added:
        (B, C, H, W) -> (B, n_classes, 1, H, W)
        (reference models.py:159-182)."""
        logits, _ = self.apply(params, state, inputs, train=False)
        probs = jax.nn.softmax(logits, axis=1)
        return probs[:, :, None]
