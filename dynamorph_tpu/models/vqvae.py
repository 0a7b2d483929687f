"""VQ-VAE models (z16 / z32), TPU-native.

Architecture spec follows the reference exactly so weights can be imported
and latents match to <1e-5 (HiddenStateExtractor/vae.py:216-346 for z16,
:348-474 for z32); the implementation is new: NHWC activations, functional
param pytrees, matmul-form codebook lookup (ops/vq.py), matmul-form
time-matching loss, and jit-able end to end.

API (both models):
    model = VQVAEz16(num_inputs=2, num_hiddens=16, ...)
    params, state = model.init(key)
    decoded, losses, state = model.apply(params, state, x, train=...,
                                         time_matching_mat=..., batch_mask=...)
    z_before, z_after, idx = model.encode(params, state, x)
    decoded = model.decode(params, state, z)

``x`` is (B, C, H, W) float32 in [0, 1] (reference convention); internal
compute is NHWC.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..nn import functional as F
from ..ops.vq import (gather_codes, perplexity_from_counts,
                      vq_codebook_counts, vq_indices, vq_lookup)
from . import common
from .common import nchw_to_nhwc, nhwc_to_nchw


def _init_codebook(key, num_embeddings, embedding_dim):
    # torch nn.Embedding default init: N(0, 1).
    return jax.random.normal(key, (num_embeddings, embedding_dim), jnp.float32)


@dataclasses.dataclass(frozen=True)
class VQVAEBase:
    num_inputs: int = 2
    num_hiddens: int = 16
    num_residual_hiddens: int = 32
    num_residual_layers: int = 2
    num_embeddings: int = 64
    commitment_cost: float = 0.25
    weight_recon: float = 1.0
    weight_commitment: float = 1.0
    weight_matching: float = 0.005
    w_a: float = 1.1
    w_t: float = 0.1
    w_n: float = -0.5
    margin: float = 0.5
    channel_var: Tuple[float, ...] = (1.0, 1.0)
    vq_impl: str = "auto"
    # Distance-matmul precision for the TRAINING-path codebook argmin.
    # "high" (3-pass f32) flips only ~0.006% of assignments vs exact (true
    # near-ties) and is ~1.5x faster; inference/encode always uses
    # "highest" for bit-parity with the torch reference. Set "highest" here
    # to make training assignments exact too.
    vq_train_precision: str = "high"
    # Time-matching loss implementation. None -> the dense (B, B)
    # common.time_matching_loss. For mesh-sharded training with
    # trajectory-contiguous shards, inject
    # train.sharded_loss.make_traj_sharded_tm_loss(mesh) (ring/ppermute,
    # no z_flat all-gather) via dataclasses.replace; the relation argument
    # is then the block-diagonal (B, B/n) representation.
    tm_loss_fn: object = None

    # ---- shared pieces -------------------------------------------------

    def _channel_var(self):
        return jnp.asarray(self.channel_var, jnp.float32)

    def _vq(self, params, z, train: bool):
        """Codebook lookup + straight-through + commitment loss + perplexity.

        In training, quantized must be differentiable w.r.t. the codebook:
        indices come from the argmin-only kernel and rows are re-gathered
        with gather_codes (custom VJP — codebook grads via a one-hot MXU
        matmul). Inference uses the fused lookup kernel output directly.
        """
        codebook = params["vq"]["codebook"]
        # The lookup kernels have no autodiff rule and none is needed:
        # argmin indices carry no gradient. Call them on stop_gradient inputs
        # so linearization never touches them; codebook gradients flow through
        # the differentiable re-gather below.
        sg = jax.lax.stop_gradient
        if train:
            # indices-only kernel (skips the gather matmul + (N, D) output
            # the training path would discard), then a custom-VJP gather:
            # codebook grads flow as a one-hot MXU matmul instead of
            # jnp.take's scatter-add (4.6x faster backward at the z32
            # production shapes, grads equal to accumulation order)
            idx = vq_indices(sg(z), sg(codebook), impl=self.vq_impl,
                             precision=self.vq_train_precision)
            quantized = gather_codes(codebook, idx)
        else:
            quantized, idx = vq_lookup(sg(z), sg(codebook), impl=self.vq_impl)
        st, c_loss = common.vq_losses(z, quantized, self.commitment_cost)
        counts = vq_codebook_counts(idx, self.num_embeddings)
        perplexity = perplexity_from_counts(counts)
        return st, c_loss, perplexity, idx

    def _losses(self, decoded, inputs_nhwc, z_flat, c_loss, perplexity,
                time_matching_mat, batch_mask, recon_weighted: bool):
        recon = common.masked_recon_loss(
            decoded, inputs_nhwc, batch_mask, self._channel_var())
        if recon_weighted:
            total = self.weight_recon * recon + self.weight_commitment * c_loss
        else:
            total = recon + c_loss
        tm = jnp.zeros((), jnp.float32)
        if time_matching_mat is not None:
            tm_fn = self.tm_loss_fn or common.time_matching_loss
            tm = tm_fn(z_flat, time_matching_mat, self.w_a, self.w_t,
                       self.w_n, self.margin)
            total = total + self.weight_matching * tm
        return {
            "recon_loss": recon,
            "commitment_loss": c_loss,
            "time_matching_loss": tm,
            "perplexity": perplexity,
            "total_loss": total,
        }


@dataclasses.dataclass(frozen=True)
class VQVAEz16(VQVAEBase):
    """3x downsample: 128x128 input -> 16x16 x num_hiddens latent grid.

    Reference spec: HiddenStateExtractor/vae.py:216-346 (enc :273-286,
    dec :288-295; default inference network, configs/config_example.yml:115).
    Time-matching loss uses z_before (pre-VQ), reference vae.py:323.
    """

    def init(self, key):
        ks = jax.random.split(key, 16)
        nh, ni = self.num_hiddens, self.num_inputs
        bn = F.init_batch_norm
        bn1p, bn1s = bn(nh // 2)
        bn2p, bn2s = bn(nh)
        bn3p, bn3s = bn(nh)
        bn4p, bn4s = bn(nh)
        res_p, res_s = common.init_residual_block(
            ks[5], nh, self.num_residual_hiddens, self.num_residual_layers)
        params = {
            "enc": {
                "conv0": F.init_conv(ks[0], 1, 1, ni, nh // 2),
                "conv1": F.init_conv(ks[1], 4, 4, nh // 2, nh // 2),
                "bn1": bn1p,
                "conv2": F.init_conv(ks[2], 4, 4, nh // 2, nh),
                "bn2": bn2p,
                "conv3": F.init_conv(ks[3], 4, 4, nh, nh),
                "bn3": bn3p,
                "conv4": F.init_conv(ks[4], 3, 3, nh, nh),
                "bn4": bn4p,
                "res": res_p,
            },
            "vq": {"codebook": _init_codebook(ks[6], self.num_embeddings, nh)},
            "dec": {
                "deconv0": F.init_conv_transpose(ks[7], 4, 4, nh, nh // 2),
                "deconv1": F.init_conv_transpose(ks[8], 4, 4, nh // 2, nh // 4),
                "deconv2": F.init_conv_transpose(ks[9], 4, 4, nh // 4, nh // 4),
                "conv_out": F.init_conv(ks[10], 1, 1, nh // 4, ni),
            },
        }
        state = {
            "enc": {"bn1": bn1s, "bn2": bn2s, "bn3": bn3s, "bn4": bn4s, "res": res_s},
        }
        return params, state

    def _encode_nhwc(self, params, state, x, train: bool):
        p, s = params["enc"], state["enc"]
        ns = {}
        # conv0 (1x1) + conv1 (4x4 s2) fused into one conv — exact, avoids
        # the full-resolution lifted intermediate (common.py helper)
        h = common.fused_preconv_stride_conv(p["conv0"], p["conv1"], x)
        h, ns["bn1"] = F.batch_norm(p["bn1"], s["bn1"], h, train)
        h = F.relu(h)
        h = F.conv2d(p["conv2"], h, 2, 1)
        h, ns["bn2"] = F.batch_norm(p["bn2"], s["bn2"], h, train)
        h = F.relu(h)
        h = F.conv2d(p["conv3"], h, 2, 1)
        h, ns["bn3"] = F.batch_norm(p["bn3"], s["bn3"], h, train)
        h = F.relu(h)
        h = F.conv2d(p["conv4"], h, 1, 1)
        h, ns["bn4"] = F.batch_norm(p["bn4"], s["bn4"], h, train)
        h, ns["res"] = common.apply_residual_block(p["res"], s["res"], h, train)
        return h, {"enc": ns}

    def _decode_nhwc(self, params, z):
        p = params["dec"]
        h = F.relu(F.conv_transpose2d(p["deconv0"], z, 2, 1))
        h = F.relu(F.conv_transpose2d(p["deconv1"], h, 2, 1))
        h = F.relu(F.conv_transpose2d(p["deconv2"], h, 2, 1))
        return F.conv2d(p["conv_out"], h, 1, 0)

    def apply(self, params, state, inputs, train: bool = False,
              time_matching_mat=None, batch_mask=None):
        x = nchw_to_nhwc(inputs)
        mask = nchw_to_nhwc(batch_mask) if batch_mask is not None else None
        z_before, new_state = self._encode_nhwc(params, state, x, train)
        z_after, c_loss, perplexity, _ = self._vq(params, z_before, train)
        decoded = self._decode_nhwc(params, z_after)
        z_flat = z_before.reshape(z_before.shape[0], -1)
        losses = self._losses(decoded, x, z_flat, c_loss, perplexity,
                              time_matching_mat, mask, recon_weighted=True)
        return nhwc_to_nchw(decoded), losses, new_state

    def encode(self, params, state, inputs):
        """(B,C,H,W) -> (z_before, z_after, indices), channel-first latents.

        This is the `process_VAE` hot path (reference pipeline/patch_VAE.py:
        445-452) — here batched and fully fused under jit.
        """
        x = nchw_to_nhwc(inputs)
        z_before, _ = self._encode_nhwc(params, state, x, train=False)
        codebook = params["vq"]["codebook"]
        z_after, idx = vq_lookup(z_before, codebook, impl=self.vq_impl)
        return nhwc_to_nchw(z_before), nhwc_to_nchw(z_after), idx

    def decode(self, params, state, z_nchw):
        return nhwc_to_nchw(self._decode_nhwc(params, nchw_to_nhwc(z_nchw)))


@dataclasses.dataclass(frozen=True)
class VQVAEz32(VQVAEBase):
    """2x downsample: 128x128 input -> 32x32 x num_hiddens latent grid.

    Reference spec: HiddenStateExtractor/vae.py:348-474 (enc :401-407,
    dec :409-414; training default, configs/config_example.yml:157).
    Differences vs z16: recon/commitment unweighted (vae.py:440), and the
    time-matching loss uses z_after (post-VQ, vae.py:444).
    """

    def init(self, key):
        ks = jax.random.split(key, 8)
        nh, ni = self.num_hiddens, self.num_inputs
        bn1p, bn1s = F.init_batch_norm(nh // 2)
        bn2p, bn2s = F.init_batch_norm(nh)
        enc_res_p, enc_res_s = common.init_residual_block(
            ks[2], nh, self.num_residual_hiddens, self.num_residual_layers)
        dec_res_p, dec_res_s = common.init_residual_block(
            ks[4], nh, self.num_residual_hiddens, self.num_residual_layers)
        dbn_p, dbn_s = F.init_batch_norm(nh // 2)
        params = {
            "enc": {
                "conv1": F.init_conv(ks[0], 4, 4, ni, nh // 2),
                "bn1": bn1p,
                "conv2": F.init_conv(ks[1], 4, 4, nh // 2, nh),
                "bn2": bn2p,
                "res": enc_res_p,
            },
            "vq": {"codebook": _init_codebook(ks[3], self.num_embeddings, nh)},
            "dec": {
                "res": dec_res_p,
                "deconv0": F.init_conv_transpose(ks[5], 4, 4, nh, nh // 2),
                "bn": dbn_p,
                "deconv1": F.init_conv_transpose(ks[6], 4, 4, nh // 2, ni),
            },
        }
        state = {
            "enc": {"bn1": bn1s, "bn2": bn2s, "res": enc_res_s},
            "dec": {"res": dec_res_s, "bn": dbn_s},
        }
        return params, state

    def _encode_nhwc(self, params, state, x, train: bool):
        p, s = params["enc"], state["enc"]
        ns = {}
        h = F.conv2d(p["conv1"], x, 2, 1)
        h, ns["bn1"] = F.batch_norm(p["bn1"], s["bn1"], h, train)
        h = F.relu(h)
        h = F.conv2d(p["conv2"], h, 2, 1)
        h, ns["bn2"] = F.batch_norm(p["bn2"], s["bn2"], h, train)
        h, ns["res"] = common.apply_residual_block(p["res"], s["res"], h, train)
        return h, ns

    def _decode_nhwc(self, params, state, z, train: bool):
        p, s = params["dec"], state["dec"]
        ns = {}
        h, ns["res"] = common.apply_residual_block(p["res"], s["res"], z, train)
        h = F.conv_transpose2d(p["deconv0"], h, 2, 1)
        h, ns["bn"] = F.batch_norm(p["bn"], s["bn"], h, train)
        h = F.relu(h)
        h = F.conv_transpose2d(p["deconv1"], h, 2, 1)
        return h, ns

    def apply(self, params, state, inputs, train: bool = False,
              time_matching_mat=None, batch_mask=None, labels=None):
        x = nchw_to_nhwc(inputs)
        mask = nchw_to_nhwc(batch_mask) if batch_mask is not None else None
        z_before, enc_ns = self._encode_nhwc(params, state, x, train)
        z_after, c_loss, perplexity, _ = self._vq(params, z_before, train)
        decoded, dec_ns = self._decode_nhwc(params, state, z_after, train)
        z_flat = z_after.reshape(z_after.shape[0], -1)
        losses = self._losses(decoded, x, z_flat, c_loss, perplexity,
                              time_matching_mat, mask, recon_weighted=False)
        new_state = {"enc": enc_ns, "dec": dec_ns}
        return nhwc_to_nchw(decoded), losses, new_state

    def encode(self, params, state, inputs):
        x = nchw_to_nhwc(inputs)
        z_before, _ = self._encode_nhwc(params, state, x, train=False)
        codebook = params["vq"]["codebook"]
        z_after, idx = vq_lookup(z_before, codebook, impl=self.vq_impl)
        return nhwc_to_nchw(z_before), nhwc_to_nchw(z_after), idx

    def decode(self, params, state, z_nchw):
        d, _ = self._decode_nhwc(params, state, nchw_to_nhwc(z_nchw), train=False)
        return nhwc_to_nchw(d)
