"""Import reference PyTorch ``state_dict`` weights into dynamorph_tpu pytrees.

The reference ships trained VQ-VAE weights as ``model.pt`` torch state dicts
(reference run_training.py:542-545, pipeline/patch_VAE.py:436-441). These
functions map the reference's ``nn.Sequential`` index names (layout documented
at HiddenStateExtractor/vae.py:273-295, :401-414) onto our named param/state
trees, transposing kernels into TPU layouts.

Input is a plain ``{name: numpy array}`` dict — call sites convert torch
tensors with ``{k: v.detach().cpu().numpy() for k, v in sd.items()}`` so this
module never imports torch.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..nn.functional import (
    conv_kernel_from_torch,
    conv_transpose_kernel_from_torch,
    linear_weight_from_torch,
)


def _conv(sd, prefix):
    return {
        "kernel": jnp.asarray(conv_kernel_from_torch(sd[prefix + ".weight"])),
        "bias": jnp.asarray(sd[prefix + ".bias"]),
    }


def _deconv(sd, prefix):
    return {
        "kernel": jnp.asarray(conv_transpose_kernel_from_torch(sd[prefix + ".weight"])),
        "bias": jnp.asarray(sd[prefix + ".bias"]),
    }


def _bn(sd, prefix):
    params = {
        "scale": jnp.asarray(sd[prefix + ".weight"]),
        "offset": jnp.asarray(sd[prefix + ".bias"]),
    }
    state = {
        "mean": jnp.asarray(sd[prefix + ".running_mean"]),
        "var": jnp.asarray(sd[prefix + ".running_var"]),
    }
    return params, state


def _linear(sd, prefix):
    return {
        "weight": jnp.asarray(linear_weight_from_torch(sd[prefix + ".weight"])),
        "bias": jnp.asarray(sd[prefix + ".bias"]),
    }


def _residual_block(sd, prefix, num_layers):
    """Reference ResidualBlock: layers.{i} Sequential with Conv at 1, BN at 2,
    Conv at 4, BN at 5 (vae.py:189-196)."""
    params, state = [], []
    for i in range(num_layers):
        b = f"{prefix}.layers.{i}"
        bn1_p, bn1_s = _bn(sd, f"{b}.2")
        bn2_p, bn2_s = _bn(sd, f"{b}.5")
        params.append({
            "conv1": _conv(sd, f"{b}.1"),
            "bn1": bn1_p,
            "conv2": _conv(sd, f"{b}.4"),
            "bn2": bn2_p,
        })
        state.append({"bn1": bn1_s, "bn2": bn2_s})
    return params, state


def import_vqvae_z16(sd: dict, num_residual_layers: int = 2):
    """state_dict -> (params, state) for VQVAEz16 (ref vae.py:273-295):
    the shared z16 encoder/decoder trunks plus the VQ codebook."""
    enc_p, enc_s = _z16_encoder(sd, num_residual_layers, extra_conv=False)
    params = {
        "enc": enc_p,
        "vq": {"codebook": jnp.asarray(sd["vq.w.weight"])},
        "dec": _z16_decoder(sd),
    }
    return params, {"enc": enc_s}


def import_vqvae_z32(sd: dict, num_residual_layers: int = 2):
    """state_dict -> (params, state) for VQVAEz32 (ref vae.py:401-414)."""
    bn1_p, bn1_s = _bn(sd, "enc.1")
    bn2_p, bn2_s = _bn(sd, "enc.4")
    enc_res_p, enc_res_s = _residual_block(sd, "enc.5", num_residual_layers)
    dec_res_p, dec_res_s = _residual_block(sd, "dec.0", num_residual_layers)
    dbn_p, dbn_s = _bn(sd, "dec.2")
    params = {
        "enc": {
            "conv1": _conv(sd, "enc.0"),
            "bn1": bn1_p,
            "conv2": _conv(sd, "enc.3"),
            "bn2": bn2_p,
            "res": enc_res_p,
        },
        "vq": {"codebook": jnp.asarray(sd["vq.w.weight"])},
        "dec": {
            "res": dec_res_p,
            "deconv0": _deconv(sd, "dec.1"),
            "bn": dbn_p,
            "deconv1": _deconv(sd, "dec.4"),
        },
    }
    state = {
        "enc": {"bn1": bn1_s, "bn2": bn2_s, "res": enc_res_s},
        "dec": {"res": dec_res_s, "bn": dbn_s},
    }
    return params, state


def _z16_encoder(sd: dict, num_residual_layers: int, extra_conv: bool):
    """Shared z16-style encoder trunk (reference vae.py:273-286 == :523-537).
    With ``extra_conv``, include the final 1x1 widening conv (VAE, index 13)."""
    bn1_p, bn1_s = _bn(sd, "enc.2")
    bn2_p, bn2_s = _bn(sd, "enc.5")
    bn3_p, bn3_s = _bn(sd, "enc.8")
    bn4_p, bn4_s = _bn(sd, "enc.11")
    res_p, res_s = _residual_block(sd, "enc.12", num_residual_layers)
    params = {
        "conv0": _conv(sd, "enc.0"),
        "conv1": _conv(sd, "enc.1"),
        "bn1": bn1_p,
        "conv2": _conv(sd, "enc.4"),
        "bn2": bn2_p,
        "conv3": _conv(sd, "enc.7"),
        "bn3": bn3_p,
        "conv4": _conv(sd, "enc.10"),
        "bn4": bn4_p,
        "res": res_p,
    }
    if extra_conv:
        params["conv5"] = _conv(sd, "enc.13")
    state = {"bn1": bn1_s, "bn2": bn2_s, "bn3": bn3_s, "bn4": bn4_s,
             "res": res_s}
    return params, state


def _z16_decoder(sd: dict):
    """Shared z16-style decoder (reference vae.py:288-295 == :539-546)."""
    return {
        "deconv0": _deconv(sd, "dec.0"),
        "deconv1": _deconv(sd, "dec.2"),
        "deconv2": _deconv(sd, "dec.4"),
        "conv_out": _conv(sd, "dec.6"),
    }


def import_vae(sd: dict, num_residual_layers: int = 2):
    """state_dict -> (params, state) for VAEModel/IWAEModel
    (reference vae.py:523-546)."""
    enc_p, enc_s = _z16_encoder(sd, num_residual_layers, extra_conv=True)
    return {"enc": enc_p, "dec": _z16_decoder(sd)}, {"enc": enc_s}


def import_aae(sd: dict, num_residual_layers: int = 2):
    """state_dict -> (params, state) for AAEModel
    (reference vae.py:745-786; discriminator layout :759-778)."""
    enc_p, enc_s = _z16_encoder(sd, num_residual_layers, extra_conv=False)
    dbn1_p, dbn1_s = _bn(sd, "enc_d.2")
    dbn2_p, dbn2_s = _bn(sd, "enc_d.5")
    dbn3_p, dbn3_s = _bn(sd, "enc_d.8")
    enc_d_p = {
        "conv0": _conv(sd, "enc_d.0"),
        "conv1": _conv(sd, "enc_d.1"),
        "bn1": dbn1_p,
        "conv2": _conv(sd, "enc_d.4"),
        "bn2": dbn2_p,
        "conv3": _conv(sd, "enc_d.7"),
        "bn3": dbn3_p,
        "fc1": _linear(sd, "enc_d.11"),
        "fc2": _linear(sd, "enc_d.14"),
        "fc3": _linear(sd, "enc_d.17"),
    }
    enc_d_s = {"bn1": dbn1_s, "bn2": dbn2_s, "bn3": dbn3_s}
    params = {"enc": enc_p, "dec": _z16_decoder(sd), "enc_d": enc_d_p}
    state = {"enc": enc_s, "enc_d": enc_d_s}
    return params, state


def import_resnet34_encoder(sd: dict):
    """torchvision ``resnet34`` state_dict -> (params, state) subtrees for
    the UNet encoder (keys ``stem`` and ``layer1``..``layer4``).

    The reference builds its segmentation net from an ImageNet-pretrained
    resnet34 encoder (reference NNsegmentation/models.py:80-82,
    ``Unet('resnet34', encoder_weights='imagenet')``); this maps torchvision's
    stable naming (conv1/bn1, layer{1-4}.{i}.conv{1,2}/bn{1,2}/downsample)
    onto our UNet pytree so a pretrained encoder can initialise `Segment`
    (pass ``encoder_weights=`` to it). The classifier head (``fc.*``) and any
    extra keys are ignored.
    """
    return import_torchvision_resnet(sd, "ResNet34")


def import_torchvision_resnet(sd: dict, arch: str = "ResNet50",
                              prefix: str = ""):
    """torchvision ResNet{18,34,50,101,152} state_dict -> (params, state)
    for a stem + layer1..4 trunk (torchvision naming:
    conv1/bn1/layer{1-4}.{i}.conv*/bn*/downsample). ``prefix`` prepends a
    module path (the reference wraps torchvision nets as ``convnet.``,
    resnet.py:7-45); classifier head (fc.*) keys are ignored.
    """
    layers = {"ResNet18": (2, 2, 2, 2), "ResNet34": (3, 4, 6, 3),
              "ResNet50": (3, 4, 6, 3),
              "ResNet101": (3, 4, 23, 3), "ResNet152": (3, 8, 36, 3)}[arch]
    bottleneck = arch not in ("ResNet18", "ResNet34")

    bn_p, bn_s = _bn(sd, f"{prefix}bn1")
    params = {"stem": {
        "conv": {"kernel": jnp.asarray(
            conv_kernel_from_torch(sd[f"{prefix}conv1.weight"]))},
        "bn": bn_p}}
    state = {"stem": {"bn": bn_s}}

    for li, n_blocks in enumerate(layers):
        blocks_p, blocks_s = [], []
        for b in range(n_blocks):
            bpfx = f"{prefix}layer{li + 1}.{b}"
            p, s = {}, {}
            n_convs = 3 if bottleneck else 2
            for ci in range(1, n_convs + 1):
                p[f"conv{ci}"] = {"kernel": jnp.asarray(
                    conv_kernel_from_torch(sd[f"{bpfx}.conv{ci}.weight"]))}
                bnp, bns = _bn(sd, f"{bpfx}.bn{ci}")
                p[f"bn{ci}"] = bnp
                s[f"bn{ci}"] = bns
            if f"{bpfx}.downsample.0.weight" in sd:
                p["down"] = {"kernel": jnp.asarray(
                    conv_kernel_from_torch(
                        sd[f"{bpfx}.downsample.0.weight"]))}
                dbn_p, dbn_s = _bn(sd, f"{bpfx}.downsample.1")
                p["down_bn"] = dbn_p
                s["down_bn"] = dbn_s
            blocks_p.append(p)
            blocks_s.append(s)
        params[f"layer{li + 1}"] = blocks_p
        state[f"layer{li + 1}"] = blocks_s
    return params, state


def import_encode_project(sd: dict, arch: str = "ResNet50"):
    """state_dict -> (params, state) for EncodeProject
    (reference HiddenStateExtractor/resnet.py:70-127; torchvision ResNet
    naming: convnet.conv1/bn1/layer{1-4}.{i}.conv*/bn*/downsample,
    projection.fc1/bn1/fc2/bn2).

    Note: torchvision is not installed in this build environment, so this
    importer is exercised by structural self-consistency tests; the naming
    follows torchvision's stable public conventions.
    """
    params, state = import_torchvision_resnet(sd, arch, prefix="convnet.")

    pbn1_p, pbn1_s = _bn(sd, "projection.bn1")
    pbn2_p, pbn2_s = _bn(sd, "projection.bn2")
    params["proj"] = {
        "fc1": {"weight": jnp.asarray(
            linear_weight_from_torch(sd["projection.fc1.weight"]))},
        "bn1": pbn1_p,
        "fc2": {"weight": jnp.asarray(
            linear_weight_from_torch(sd["projection.fc2.weight"]))},
        # BatchNorm1dNoBias: offset frozen at zero -> omit (resnet.py:65-68)
        "bn2": {"scale": pbn2_p["scale"]},
    }
    state["proj"] = {"bn1": pbn1_s, "bn2": pbn2_s}
    return params, state


def load_state_dict_numpy(path: str) -> dict:
    """Load a torch checkpoint into {name: np.ndarray} without keeping torch
    tensors around. Requires torch at call time (host-side only)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in sd.items()}
