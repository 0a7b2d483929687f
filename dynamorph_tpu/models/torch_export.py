"""Export dynamorph_tpu VQ-VAE params to reference-format torch state_dicts.

Inverse of models/torch_import.py: lets models trained on TPU be loaded by
the reference PyTorch pipeline (`model.pt` consumed at
pipeline/patch_VAE.py:436). Produces a {torch_name: np.ndarray} dict;
``save_torch_checkpoint`` writes an actual ``torch.save`` file when torch is
available on the host.
"""
from __future__ import annotations

from typing import Dict

import numpy as np
import jax


def _np(x):
    return np.asarray(jax.device_get(x))


def _conv(out: Dict, prefix: str, p):
    out[prefix + ".weight"] = np.transpose(_np(p["kernel"]), (3, 2, 0, 1))
    out[prefix + ".bias"] = _np(p["bias"])


def _deconv(out: Dict, prefix: str, p):
    out[prefix + ".weight"] = np.transpose(_np(p["kernel"]), (2, 3, 0, 1))
    out[prefix + ".bias"] = _np(p["bias"])


def _bn(out: Dict, prefix: str, p, s):
    out[prefix + ".weight"] = _np(p["scale"])
    out[prefix + ".bias"] = _np(p["offset"])
    out[prefix + ".running_mean"] = _np(s["mean"])
    out[prefix + ".running_var"] = _np(s["var"])
    out[prefix + ".num_batches_tracked"] = np.asarray(0, dtype=np.int64)


def _residual_block(out: Dict, prefix: str, params, state):
    for i, (p, s) in enumerate(zip(params, state)):
        b = f"{prefix}.layers.{i}"
        _conv(out, f"{b}.1", p["conv1"])
        _bn(out, f"{b}.2", p["bn1"], s["bn1"])
        _conv(out, f"{b}.4", p["conv2"])
        _bn(out, f"{b}.5", p["bn2"], s["bn2"])


def export_vqvae_z16(params, state, channel_var=(1.0, 1.0)) -> Dict[str, np.ndarray]:
    """params/state -> reference VQ_VAE_z16 state_dict names
    (HiddenStateExtractor/vae.py:273-295)."""
    out: Dict[str, np.ndarray] = {}
    e, es = params["enc"], state["enc"]
    _conv(out, "enc.0", e["conv0"])
    _conv(out, "enc.1", e["conv1"])
    _bn(out, "enc.2", e["bn1"], es["bn1"])
    _conv(out, "enc.4", e["conv2"])
    _bn(out, "enc.5", e["bn2"], es["bn2"])
    _conv(out, "enc.7", e["conv3"])
    _bn(out, "enc.8", e["bn3"], es["bn3"])
    _conv(out, "enc.10", e["conv4"])
    _bn(out, "enc.11", e["bn4"], es["bn4"])
    _residual_block(out, "enc.12", e["res"], es["res"])
    out["vq.w.weight"] = _np(params["vq"]["codebook"])
    d = params["dec"]
    _deconv(out, "dec.0", d["deconv0"])
    _deconv(out, "dec.2", d["deconv1"])
    _deconv(out, "dec.4", d["deconv2"])
    _conv(out, "dec.6", d["conv_out"])
    n_inputs = out["enc.0.weight"].shape[1]
    out["channel_var"] = np.asarray(channel_var, np.float32).reshape(
        (1, n_inputs, 1, 1))
    return out


def export_vqvae_z32(params, state, channel_var=(1.0, 1.0)) -> Dict[str, np.ndarray]:
    """params/state -> reference VQ_VAE_z32 state_dict names
    (HiddenStateExtractor/vae.py:401-414)."""
    out: Dict[str, np.ndarray] = {}
    e, es = params["enc"], state["enc"]
    _conv(out, "enc.0", e["conv1"])
    _bn(out, "enc.1", e["bn1"], es["bn1"])
    _conv(out, "enc.3", e["conv2"])
    _bn(out, "enc.4", e["bn2"], es["bn2"])
    _residual_block(out, "enc.5", e["res"], es["res"])
    out["vq.w.weight"] = _np(params["vq"]["codebook"])
    d, ds = params["dec"], state["dec"]
    _residual_block(out, "dec.0", d["res"], ds["res"])
    _deconv(out, "dec.1", d["deconv0"])
    _bn(out, "dec.2", d["bn"], ds["bn"])
    _deconv(out, "dec.4", d["deconv1"])
    n_inputs = out["dec.4.weight"].shape[1]
    out["channel_var"] = np.asarray(channel_var, np.float32).reshape(
        (1, n_inputs, 1, 1))
    return out


def save_torch_checkpoint(state_dict_np: Dict[str, np.ndarray],
                          path: str) -> None:
    """Write a torch-loadable checkpoint (requires torch on the host)."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in state_dict_np.items()}
    torch.save(sd, path)
