"""ResNet encoder + SimCLR projection head for triplet representation
learning.

Behavioral spec: reference HiddenStateExtractor/resnet.py — torchvision
ResNet18/50/101/152 without the FC layer, 2-channel stem (7x7/s2 or 3x3
cifar head), global average pool; 128-d projection head
fc(no bias)-BN-ReLU-fc(no bias)-BN(no bias) (:99-107); triplet loss forward
(:119-126); LogisticRegression probe (:129-143).

Functional JAX, NHWC; basic blocks shared with models/unet.py.
"""
from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np

from ..nn import functional as F
from .common import nchw_to_nhwc
from .losses import AllTripletMiner
from .unet import _apply_basic_block, _init_basic_block, _max_pool_3x3_s2

_ARCHS = {
    "ResNet18": ("basic", (2, 2, 2, 2), 512),
    "ResNet50": ("bottleneck", (3, 4, 6, 3), 2048),
    "ResNet101": ("bottleneck", (3, 4, 23, 3), 2048),
    "ResNet152": ("bottleneck", (3, 8, 36, 3), 2048),
}


def _init_bottleneck(key, in_ch, mid_ch, stride):
    out_ch = mid_ch * 4
    k1, k2, k3, k4 = jax.random.split(key, 4)
    bn1p, bn1s = F.init_batch_norm(mid_ch)
    bn2p, bn2s = F.init_batch_norm(mid_ch)
    bn3p, bn3s = F.init_batch_norm(out_ch)
    p = {
        "conv1": F.init_conv(k1, 1, 1, in_ch, mid_ch, use_bias=False),
        "bn1": bn1p,
        "conv2": F.init_conv(k2, 3, 3, mid_ch, mid_ch, use_bias=False),
        "bn2": bn2p,
        "conv3": F.init_conv(k3, 1, 1, mid_ch, out_ch, use_bias=False),
        "bn3": bn3p,
    }
    s = {"bn1": bn1s, "bn2": bn2s, "bn3": bn3s}
    if stride != 1 or in_ch != out_ch:
        dbn_p, dbn_s = F.init_batch_norm(out_ch)
        p["down"] = F.init_conv(k4, 1, 1, in_ch, out_ch, use_bias=False)
        p["down_bn"] = dbn_p
        s["down_bn"] = dbn_s
    return p, s


def _apply_bottleneck(p, s, x, stride, train):
    ns = {}
    h = F.conv2d(p["conv1"], x, 1, 0)
    h, ns["bn1"] = F.batch_norm(p["bn1"], s["bn1"], h, train)
    h = F.relu(h)
    h = F.conv2d(p["conv2"], h, stride, 1)
    h, ns["bn2"] = F.batch_norm(p["bn2"], s["bn2"], h, train)
    h = F.relu(h)
    h = F.conv2d(p["conv3"], h, 1, 0)
    h, ns["bn3"] = F.batch_norm(p["bn3"], s["bn3"], h, train)
    if "down" in p:
        sc = F.conv2d(p["down"], x, stride, 0)
        sc, ns["down_bn"] = F.batch_norm(p["down_bn"], s["down_bn"], sc, train)
    else:
        sc = x
    return F.relu(h + sc), ns


@dataclasses.dataclass(frozen=True)
class EncodeProject:
    """ResNet encoder + projection head (reference resnet.py:70-127)."""
    arch: str = "ResNet50"
    num_inputs: int = 2
    cifar_head: bool = False
    margin: float = 1.0
    proj_dim: int = 128
    hard_negative: bool = False

    @property
    def miner(self):
        if self.hard_negative:
            from .losses import HardNegativeTripletMiner

            return HardNegativeTripletMiner(margin=self.margin)
        return AllTripletMiner(margin=self.margin)

    @property
    def _spec(self):
        if self.arch not in _ARCHS:
            raise NotImplementedError(self.arch)
        return _ARCHS[self.arch]

    @property
    def encoder_dim(self):
        return self._spec[2]

    def init(self, key):
        block_type, layers, enc_dim = self._spec
        keys = jax.random.split(key, 256)
        ki = iter(keys)
        params, state = {}, {}
        if self.cifar_head:
            stem_conv = F.init_conv(next(ki), 3, 3, self.num_inputs, 64,
                                    use_bias=False)
        else:
            stem_conv = F.init_conv(next(ki), 7, 7, self.num_inputs, 64,
                                    use_bias=False)
        bn_p, bn_s = F.init_batch_norm(64)
        params["stem"] = {"conv": stem_conv, "bn": bn_p}
        state["stem"] = {"bn": bn_s}

        in_ch = 64
        widths = (64, 128, 256, 512)
        for si, (n_blocks, width) in enumerate(zip(layers, widths)):
            blocks_p, blocks_s = [], []
            for b in range(n_blocks):
                stride = 2 if (b == 0 and si > 0) else 1
                if block_type == "basic":
                    bp, bs = _init_basic_block(next(ki), in_ch, width, stride)
                    in_ch = width
                else:
                    bp, bs = _init_bottleneck(next(ki), in_ch, width, stride)
                    in_ch = width * 4
                blocks_p.append(bp)
                blocks_s.append(bs)
            params[f"layer{si + 1}"] = blocks_p
            state[f"layer{si + 1}"] = blocks_s

        # projection head (reference resnet.py:99-107)
        pbn1_p, pbn1_s = F.init_batch_norm(enc_dim)
        pbn2_p, pbn2_s = F.init_batch_norm(self.proj_dim)
        pbn2_p = {"scale": pbn2_p["scale"]}  # BatchNorm1dNoBias: offset frozen 0
        params["proj"] = {
            "fc1": F.init_linear_no_bias(next(ki), enc_dim, enc_dim),
            "bn1": pbn1_p,
            "fc2": F.init_linear_no_bias(next(ki), enc_dim, self.proj_dim),
            "bn2": pbn2_p,
        }
        state["proj"] = {"bn1": pbn1_s, "bn2": pbn2_s}
        return params, state

    def _convnet(self, params, state, x, train):
        block_type, layers, _ = self._spec
        ns = {"stem": {}}
        stride = 1 if self.cifar_head else 2
        pad = 1 if self.cifar_head else 3
        h = F.conv2d(params["stem"]["conv"], x, stride, pad)
        h, ns["stem"]["bn"] = F.batch_norm(params["stem"]["bn"],
                                           state["stem"]["bn"], h, train)
        h = F.relu(h)
        if not self.cifar_head:
            h = _max_pool_3x3_s2(h)
        widths = (64, 128, 256, 512)
        for si, (n_blocks, width) in enumerate(zip(layers, widths)):
            layer_ns = []
            for b in range(n_blocks):
                stride = 2 if (b == 0 and si > 0) else 1
                fn = _apply_basic_block if block_type == "basic" \
                    else _apply_bottleneck
                h, bns = fn(params[f"layer{si + 1}"][b],
                            state[f"layer{si + 1}"][b], h, stride, train)
                layer_ns.append(bns)
            ns[f"layer{si + 1}"] = layer_ns
        h = jnp.mean(h, axis=(1, 2))  # global average pool
        return h, ns

    def encode_fn(self, params, state, inputs, out: str = "z",
                  train: bool = False):
        """(B, C, H, W) -> h (encoder features) or z (projection)."""
        x = nchw_to_nhwc(inputs)
        h, ns = self._convnet(params, state, x, train)
        if out == "h":
            return h, ns
        if out != "z":
            raise ValueError(f'"out" can only be "h" or "z", not {out}')
        p, s = params["proj"], state["proj"]
        z = F.linear(p["fc1"], h)
        z, bn1_s = F.batch_norm1d(p["bn1"], s["bn1"], z, train)
        z = F.relu(z)
        z = F.linear(p["fc2"], z)
        z, bn2_s = F.batch_norm1d(p["bn2"], s["bn2"], z, train)
        ns["proj"] = {"bn1": bn1_s, "bn2": bn2_s}
        return z, ns

    def apply(self, params, state, inputs, labels=None, train: bool = False,
              time_matching_mat=None, batch_mask=None):
        """Triplet-loss forward (reference resnet.py:119-126)."""
        z, ns = self.encode_fn(params, state, inputs, out="z", train=train)
        loss, f_pos = self.miner(labels, z)
        losses = {"total_loss": loss}
        if f_pos is not None:
            # the hard-negative miner has no positive-fraction metric
            # (reference losses.py:263 returns None; a constant-zero
            # stand-in would silently disable early stopping on the
            # default 'positive_triplet' monitor)
            losses["positive_triplet"] = f_pos
        return z, losses, ns

    def encode_batched(self, params, state, dataset: np.ndarray,
                       out: str = "z", batch_size: int = 512,
                       mesh=None) -> np.ndarray:
        """Host loop over jitted batched encode (inference path). With a
        mesh, batches are sharded over its ``data`` axis (params replicated)."""
        encode = _encode_project_fn(self, out)
        put = jnp.asarray
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(mesh, P("data"))
            batch_size = max(batch_size, mesh.shape["data"])
            batch_size -= batch_size % mesh.shape["data"]

            def put(b):  # noqa: F811
                # numpy -> sharded buffers directly (no device-0 staging)
                return jax.device_put(b, sh)

        outs = []
        n = len(dataset)
        for i in range(0, n, batch_size):
            batch = dataset[i: i + batch_size]
            if len(batch) < batch_size:
                pad = batch_size - len(batch)
                batch = np.concatenate(
                    [batch, np.zeros((pad,) + batch.shape[1:], batch.dtype)])
            outs.append(np.asarray(encode(params, state,
                                          put(batch.astype(np.float32)))))
        return np.concatenate(outs)[:n]


import functools


@functools.lru_cache(maxsize=16)
def _encode_project_fn(model: "EncodeProject", out: str):
    """Jitted encode cached per (model, out) — avoids retracing a fresh
    lambda on every encode_batched call."""
    return jax.jit(lambda p, s, x: model.encode_fn(p, s, x, out)[0])


@dataclasses.dataclass(frozen=True)
class LogisticRegression:
    """Linear probe (reference resnet.py:129-143)."""
    input_dim: int = 128
    n_class: int = 2

    def init(self, key):
        params = {"linear": {
            "weight": jnp.zeros((self.input_dim, self.n_class)),
            "bias": jnp.zeros((self.n_class,)),
        }}
        return params, {}

    def apply(self, params, state, x, labels=None, train: bool = False,
              **kwargs):
        z = F.linear(params["linear"], x)
        logp = jax.nn.log_softmax(z, axis=-1)
        loss = -jnp.mean(jnp.take_along_axis(logp, labels[:, None],
                                             axis=1))
        acc = jnp.mean((jnp.argmax(z, 1) == labels).astype(jnp.float32))
        return z, {"total_loss": loss, "acc": acc}, state
