"""InceptionResNetV2 trunk — the reference's second ImageNet baseline.

Behavioral spec: reference HiddenStateExtractor/naive_imagenet.py:47-60
(``initiate_model_inception``) builds
``keras_applications.inception_resnet_v2.InceptionResNetV2(include_top=False,
pooling='avg')`` as a 1536-d pooled feature extractor over single-cell
patches. (The reference's surrounding ``predict`` flow is dead code —
naive_imagenet.py:121 appends to an undefined ``ys`` — and
``initiate_model_inception`` itself has no call site; this port exists so a
reference user's baseline-comparison workflow has a working equivalent.)

This module implements the exact keras_applications graph natively in JAX
(NHWC inside, channels-first at the API boundary like the rest of the
package):

- stem: five valid/same convs + two valid 3x3/s2 max-pools -> 192 ch;
- mixed_5b (Inception-A, 4 branches incl. a count-exclude-padding same
  average pool) -> 320 ch;
- 10x block35 residual blocks (scale 0.17), mixed_6a reduction -> 1088 ch;
- 20x block17 blocks (scale 0.10, 1x7/7x1 factorized convs), mixed_7a
  reduction -> 2080 ch;
- 9x block8 blocks (scale 0.20) + 1 final block8 (scale 1.0, no
  activation), conv_7b -> 1536 ch, optional global average pool.

Every conv except the residual up-projections is Conv2D(use_bias=False) +
BatchNormalization(scale=False, eps=1e-3) + ReLU; the per-block
``<block>_conv`` up-projections carry a bias and no BN.

Params/state are FLAT dicts keyed by the Keras layer names of a
fresh-session build ('conv2d', 'conv2d_1', ..., 'batch_normalization_N',
'block35_1_conv', 'conv_7b', ...): the auto-numbered names follow source
creation order, which is deterministic, so ``import_keras_inception_resnet_v2``
maps a real weight file positionally even when its numbering starts at an
offset (weights saved from a session that built other models first).
"""
from __future__ import annotations

import dataclasses
import re
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..nn import functional as F
from .common import nchw_to_nhwc, nhwc_to_nchw

# keras_applications: every BatchNormalization(axis, scale=False) uses the
# Keras defaults eps=1e-3, momentum=0.99 (= torch-convention 0.01 — imported
# moving stats must keep moving at the rate they were trained with).
_BN_EPS = 1e-3
_BN_MOMENTUM = 0.01

_BLOCK_REPEATS = {"block35": 10, "block17": 20, "block8": 10}
_BLOCK_SCALES = {"block35": 0.17, "block17": 0.10, "block8": 0.20}


def _max_pool_3x3_s2_valid(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (0, 0), (0, 0), (0, 0)))


def _avg_pool_3x3_s1_same(x):
    """Keras/TF AveragePooling2D(3, 1, 'same'): the mean excludes padding
    (each output divides by the number of IN-BOUNDS window elements)."""
    pad = ((0, 0), (1, 1), (1, 1), (0, 0))
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add,
                              (1, 3, 3, 1), (1, 1, 1, 1), pad)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    n = jax.lax.reduce_window(ones, 0.0, jax.lax.add,
                              (1, 3, 3, 1), (1, 1, 1, 1), pad)
    return s / n


class _ApplyCtx:
    """conv2d_bn in apply mode: reads params/state, collects new BN state."""

    def __init__(self, params, state, ns, train):
        self.params, self.state, self.ns, self.train = params, state, ns, train
        self.n_auto = 0

    def _names(self, name):
        if name is not None:
            return name, name + "_bn"
        i = self.n_auto
        self.n_auto += 1
        return (("conv2d", "batch_normalization") if i == 0
                else (f"conv2d_{i}", f"batch_normalization_{i}"))

    def conv_bn(self, x, filters, kernel, strides=1, padding="same",
                activation="relu", use_bias=False, name=None):
        del filters  # determined by the stored kernel
        kh, kw = (kernel, kernel) if isinstance(kernel, int) else kernel
        cname, bname = self._names(name)
        pad = (kh // 2, kw // 2) if padding == "same" else (0, 0)
        x = F.conv2d(self.params[cname], x, strides, pad)
        if not use_bias:
            x, self.ns[bname] = F.batch_norm(
                self.params[bname], self.state[bname], x, self.train,
                momentum=_BN_MOMENTUM, eps=_BN_EPS)
        if activation == "relu":
            x = F.relu(x)
        return x


class _InitCtx(_ApplyCtx):
    """conv2d_bn in init mode: creates params/state as shapes flow through
    (run under jax.eval_shape — no FLOPs; values come from a numpy RNG so
    init never builds a device program)."""

    def __init__(self, rng: np.random.RandomState, params, state):
        super().__init__(params, state, ns={}, train=False)
        self.rng = rng

    def conv_bn(self, x, filters, kernel, strides=1, padding="same",
                activation="relu", use_bias=False, name=None):
        kh, kw = (kernel, kernel) if isinstance(kernel, int) else kernel
        cin = x.shape[-1]
        # peek the upcoming names; the delegated apply advances the counter
        if name is not None:
            cname, bname = name, name + "_bn"
        else:
            i = self.n_auto
            cname, bname = ("conv2d", "batch_normalization") if i == 0 \
                else (f"conv2d_{i}", f"batch_normalization_{i}")
        limit = np.sqrt(6.0 / (kh * kw * cin + kh * kw * filters))
        p = {"kernel": self.rng.uniform(
            -limit, limit, (kh, kw, cin, filters)).astype(np.float32)}
        if use_bias:
            p["bias"] = np.zeros((filters,), np.float32)
        self.params[cname] = p
        if not use_bias:
            # scale=False everywhere: gamma fixed at ones (absent from
            # Keras weight files; the importer leaves it untouched).
            # Plain numpy (not F.init_batch_norm): jnp constants created
            # under the init eval_shape trace would become tracers.
            self.params[bname] = {"scale": np.ones((filters,), np.float32),
                                  "offset": np.zeros((filters,), np.float32)}
            self.state[bname] = {"mean": np.zeros((filters,), np.float32),
                                 "var": np.ones((filters,), np.float32)}
        # re-run the real apply path so shapes keep flowing
        return _ApplyCtx.conv_bn(self, x, filters, kernel, strides, padding,
                                 activation, use_bias, name)


@dataclasses.dataclass(frozen=True)
class InceptionResNetV2:
    """keras_applications InceptionResNetV2, include_top=False.

    ``apply`` takes (B, 3, H, W) inputs preprocessed to [-1, 1] (the Keras
    ``preprocess_input`` 'tf' mode, reference naive_imagenet.py:60) with
    H, W >= 75, and returns (features, new_state): (B, 1536) pooled for
    ``pooling='avg'`` or the (B, 1536, H', W') map for ``pooling=None``.
    """
    pooling: Optional[str] = "avg"
    # Migrated weights default to float32 like KerasUNet: the reference's
    # TF inference ran f32, and bf16 error compounds through ~240 convs.
    precision: Optional[str] = "float32"

    def init(self, key) -> Tuple[dict, dict]:
        """Random (glorot-uniform, the Keras default) init with the exact
        shapes/names the .h5 import fills. ``key`` is a jax PRNGKey or int
        seed; values come from numpy, so init compiles nothing."""
        seed = int(np.asarray(jax.random.key_data(key)).ravel()[-1]) \
            if not isinstance(key, (int, np.integer)) else int(key)
        rng = np.random.RandomState(seed % (2 ** 32))
        params: Dict[str, dict] = {}
        state: Dict[str, dict] = {}
        ctx = _InitCtx(rng, params, state)
        jax.eval_shape(
            lambda x: self._forward(ctx, x),
            jax.ShapeDtypeStruct((1, 96, 96, 3), jnp.float32))
        return params, state

    # -- graph ------------------------------------------------------------
    def _block(self, ctx, x, btype, idx, scale, activation="relu"):
        """One Inception-ResNet residual block (keras_applications
        ``inception_resnet_block``): branches -> concat -> 1x1 biased
        up-projection (no BN) -> x + scale*up -> optional ReLU."""
        cb = ctx.conv_bn
        if btype == "block35":
            b0 = cb(x, 32, 1)
            b1 = cb(cb(x, 32, 1), 32, 3)
            b2 = cb(cb(cb(x, 32, 1), 48, 3), 64, 3)
            branches = [b0, b1, b2]
        elif btype == "block17":
            b0 = cb(x, 192, 1)
            b1 = cb(cb(cb(x, 128, 1), 160, (1, 7)), 192, (7, 1))
            branches = [b0, b1]
        else:  # block8
            b0 = cb(x, 192, 1)
            b1 = cb(cb(cb(x, 192, 1), 224, (1, 3)), 256, (3, 1))
            branches = [b0, b1]
        mixed = jnp.concatenate(branches, axis=-1)
        up = cb(mixed, x.shape[-1], 1, activation=None, use_bias=True,
                name=f"{btype}_{idx}_conv")
        x = x + scale * up
        if activation == "relu":
            x = F.relu(x)
        return x

    def _forward(self, ctx, x):
        cb = ctx.conv_bn
        # stem -> 192 ch at (H-30)/4-ish (all valid convs/pools)
        x = cb(x, 32, 3, strides=2, padding="valid")
        x = cb(x, 32, 3, padding="valid")
        x = cb(x, 64, 3)
        x = _max_pool_3x3_s2_valid(x)
        x = cb(x, 80, 1, padding="valid")
        x = cb(x, 192, 3, padding="valid")
        x = _max_pool_3x3_s2_valid(x)
        # mixed_5b -> 320
        b0 = cb(x, 96, 1)
        b1 = cb(cb(x, 48, 1), 64, 5)
        b2 = cb(cb(cb(x, 64, 1), 96, 3), 96, 3)
        bp = cb(_avg_pool_3x3_s1_same(x), 64, 1)
        x = jnp.concatenate([b0, b1, b2, bp], axis=-1)
        for i in range(1, 11):
            x = self._block(ctx, x, "block35", i, 0.17)
        # mixed_6a -> 1088
        b0 = cb(x, 384, 3, strides=2, padding="valid")
        b1 = cb(cb(cb(x, 256, 1), 256, 3), 384, 3, strides=2,
                padding="valid")
        x = jnp.concatenate([b0, b1, _max_pool_3x3_s2_valid(x)], axis=-1)
        for i in range(1, 21):
            x = self._block(ctx, x, "block17", i, 0.10)
        # mixed_7a -> 2080
        b0 = cb(cb(x, 256, 1), 384, 3, strides=2, padding="valid")
        b1 = cb(cb(x, 256, 1), 288, 3, strides=2, padding="valid")
        b2 = cb(cb(cb(x, 256, 1), 288, 3), 320, 3, strides=2,
                padding="valid")
        x = jnp.concatenate([b0, b1, b2, _max_pool_3x3_s2_valid(x)], axis=-1)
        for i in range(1, 10):
            x = self._block(ctx, x, "block8", i, 0.20)
        x = self._block(ctx, x, "block8", 10, 1.0, activation=None)
        return cb(x, 1536, 1, name="conv_7b")

    # -- public -----------------------------------------------------------
    def apply(self, params, state, inputs, train: bool = False):
        """(B, 3, H, W) in [-1, 1] -> (features, new_state)."""
        if self.precision is not None:
            with jax.default_matmul_precision(self.precision):
                return self._apply(params, state, inputs, train)
        return self._apply(params, state, inputs, train)

    def _apply(self, params, state, inputs, train):
        ns: Dict[str, dict] = {}
        ctx = _ApplyCtx(params, state, ns, train)
        h = self._forward(ctx, nchw_to_nhwc(inputs))
        if self.pooling == "avg":
            return jnp.mean(h, axis=(1, 2)), ns
        return nhwc_to_nchw(h), ns

    def encode_batched(self, params, state, dataset: np.ndarray,
                       out: str = "h", batch_size: int = 128,
                       mesh=None) -> np.ndarray:
        """Host loop over the jitted pooled-feature forward (drop-in for
        EncodeProject.encode_batched so analysis.imagenet_baseline's
        ``extract_features`` drives either trunk). With a mesh, batches are
        sharded over its ``data`` axis (params replicated)."""
        if out != "h":
            raise ValueError("InceptionResNetV2 only extracts pooled "
                             "features (out='h')")
        encode = _irv2_encode_fn(self)
        put = jnp.asarray
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            sh = NamedSharding(mesh, P("data"))
            batch_size = max(batch_size, mesh.shape["data"])
            batch_size -= batch_size % mesh.shape["data"]

            def put(b):  # noqa: F811
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


import functools  # noqa: E402


@functools.lru_cache(maxsize=4)
def _irv2_encode_fn(model: "InceptionResNetV2"):
    """Jitted forward cached per model instance (never rebuild jit closures
    per call — the remote-compile relay recompiles each new closure)."""
    return jax.jit(lambda p, s, x: model.apply(p, s, x)[0])


# -- Keras .h5 weight import ------------------------------------------------

_AUTO_RE = re.compile(r"(conv2d|batch_normalization)(?:_(\d+))?$")
# weighted layers a with-top keras file carries beyond the notop graph
_TOP_ONLY = {"predictions"}


def _canonical_auto_names(layers: Dict[str, dict]) -> Dict[str, str]:
    """Map a weight file's auto-numbered conv/BN layer names to the
    fresh-session canonical numbering this module uses. Keras auto-names
    follow creation order with a session-global counter, so files saved
    after other models were built are offset (conv2d_244, ...) — sorting by
    suffix restores the positional correspondence."""
    out = {}
    for prefix in ("conv2d", "batch_normalization"):
        names = []
        for n in layers:
            m = _AUTO_RE.fullmatch(n)
            if m and m.group(1) == prefix:
                names.append((int(m.group(2)) if m.group(2) else -1, n))
        names.sort()
        for i, (_, n) in enumerate(names):
            out[n] = prefix if i == 0 else f"{prefix}_{i}"
    return out


def import_keras_inception_resnet_v2(path: str, pooling: str = "avg"
                                     ) -> Tuple["InceptionResNetV2",
                                                dict, dict]:
    """Load keras_applications InceptionResNetV2 weights (legacy ``.h5``
    layout, as distributed for the reference's baseline path, or an ``.npz``
    of ``<layer>/<weight>:0`` keys) into (model, params, state).

    Every expected layer must be present with matching shapes; a with-top
    file's ``predictions`` dense layer is ignored, any other extra weighted
    layer is rejected (wrong-architecture guard)."""
    from ..seg.keras_import import read_keras_layer_weights

    net = InceptionResNetV2(pooling=pooling)
    params, state = net.init(0)
    raw = read_keras_layer_weights(path)
    rename = _canonical_auto_names(raw)
    layers = {rename.get(k, k): v for k, v in raw.items()}
    seen = set()

    def take(layer, wname, expect_shape):
        if layer not in layers:
            raise ValueError(f"{path} is missing layer '{layer}' — not an "
                             "InceptionResNetV2 weight file?")
        if wname not in layers[layer]:
            raise ValueError(f"layer '{layer}' has no weight '{wname}' "
                             f"(found {sorted(layers[layer])})")
        arr = layers[layer][wname].astype(np.float32)
        if tuple(arr.shape) != tuple(expect_shape):
            raise ValueError(f"shape mismatch for {layer}/{wname}: file has "
                             f"{arr.shape}, model expects "
                             f"{tuple(expect_shape)}")
        seen.add(layer)
        return arr

    for name, p in params.items():
        if "kernel" in p:
            p["kernel"] = take(name, "kernel", p["kernel"].shape)
            if "bias" in p:
                p["bias"] = take(name, "bias", p["bias"].shape)
        else:  # BatchNormalization(scale=False): no gamma in the file
            p["offset"] = take(name, "beta", p["offset"].shape)
            s = state[name]
            s["mean"] = take(name, "moving_mean", s["mean"].shape)
            s["var"] = take(name, "moving_variance", s["var"].shape)

    extra = {n for n, w in layers.items() if w} - seen - _TOP_ONLY
    if extra:
        raise ValueError(f"{path} has unexpected weighted layers "
                         f"{sorted(extra)[:5]} — not an InceptionResNetV2 "
                         "notop weight file")
    return net, params, state
