"""Segment: the segmentation model wrapper (fit / predict / save / load).

Behavioral spec: reference NNsegmentation/models.py:32-203 (Keras). TPU-native
training: jitted optax Adam step on the weighted-CE logits loss, with
ReduceLROnPlateau / TerminateOnNaN / per-epoch checkpoints mirroring the
reference's callbacks (models.py:65-67), and ROC-AUC/F1 validation metrics
(layers.py:118-143).
"""
from __future__ import annotations

import os
import tempfile
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.unet import UNet, weighted_ce_loss
from ..train.checkpoint import restore_checkpoint, save_checkpoint
from .data import preprocess

# fit() keeps the training set in HBM across epochs up to this many bytes
# (v5e: 16 GB HBM; leave room for params, optimizer moments, activations)
_DEVICE_RESIDENT_BUDGET = 4 * 1024**3


class Segment:
    """U-Net semantic segmentation model (reference NNsegmentation/models.py:32).

    Args:
        input_shape: (c, x, y) like the reference's channels-first input spec.
        n_classes: number of prediction classes.
        model_path: directory for checkpoints (a temp dir if omitted).
        encoder_weights: optional pretrained resnet34 encoder init — a
            torchvision-format state_dict ({name: array} dict or a path to a
            torch checkpoint). Mirrors the reference's
            Unet('resnet34', encoder_weights='imagenet')
            (NNsegmentation/models.py:80-82).
    """

    def __init__(self, input_shape=(2, 256, 256), n_classes: int = 3,
                 freeze_encoder: bool = False, model_path: Optional[str] = None,
                 seed: int = 0, encoder_weights=None, **kwargs):
        self.input_shape = tuple(input_shape)
        self.n_channels = self.input_shape[0]
        self.x_size, self.y_size = self.input_shape[-2:]
        self.n_classes = n_classes
        self.freeze_encoder = freeze_encoder
        self.model_path = model_path or tempfile.mkdtemp()
        # jit the whole init: eager init would launch one tiny device program
        # per layer (dozens of round-trips on remote-compile setups)
        self.params, self.state = jax.jit(self._init_net)(
            jax.random.PRNGKey(seed))
        if encoder_weights is not None:
            self._load_encoder_weights(encoder_weights)
        self._predict_fn = jax.jit(self._predict_impl)
        self._lr = 1e-3  # keras Adam default

    def _load_encoder_weights(self, encoder_weights) -> None:
        """Overlay a torchvision-format resnet34 state_dict onto the UNet
        encoder subtrees (stem + layer1..4), leaving pre_conv/decoder/head
        at their random init."""
        from ..models.torch_import import (import_resnet34_encoder,
                                           load_state_dict_numpy)

        sd = (encoder_weights if isinstance(encoder_weights, dict)
              else load_state_dict_numpy(encoder_weights))
        enc_p, enc_s = import_resnet34_encoder(sd)
        self.params = {**self.params, **enc_p}
        self.state = {**self.state, **enc_s}

    # -- overridable network definition --------------------------------
    def _init_net(self, key):
        self.net = UNet(n_channels=self.n_channels, n_classes=self.n_classes)
        return self.net.init(key)

    def _apply_logits(self, params, state, x, train):
        """x: (B,) + input_shape -> ((B, n_classes, x, y) logits, new_state)."""
        return self.net.apply(params, state, x, train=train)

    def _predict_impl(self, params, state, x):
        logits, _ = self._apply_logits(params, state, x, train=False)
        probs = jax.nn.softmax(logits, axis=1)
        return probs[:, :, None]

    # ------------------------------------------------------------------
    def _make_step(self, lr):
        # inject_hyperparams makes the learning rate part of opt_state, so
        # ReduceLROnPlateau can lower it WITHOUT re-initialising Adam's
        # moments/step count (the Keras callback only scales lr,
        # reference models.py:66) and without recompiling the step
        optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=lr)

        def loss_fn(params, state, x, y):
            logits, new_state = self._apply_logits(params, state, x,
                                                   train=True)
            return weighted_ce_loss(logits, y), new_state

        @jax.jit
        def step(params, state, opt_state, x, y):
            from ..models.unet_keras import KerasUNet, encoder_layer_names

            (loss, new_state), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, state, x, y)
            if self.freeze_encoder:
                enc_keys = set(encoder_layer_names()) \
                    if isinstance(self.net, KerasUNet) \
                    else {"stem", "layer1", "layer2", "layer3", "layer4"}
                grads = {k: (jax.tree_util.tree_map(jnp.zeros_like, v)
                             if k in enc_keys else v)
                         for k, v in grads.items()}
            if isinstance(self.net, KerasUNet):
                # bn_data is Keras BatchNormalization(scale=False): gamma is
                # fixed at 1 in the reference graph (not a trainable weight),
                # so fine-tuning must never update it
                grads = dict(grads, bn_data=dict(
                    grads["bn_data"],
                    scale=jnp.zeros_like(grads["bn_data"]["scale"])))
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_state, opt_state, loss

        return optimizer, step

    def fit(self, patches, label_input: str = "prob", batch_size: int = 8,
            n_epochs: int = 10, valid_patches=None,
            valid_label_input: str = "prob", class_weights=None,
            seed: int = 0, **kwargs) -> List[dict]:
        """Train on input-label pairs (reference models.py:98-156)."""
        os.makedirs(self.model_path, exist_ok=True)
        X, y = preprocess(patches, n_classes=self.n_classes,
                          label_input=label_input, class_weights=class_weights)
        X = X.reshape((-1,) + self.input_shape).astype(np.float32)
        y = y.reshape((-1, self.n_classes + 1, self.x_size,
                       self.y_size)).astype(np.float32)
        assert X.shape[0] == y.shape[0]

        valid = None
        if valid_patches is not None:
            vX, vy = preprocess(valid_patches, n_classes=self.n_classes,
                                label_input=valid_label_input)
            valid = (vX.reshape((-1,) + self.input_shape).astype(np.float32),
                     vy.reshape((-1, self.n_classes + 1, self.x_size,
                                 self.y_size)).astype(np.float32))

        optimizer, step = self._make_step(self._lr)
        opt_state = optimizer.init(self.params)
        lr_scale = 1.0
        best_val, plateau = np.inf, 0
        history = []
        rng = np.random.RandomState(seed)
        n = X.shape[0]
        # Keep the dataset device-resident across epochs when it fits: the
        # host-streaming loop re-uploads all of X/y every epoch (as the
        # keras reference does each fit pass, models.py:98-156); resident,
        # only a per-batch int32 index vector travels and batches gather on
        # device. Numerics identical (gather is exact, same draw order).
        vbytes = 0 if valid is None else valid[0].nbytes + valid[1].nbytes
        resident = (X.nbytes + y.nbytes + vbytes) <= _DEVICE_RESIDENT_BUDGET
        if resident:
            X_src, y_src = jax.device_put(X), jax.device_put(y)
            # one program per batch shape (full + remainder), NOT per
            # offset — slicing a device array at distinct starts would
            # compile a fresh program each (static slice starts)
            gather = jax.jit(lambda xs, ys, b: (jnp.take(xs, b, axis=0),
                                                jnp.take(ys, b, axis=0)))
            if valid is not None:
                valid = (jax.device_put(valid[0]), jax.device_put(valid[1]))
        from ..io.prefetch import AsyncWriter

        saver = AsyncWriter(depth=1)
        try:
            for epoch in range(n_epochs):
                order = rng.permutation(n)
                # losses accumulate on device; one host fetch per epoch (a
                # per-batch float() would sync device->host every step)
                loss_sum, n_b = None, 0
                for i in range(0, n, batch_size):
                    bids = order[i: i + batch_size]
                    if resident:
                        xb, yb = gather(X_src, y_src,
                                        jnp.asarray(bids.astype(np.int32)))
                    else:
                        xb, yb = jnp.asarray(X[bids]), jnp.asarray(y[bids])
                    self.params, self.state, opt_state, loss = step(
                        self.params, self.state, opt_state, xb, yb)
                    loss_sum = loss if loss_sum is None else loss_sum + loss
                    n_b += 1
                epoch_loss = float(loss_sum) / n_b
                if not np.isfinite(epoch_loss):  # TerminateOnNaN (per epoch)
                    print("NaN loss encountered, terminating training")
                    return history
                rec = {"epoch": epoch, "loss": epoch_loss}
                if valid is not None:
                    rec.update(self._validate(valid))
                    # ReduceLROnPlateau(patience=5, min_lr=1e-7)
                    if rec["val_loss"] < best_val - 1e-12:
                        best_val, plateau = rec["val_loss"], 0
                    else:
                        plateau += 1
                        if plateau >= 5 and self._lr * lr_scale > 1e-7:
                            lr_scale *= 0.1
                            # lower lr in place: moments, step count and
                            # the compiled step all survive (Keras
                            # ReduceLROnPlateau semantics)
                            opt_state.hyperparams["learning_rate"] = \
                                jnp.asarray(max(self._lr * lr_scale, 1e-7),
                                            jnp.float32)
                            plateau = 0
                    # per-epoch checkpoint on the writer thread: the device
                    # buffers are immutable snapshots (the next epoch binds
                    # NEW param arrays), so fetching them later is safe and
                    # the fetch + disk write overlap the next epoch
                    saver.submit(save_checkpoint,
                                 os.path.join(self.model_path,
                                              "weights.%02d-%.2f"
                                              % (epoch, rec["val_loss"])),
                                 {"params": self.params,
                                  "state": self.state})
                history.append(rec)
                print(f"epoch {epoch}: " +
                      "  ".join(f"{k}:{v:.4f}" for k, v in rec.items()
                                if k != "epoch"))
        finally:
            saver.close()
            # the cached ground-truth mask pins the (possibly
            # device-resident) validation arrays — release with the fit
            self._val_true_cache = None
        return history

    def _val_batch_fn(self):
        """Jitted per-batch validation program, cached on the instance:
        weighted-CE SUM (so batches of unequal size combine into the exact
        global mean) + raw class-0 LOGITS — the reference's ValidMetrics
        ranks/thresholds the linear-activation output, not a softmax
        probability (layers.py:131-136, models.py:83). Only (B, H, W)
        floats and a scalar leave the device."""
        fn = getattr(self, "_val_fn", None)
        if fn is None:
            def _val_batch(p, s, x, y):
                logits, _ = self._apply_logits(p, s, x, False)
                w = y[:, -1]
                lab = y[:, :-1]
                logp = jax.nn.log_softmax(logits, axis=1)
                ce = -jnp.sum(lab * logp, axis=1) * w
                return jnp.sum(ce), logits[:, 0]

            fn = self._val_fn = jax.jit(_val_batch)
        return fn

    def _validate(self, valid) -> dict:
        from sklearn.metrics import f1_score, roc_auc_score

        vX, vy = valid
        on_device = not isinstance(vX, np.ndarray)
        val_fn = self._val_batch_fn()
        ce_sum, preds = None, []
        for i in range(0, len(vX), 8):
            if on_device:
                # gather with an uploaded index vector: slicing a device
                # array at distinct starts compiles a program per offset
                idx = jnp.asarray(np.arange(i, min(i + 8, len(vX)),
                                            dtype=np.int32))
                xb = jnp.take(vX, idx, axis=0)
                yb = jnp.take(vy, idx, axis=0)
            else:
                xb = jnp.asarray(vX[i: i + 8])
                yb = jnp.asarray(vy[i: i + 8])
            s, p0 = val_fn(self.params, self.state, xb, yb)
            ce_sum = s if ce_sum is None else ce_sum + s
            preds.append(np.asarray(p0))
        y_pred = np.concatenate(preds)
        val_loss = float(ce_sum) / y_pred.size
        # ground-truth mask is constant across epochs: fetch/compute once
        # per validation set (keyed on the array fit() holds alive)
        cached = getattr(self, "_val_true_cache", None)
        if cached is None or cached[0] is not vy:
            cached = (vy, np.asarray(vy[:, 0] > 0.5))
            self._val_true_cache = cached
        y_true = cached[1]
        try:
            roc = roc_auc_score(y_true.flatten(), y_pred.flatten())
            f1 = f1_score(y_true.flatten(), y_pred.flatten() > 0.5)
        except ValueError:  # single-class validation batch
            roc, f1 = float("nan"), float("nan")
        return {"val_loss": val_loss, "val_roc_auc": float(roc),
                "val_f1": float(f1)}

    # ------------------------------------------------------------------
    def predict(self, patches, label_input: str = "prob") -> np.ndarray:
        """(B, n_classes, 1, x, y) softmax probabilities
        (reference models.py:159-182)."""
        if isinstance(patches, list):
            X, _ = preprocess(patches, label_input=label_input)
            X = X.reshape((-1,) + self.input_shape)
        elif isinstance(patches, np.ndarray):
            X = patches.reshape((-1,) + self.input_shape)
        else:
            raise ValueError("Input format not supported")
        y = self._predict_fn(self.params, self.state,
                             jnp.asarray(X, jnp.float32))
        y = np.asarray(y)
        assert y.shape[1:] == (self.n_classes, 1, self.x_size, self.y_size)
        return y

    def save(self, path: str) -> None:
        save_checkpoint(path, {"params": self.params, "state": self.state})

    def load(self, path: str) -> None:
        """Load weights: orbax checkpoints (native), or reference-trained
        Keras ``.h5``/``.hdf5`` weight files (NNsegmentation/models.py:
        200-202) — the latter switch the network to the Keras-architecture
        U-Net (models/unet_keras.py) and import weight-for-weight via
        seg/keras_import.py, so reference users' trained segmentation
        models migrate without retraining."""
        from .keras_import import is_keras_weight_file

        if is_keras_weight_file(path):
            from ..models.unet_keras import KerasUNet
            from .keras_import import import_keras_unet

            self.net = KerasUNet(n_channels=self.n_channels,
                                 n_classes=self.n_classes)
            self.params, self.state = import_keras_unet(
                path, n_channels=self.n_channels, n_classes=self.n_classes)
            # retrace against the new network/pytree structure
            self._predict_fn = jax.jit(self._predict_impl)
            return
        ck = restore_checkpoint(path)
        self.params, self.state = ck["params"], ck["state"]

    @property
    def batch_input_shape(self):
        return tuple([-1] + list(self.input_shape))


class SegmentWithMultipleSlice(Segment):
    """2.5-D segmentation: multiple z/time slices per sample.

    Behavioral spec: reference NNsegmentation/models.py:206-258 — z slices
    fold into the batch dimension through the shared U-Net (SplitSlice),
    outputs merge back to channels (MergeSlices), then
    post_conv(1x1, relu) + pred_head(1x1, linear).

    input_shape is 4-D (c, z, x, y).
    """

    def __init__(self, unet_feat: int = 32, **kwargs):
        self.unet_feat = unet_feat
        super().__init__(**kwargs)
        self.n_slices = self.input_shape[1]

    def _init_net(self, key):
        from ..nn import functional as F

        self.net = UNet(n_channels=self.n_channels, n_classes=self.unet_feat)
        k1, k2, k3 = jax.random.split(key, 3)
        params, state = self.net.init(k1)
        n_slices = self.input_shape[1]
        params["post_conv"] = F.init_conv(
            k2, 1, 1, n_slices * self.unet_feat, self.unet_feat)
        params["pred_head"] = F.init_conv(
            k3, 1, 1, self.unet_feat, self.n_classes)
        return params, state

    def load(self, path: str) -> None:
        """Load weights: orbax checkpoints (native), or reference-trained
        2.5-D Keras ``.h5`` files (NNsegmentation/models.py:206-258) — the
        latter switch the body to the Keras-architecture U-Net and import
        the shared body (classes=unet_feat) plus the post_conv/pred_head
        1x1 heads weight-for-weight (seg/keras_import.py), so reference
        users' trained multislice models migrate without retraining."""
        from .keras_import import is_keras_weight_file

        if is_keras_weight_file(path):
            from ..models.unet_keras import KerasUNet
            from .keras_import import (import_keras_unet_multislice,
                                       multislice_dims_from_file,
                                       read_keras_layer_weights)

            # parse the .h5 ONCE and thread the layers dict through the
            # dims probe and the importer (a ~100 MB reference checkpoint
            # would otherwise be read and materialized three times)
            layers = read_keras_layer_weights(path)
            fc, fz, ff, fk = multislice_dims_from_file(path, layers=layers)
            if (fc, fz, fk) != (self.n_channels, self.n_slices,
                                self.n_classes):
                raise ValueError(
                    f"{path} encodes (n_channels, n_slices, n_classes)="
                    f"{(fc, fz, fk)} but this model was built with "
                    f"{(self.n_channels, self.n_slices, self.n_classes)}")
            self.unet_feat = ff
            self.net = KerasUNet(n_channels=self.n_channels,
                                 n_classes=self.unet_feat)
            self.params, self.state = import_keras_unet_multislice(
                path, layers=layers)
            # retrace against the new network/pytree structure
            self._predict_fn = jax.jit(self._predict_impl)
            return
        super().load(path)

    def _apply_logits(self, params, state, x, train):
        from ..nn import functional as F
        from ..models.common import nchw_to_nhwc, nhwc_to_nchw

        b, c, z, xs, ys = x.shape
        # SplitSlice: (B, C, Z, X, Y) -> (B*Z, C, X, Y)
        flat = jnp.transpose(x, (0, 2, 1, 3, 4)).reshape(-1, c, xs, ys)
        feats, new_state = self.net.apply(params, state, flat, train=train)
        # MergeSlices: (B*Z, F, X, Y) -> (B, Z*F, X, Y)
        merged = feats.reshape(b, z * self.unet_feat, xs, ys)
        h = nchw_to_nhwc(merged)
        h = F.relu(F.conv2d(params["post_conv"], h, 1, 0))
        logits = F.conv2d(params["pred_head"], h, 1, 0)
        return nhwc_to_nchw(logits), new_state
