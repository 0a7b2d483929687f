"""Rebuild the reference's saved U-Net graph with PLAIN tf.keras layers.

The reference saves ``pre_conv(1x1, C->3)`` feeding
``segmentation_models.Unet('resnet34', decoder_block_type='upsampling')``
(reference NNsegmentation/models.py:73-96, sm==1.0.1) — but
segmentation_models itself is not installable offline. This module
reconstructs that exact graph (layer names, topology, BN epsilons) from raw
``keras.layers`` so the ``.h5`` importer (seg/keras_import.py) can be
validated against a LIVE whole-graph Keras oracle: build, seed weights,
``write_legacy_h5``, import, compare logits (tests/test_keras_live_unet.py).

The graph is built channels_LAST (TF-CPU cannot run channels_first convs);
that changes nothing about the weight file: Keras conv kernels are always
(kh, kw, in, out) and BN vectors are per-channel, so the saved layout is
identical to the reference's channels_first files.

Layer names / structure mirror models/unet_keras.py (the JAX graph), which
documents the sm-1.0.1 sources line by line.
"""
from __future__ import annotations

import numpy as np

# ResNet34 stage spec, matching models/unet_keras.py::_STAGES
_STAGES = ((3, 64), (4, 128), (6, 256), (3, 512))
_ENC_EPS = 2e-5
_DEC_EPS = 1e-3


def build_sm_unet(n_channels: int = 2, n_classes: int = 3,
                  decoder_filters=(256, 128, 64, 32, 16)):
    """The 2-D Segment graph: pre_conv + classification_models-ResNet34
    encoder + sm-Unet 'upsampling' decoder, exact layer names
    (reference NNsegmentation/models.py:73-96)."""
    import keras
    from keras import layers as L

    inp = keras.Input(shape=(None, None, n_channels))
    x = L.Conv2D(3, 1, name="pre_conv")(inp)
    x = L.BatchNormalization(scale=False, epsilon=_ENC_EPS,
                             name="bn_data")(x)
    x = L.ZeroPadding2D(3)(x)
    x = L.Conv2D(64, 7, strides=2, padding="valid", use_bias=False,
                 name="conv0")(x)
    x = L.BatchNormalization(epsilon=_ENC_EPS, name="bn0")(x)
    relu0 = x = L.Activation("relu", name="relu0")(x)
    x = L.ZeroPadding2D(1)(x)
    x = L.MaxPooling2D(3, strides=2, padding="valid", name="pooling0")(x)

    skips = {}
    for si, (n_units, ch) in enumerate(_STAGES):
        for u in range(n_units):
            base = f"stage{si + 1}_unit{u + 1}_"
            stride = 2 if (u == 0 and si > 0) else 1
            h = L.BatchNormalization(epsilon=_ENC_EPS,
                                     name=base + "bn1")(x)
            h = L.Activation("relu", name=base + "relu1")(h)
            if u == 0 and si > 0:
                skips[si] = h  # sm encoder skip: stage{2,3,4}_unit1_relu1
            if u == 0:
                # 'post' cut: the 1x1 shortcut consumes the BN-ReLU'd tensor
                shortcut = L.Conv2D(ch, 1, strides=stride, padding="valid",
                                    use_bias=False, name=base + "sc")(h)
            else:
                shortcut = x
            h = L.ZeroPadding2D(1)(h)
            h = L.Conv2D(ch, 3, strides=stride, padding="valid",
                         use_bias=False, name=base + "conv1")(h)
            h = L.BatchNormalization(epsilon=_ENC_EPS,
                                     name=base + "bn2")(h)
            h = L.Activation("relu", name=base + "relu2")(h)
            h = L.ZeroPadding2D(1)(h)
            h = L.Conv2D(ch, 3, padding="valid", use_bias=False,
                         name=base + "conv2")(h)
            x = L.Add(name=base + "add")([h, shortcut])
    x = L.BatchNormalization(epsilon=_ENC_EPS, name="bn1")(x)
    x = L.Activation("relu", name="relu1")(x)

    skip_order = [skips[3], skips[2], skips[1], relu0, None]
    for i, (f_out, skip) in enumerate(zip(decoder_filters, skip_order)):
        x = L.UpSampling2D(2, name=f"decoder_stage{i}_upsampling")(x)
        if skip is not None:
            x = L.Concatenate(name=f"decoder_stage{i}_concat")([x, skip])
        for half in ("a", "b"):
            name = f"decoder_stage{i}{half}"
            x = L.Conv2D(f_out, 3, padding="same", use_bias=False,
                         name=name + "_conv")(x)
            x = L.BatchNormalization(epsilon=_DEC_EPS, name=name + "_bn")(x)
            x = L.Activation("relu", name=name + "_relu")(x)
    logits = L.Conv2D(n_classes, 3, padding="same", name="final_conv")(x)
    return keras.Model(inp, logits)


def build_multislice_heads(n_slices: int, unet_feat: int, n_classes: int):
    """The 2.5-D head graph AFTER MergeSlices: post_conv(1x1, relu) +
    pred_head(1x1, linear) (reference NNsegmentation/models.py:252-253).
    Input: (B, H, W, Z*unet_feat) merged features, channels_last."""
    import keras
    from keras import layers as L

    inp = keras.Input(shape=(None, None, n_slices * unet_feat))
    h = L.Conv2D(unet_feat, 1, activation="relu", name="post_conv")(inp)
    out = L.Conv2D(n_classes, 1, activation=None, name="pred_head")(h)
    return keras.Model(inp, out)


def seed_weights(model, seed: int = 0) -> None:
    """Randomize a Keras model's weights reproducibly: He kernels, small
    beta/bias, moving stats away from the 0/1 init so a weight-mapping bug
    cannot hide behind an identity BN."""
    rng = np.random.RandomState(seed)
    new = []
    for w in model.weights:
        shape = tuple(w.shape)
        if w.name == "kernel":
            fan_in = int(np.prod(shape[:-1]))
            new.append((rng.randn(*shape) * np.sqrt(2.0 / fan_in)
                        ).astype(np.float32))
        elif w.name == "moving_variance":
            new.append((rng.rand(*shape) + 0.5).astype(np.float32))
        elif w.name == "gamma":
            new.append((rng.rand(*shape) * 0.5 + 0.75).astype(np.float32))
        else:  # beta / bias / moving_mean
            new.append((rng.randn(*shape) * 0.1).astype(np.float32))
    model.set_weights(new)


def write_legacy_h5(models, path: str, nest_under: str = None) -> None:
    """Write one or more Keras models' weights in the legacy Keras-2 HDF5
    layout the reference's ``save_weights`` produced: one root group per
    layer, datasets at ``<layer>/<weight>:0``.

    ``nest_under``: emulate the reference's nested-model indirection (the
    sm.Unet is ONE layer of the outer model, so its layer paths carry a
    session-dependent model-name prefix, e.g. ``model_1/<layer>/<w>:0`` —
    seg/keras_import.py flattens by the last two path components)."""
    import h5py

    if not isinstance(models, (list, tuple)):
        models = [models]
    with h5py.File(path, "w") as f:
        for model in models:
            for layer in model.layers:
                if not layer.weights:
                    continue
                name = layer.name
                if nest_under:
                    # exact Keras-2 nested layout: one group for the inner
                    # model, datasets at <inner_layer>/<weight>:0 inside it
                    g = f.require_group(nest_under)
                else:
                    g = f.require_group(name)
                for w in layer.weights:
                    g.create_dataset(f"{name}/{w.name}:0", data=w.numpy())
