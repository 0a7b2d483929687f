#!/usr/bin/env python3
"""Export a reference-trained Keras U-Net to a portable .npz with goldens.

Run this WHERE TENSORFLOW EXISTS (the reference's environment:
tensorflow==2.1, segmentation_models==1.0.1 — reference
requirements/default.txt), pointing it at a ``.h5`` weight file saved by the
reference's ``Segment.save`` (NNsegmentation/models.py:195-197):

    python tools/export_keras_unet.py trained.h5 exported.npz \
        --channels 2 --classes 3 --size 256

The .npz contains every weight keyed ``<layer>/<weight>:0`` plus golden
activations (``golden_input``, ``golden_logits``) computed by the REAL
TensorFlow graph on a seeded input. On the TPU side:

    from dynamorph_tpu.seg.keras_import import (import_keras_unet,
                                                verify_against_golden)
    from dynamorph_tpu.models.unet_keras import KerasUNet
    params, state = import_keras_unet("exported.npz")
    net = KerasUNet()
    verify_against_golden(net, params, state, "exported.npz")

``verify_against_golden`` asserts the JAX reimplementation reproduces the
TF logits on your actual trained weights — the end-to-end migration check.
(dynamorph_tpu.seg.model.Segment.load also reads the raw ``.h5`` directly;
this exporter adds the golden-activation proof.)

This script intentionally has no dynamorph_tpu imports so it can run in
the legacy TF environment untouched.
"""
import argparse

import numpy as np


def build_reference_model(n_channels: int, n_classes: int, size: int):
    """The exact graph of reference NNsegmentation/models.py:73-96."""
    from tensorflow import keras

    keras.backend.set_image_data_format("channels_first")
    import segmentation_models

    inp = keras.layers.Input(shape=(n_channels, size, size), dtype="float32")
    pre = keras.layers.Conv2D(3, (1, 1), activation=None,
                              name="pre_conv")(inp)
    unet = segmentation_models.Unet(
        backbone_name="resnet34",
        input_shape=(3, size, size),
        classes=n_classes,
        activation="linear",
        encoder_weights=None,  # weights come from the .h5
        encoder_features="default",
        decoder_block_type="upsampling",
        decoder_filters=(256, 128, 64, 32, 16),
        decoder_use_batchnorm=True)
    return keras.models.Model(inp, unet(pre))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("weights", help=".h5 weight file from Segment.save")
    ap.add_argument("out", help="output .npz path")
    ap.add_argument("--channels", type=int, default=2)
    ap.add_argument("--classes", type=int, default=3)
    ap.add_argument("--size", type=int, default=256,
                    help="golden input spatial size (multiple of 32)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    model = build_reference_model(args.channels, args.classes, args.size)
    model.load_weights(args.weights)

    out = {}
    for w in model.weights:
        name = w.name if w.name.endswith(":0") else w.name + ":0"
        out[name] = np.asarray(w.numpy(), np.float32)

    rng = np.random.RandomState(args.seed)
    x = rng.rand(2, args.channels, args.size, args.size).astype(np.float32)
    out["golden_input"] = x
    out["golden_logits"] = np.asarray(model.predict(x), np.float32)

    np.savez_compressed(args.out, **out)
    print(f"wrote {len(out) - 2} weights + goldens "
          f"(logits {out['golden_logits'].shape}) to {args.out}")


if __name__ == "__main__":
    main()
