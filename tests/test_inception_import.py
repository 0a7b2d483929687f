"""InceptionResNetV2 baseline port (models/inception_resnet_v2.py).

Reference: HiddenStateExtractor/naive_imagenet.py:47-60
(``initiate_model_inception`` — dead code upstream, ported for baseline
completeness). Unlike the U-Net migration (whose oracle is hand-built
because segmentation_models is not installed), TensorFlow/Keras IS present
in this environment, so the oracle here is the REAL
``keras.applications.InceptionResNetV2``: the test seeds its weights,
writes them in the legacy .h5 layout the pretrained files use, imports
them into the JAX graph, and pins feature parity against the live Keras
forward.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamorph_tpu.models.inception_resnet_v2 import (
    InceptionResNetV2, import_keras_inception_resnet_v2)

tf = pytest.importorskip("tensorflow")

_SIZE = 96  # keras minimum is 75; 96 keeps the block8 grid 2x2 (non-trivial)


def _seed_weights(model, seed=0):
    """Randomize a Keras model's weights reproducibly: He kernels, small
    beta/bias, moving stats away from the 0/1 init so mapping bugs can't
    hide behind identity BNs."""
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
        else:  # beta / bias / moving_mean
            new.append((rng.randn(*shape) * 0.1).astype(np.float32))
    model.set_weights(new)


def _write_legacy_h5(model, path, rename=None):
    """Write the model's weights in the legacy Keras HDF5 layout the
    distributed InceptionResNetV2 files use: one group per layer, datasets
    at ``<layer>/<weight>:0``."""
    import h5py

    rename = rename or (lambda n: n)
    with h5py.File(path, "w") as f:
        for layer in model.layers:
            if not layer.weights:
                continue
            name = rename(layer.name)
            g = f.create_group(name)
            for w in layer.weights:
                g.create_dataset(f"{name}/{w.name}:0", data=w.numpy())


@pytest.fixture(scope="module")
def keras_irv2(tmp_path_factory):
    from keras.applications import InceptionResNetV2 as KerasIRV2

    model = KerasIRV2(weights=None, include_top=False, pooling="avg",
                      input_shape=(_SIZE, _SIZE, 3))
    _seed_weights(model)
    path = str(tmp_path_factory.mktemp("irv2") / "weights.h5")
    _write_legacy_h5(model, path)
    rng = np.random.RandomState(1)
    x = (rng.rand(2, _SIZE, _SIZE, 3).astype(np.float32)) * 2 - 1
    golden = np.asarray(model(x))  # (2, 1536) pooled features
    return model, path, x, golden


def test_import_matches_real_keras(keras_irv2):
    """The imported JAX forward reproduces the live Keras model's pooled
    features — weights, layer order, residual scales, pool semantics and
    BN epsilon all verified in one shot through the full 244-conv graph."""
    _, path, x, golden = keras_irv2
    net, params, state = import_keras_inception_resnet_v2(path)
    feats, _ = jax.jit(lambda p, s, x: net.apply(p, s, x))(
        params, state, jnp.asarray(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(feats), golden,
                               atol=2e-3, rtol=1e-3)


def test_import_handles_offset_numbering(keras_irv2, tmp_path):
    """Weight files saved from a session that built other models first have
    offset auto-numbered layer names (conv2d_244, ...); the importer maps
    positionally by sorted suffix, so the result is identical."""
    model, _, x, golden = keras_irv2

    def shift(name):
        for prefix in ("conv2d", "batch_normalization"):
            if name == prefix:
                return f"{prefix}_250"
            if name.startswith(prefix + "_"):
                tail = name[len(prefix) + 1:]
                if tail.isdigit():
                    return f"{prefix}_{int(tail) + 250}"
        return name

    path = str(tmp_path / "offset.h5")
    _write_legacy_h5(model, path, rename=shift)
    net, params, state = import_keras_inception_resnet_v2(path)
    feats, _ = jax.jit(lambda p, s, x: net.apply(p, s, x))(
        params, state, jnp.asarray(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(feats), golden,
                               atol=2e-3, rtol=1e-3)


def test_import_rejects_wrong_architecture(keras_irv2, tmp_path):
    import h5py
    import shutil

    _, path, _, _ = keras_irv2
    # missing named layer (dropping auto-numbered ones instead would shift
    # the positional renumbering and surface as a shape mismatch — also a
    # rejection, but test the clearer path)
    bad = str(tmp_path / "missing.h5")
    with h5py.File(path, "r") as src, h5py.File(bad, "w") as dst:
        for k in src.keys():
            if k != "conv_7b":
                src.copy(k, dst)
    with pytest.raises(ValueError, match="missing layer"):
        import_keras_inception_resnet_v2(bad)
    # extra weighted layer beyond the allowed 'predictions'
    extra = str(tmp_path / "extra.h5")
    shutil.copy(path, extra)
    with h5py.File(extra, "a") as f:
        g = f.create_group("decoder_stage0a_conv")
        g.create_dataset("decoder_stage0a_conv/kernel:0",
                         data=np.zeros((3, 3, 4, 4), np.float32))
    with pytest.raises(ValueError, match="unexpected"):
        import_keras_inception_resnet_v2(extra)


def test_initiate_model_inception_offline():
    """analysis.imagenet_baseline.initiate_model_inception runs with no
    weight file (random init) and extract_features yields pooled 1536-d
    features per channel — the working equivalent of the reference's dead
    predict flow (naive_imagenet.py:88-129)."""
    from dynamorph_tpu.analysis.imagenet_baseline import (
        extract_features, initiate_model_inception)

    model, params, state = initiate_model_inception()
    rng = np.random.RandomState(0)
    patches = rng.randint(0, 65535, (3, 2, 32, 32)).astype(np.float64)
    feats = extract_features(patches, model, params, state, cs=(0, 1),
                             size=_SIZE, mode="inception")
    assert feats.shape == (3, 2, 1536)
    assert np.all(np.isfinite(feats))
