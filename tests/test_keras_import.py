"""Keras .h5 U-Net weight migration (seg/keras_import.py + unet_keras.py).

The reference's exact graph comes from ``segmentation_models==1.0.1``
(+ classification_models), which is not installed here — only its
re-derivation can be tested offline. The strategy:

1. a synthetic weight set in the exact Keras save_weights HDF5 layout
   (layer groups + weight_names attrs, nested sm.Unet model group) written
   with h5py — the same format the reference's ``Segment.save`` emits
   (reference NNsegmentation/models.py:195-197);
2. an INDEPENDENT float64 torch oracle of the Keras graph
   (classification_models ResNet34 pre-activation encoder +
   segmentation_models 1.0.1 upsampling decoder, channels_first) as the
   golden forward;
3. assertions that the importer maps every weight correctly and that
   KerasUNet's jitted forward reproduces the oracle logits.

The remaining unverifiable-offline risk (fidelity of the graph itself to
real segmentation_models) is covered by tools/export_keras_unet.py, which
emits golden activations from the real TF model where the package exists;
``verify_against_golden`` (tested here against the oracle npz) closes that
loop on the user's machine. Individual Keras layer semantics (same-conv
alignment, BN eps placement, upsampling, pad+pool) ARE pinned against live
Keras in test_keras_semantics.py.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

from dynamorph_tpu.models.unet_keras import KerasUNet  # noqa: E402
from dynamorph_tpu.seg.keras_import import (import_keras_unet,  # noqa: E402
                                            read_keras_layer_weights,
                                            verify_against_golden)

_STAGES = ((3, 64), (4, 128), (6, 256), (3, 512))


# -- synthetic keras weight set --------------------------------------------

def make_keras_weights(seed=0, n_channels=2, n_classes=3):
    """{layer: {weight_name_with_:0 : array}} for the full reference graph,
    shapes derived from KerasUNet's pytree, values randomized (BN stats
    away from the 0/1 init so mapping bugs can't hide)."""
    net = KerasUNet(n_channels=n_channels, n_classes=n_classes)
    params, state = jax.jit(net.init)(jax.random.PRNGKey(0))
    rng = np.random.RandomState(seed)
    W = {}
    for name, p in params.items():
        lw = {}
        if "kernel" in p:
            kh, kw, cin, _ = p["kernel"].shape
            # He scaling keeps activations O(1) through the ~40-conv graph
            # (unit-scale random weights overflow f32 by the decoder)
            std = np.sqrt(2.0 / (kh * kw * cin))
            lw["kernel:0"] = (rng.randn(*p["kernel"].shape) * std).astype(
                np.float32)
            if "bias" in p:
                lw["bias:0"] = rng.randn(*p["bias"].shape).astype(
                    np.float32) * 0.1
        else:
            n = p["offset"].shape[0]
            if name != "bn_data":  # scale=False -> no gamma in the file
                lw["gamma:0"] = (rng.rand(n) + 0.5).astype(np.float32)
            lw["beta:0"] = (rng.randn(n) * 0.2).astype(np.float32)
            lw["moving_mean:0"] = (rng.randn(n) * 0.2).astype(np.float32)
            lw["moving_variance:0"] = (rng.rand(n) + 0.5).astype(np.float32)
        W[name] = lw
    return W


def write_keras_h5(path, W, nested_name="model_1", wrap_model_weights=False):
    """Keras save_weights layout: outer layers [input, pre_conv, <unet
    model>]; the nested model is ONE group holding all backbone/decoder
    weights under their layer-scoped names."""
    import h5py

    with h5py.File(path, "w") as f:
        root = f.create_group("model_weights") if wrap_model_weights else f
        root.attrs["layer_names"] = np.array(
            [b"input_1", b"pre_conv", nested_name.encode()])
        g = root.create_group("pre_conv")
        names = [f"pre_conv/{k}" for k in W["pre_conv"]]
        g.attrs["weight_names"] = np.array([n.encode() for n in names])
        for k, v in W["pre_conv"].items():
            g.create_dataset(f"pre_conv/{k}", data=v)
        g2 = root.create_group(nested_name)
        nested = [(f"{layer}/{k}", v) for layer, lw in W.items()
                  if layer != "pre_conv" for k, v in lw.items()]
        g2.attrs["weight_names"] = np.array(
            [n.encode() for n, _ in nested])
        for n, v in nested:
            g2.create_dataset(n, data=v)


# -- independent torch float64 oracle of the keras graph -------------------

def _t(a):
    return torch.tensor(np.asarray(a), dtype=torch.float64)


def _conv(x, lw, stride=1, pad=0):
    w = _t(lw["kernel:0"]).permute(3, 2, 0, 1)  # HWIO -> OIHW
    b = _t(lw["bias:0"]) if "bias:0" in lw else None
    return TF.conv2d(x, w, b, stride=stride, padding=pad)


def _bn(x, lw, eps):
    beta = _t(lw["beta:0"])
    gamma = _t(lw["gamma:0"]) if "gamma:0" in lw else torch.ones_like(beta)
    return TF.batch_norm(x, _t(lw["moving_mean:0"]),
                         _t(lw["moving_variance:0"]), gamma, beta,
                         training=False, eps=eps)


def oracle_logits(W, x_np):
    """pre_conv -> classification_models ResNet34 (pre-activation units,
    'post'-cut unit1 shortcuts, bn_data, trailing bn1+relu, eps 2e-5) ->
    sm 1.0.1 upsampling decoder (eps 1e-3) -> final_conv. channels_first,
    explicit Keras zero-padding."""
    x = _t(x_np)
    h = _conv(x, W["pre_conv"])
    h = _bn(h, W["bn_data"], 2e-5)
    h = _conv(TF.pad(h, (3, 3, 3, 3)), W["conv0"], stride=2)
    relu0 = h = TF.relu(_bn(h, W["bn0"], 2e-5))
    h = TF.max_pool2d(TF.pad(h, (1, 1, 1, 1)), 3, 2)  # ZeroPadding+valid
    skips = {}
    for si, (n_units, _) in enumerate(_STAGES):
        for u in range(n_units):
            base = f"stage{si + 1}_unit{u + 1}_"
            stride = 2 if (u == 0 and si > 0) else 1
            z = TF.relu(_bn(h, W[base + "bn1"], 2e-5))
            if u == 0 and si > 0:
                skips[si] = z  # stage{2,3,4}_unit1_relu1 skip features
            sc = _conv(z, W[base + "sc"], stride=stride) if u == 0 else h
            z = _conv(TF.pad(z, (1, 1, 1, 1)), W[base + "conv1"],
                      stride=stride)
            z = TF.relu(_bn(z, W[base + "bn2"], 2e-5))
            z = _conv(TF.pad(z, (1, 1, 1, 1)), W[base + "conv2"])
            h = z + sc
    h = TF.relu(_bn(h, W["bn1"], 2e-5))
    for i, sk in enumerate([skips[3], skips[2], skips[1], relu0, None]):
        h = TF.interpolate(h, scale_factor=2, mode="nearest")
        if sk is not None:
            h = torch.cat([h, sk], dim=1)
        for half in "ab":
            name = f"decoder_stage{i}{half}"
            h = _conv(h, W[name + "_conv"], pad=1)
            h = TF.relu(_bn(h, W[name + "_bn"], 1e-3))
    return _conv(h, W["final_conv"], pad=1).numpy()


# -- tests ------------------------------------------------------------------

@pytest.fixture(scope="module")
def keras_setup(tmp_path_factory):
    W = make_keras_weights()
    path = str(tmp_path_factory.mktemp("keras") / "weights.h5")
    write_keras_h5(path, W)
    rng = np.random.RandomState(1)
    x = rng.rand(2, 2, 64, 64).astype(np.float32)
    golden = oracle_logits(W, x)
    return W, path, x, golden


def test_h5_reader_roundtrip(keras_setup):
    W, path, _, _ = keras_setup
    layers = read_keras_layer_weights(path)
    assert set(layers) == set(W)
    for layer, lw in W.items():
        for k, v in lw.items():
            np.testing.assert_array_equal(layers[layer][k.split(":")[0]], v)


def test_import_maps_every_weight(keras_setup):
    W, path, _, _ = keras_setup
    params, state = import_keras_unet(path)
    for name, p in params.items():
        lw = W[name]
        if "kernel" in p:
            np.testing.assert_array_equal(p["kernel"], lw["kernel:0"])
            if "bias" in p:
                np.testing.assert_array_equal(p["bias"], lw["bias:0"])
        else:
            if name != "bn_data":
                np.testing.assert_array_equal(p["scale"], lw["gamma:0"])
            else:
                np.testing.assert_array_equal(p["scale"],
                                              np.ones_like(p["scale"]))
            np.testing.assert_array_equal(p["offset"], lw["beta:0"])
            np.testing.assert_array_equal(state[name]["mean"],
                                          lw["moving_mean:0"])
            np.testing.assert_array_equal(state[name]["var"],
                                          lw["moving_variance:0"])


def test_imported_forward_matches_oracle(keras_setup):
    _, path, x, golden = keras_setup
    params, state = import_keras_unet(path)
    net = KerasUNet()
    logits, _ = jax.jit(
        lambda p, s, x: net.apply(p, s, x))(params, state, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(logits), golden,
                               atol=2e-3, rtol=1e-3)


def test_full_model_h5_layout(keras_setup, tmp_path):
    """model.save-style files nest layers under 'model_weights'."""
    W, _, x, golden = keras_setup
    path = str(tmp_path / "full_model.h5")
    write_keras_h5(path, W, nested_name="model_3", wrap_model_weights=True)
    params, state = import_keras_unet(path)
    net = KerasUNet()
    logits, _ = jax.jit(
        lambda p, s, x: net.apply(p, s, x))(params, state, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(logits), golden,
                               atol=2e-3, rtol=1e-3)


def test_segment_load_h5_end_to_end(keras_setup):
    """Segment.load('.h5') switches to the Keras architecture and predicts
    the oracle's softmax probabilities (the reference user's migration
    path: point segmentation_inference.weights at their trained .h5)."""
    from dynamorph_tpu.seg.model import Segment

    W, path, x, golden = keras_setup
    model = Segment(input_shape=(2, 64, 64), n_classes=3)
    model.load(path)
    probs = model.predict(x.reshape(-1, 2, 64, 64))
    assert probs.shape == (2, 3, 1, 64, 64)
    e = np.exp(golden - golden.max(1, keepdims=True))
    want = (e / e.sum(1, keepdims=True))[:, :, None]
    np.testing.assert_allclose(probs, want, atol=2e-3, rtol=1e-3)


def test_exporter_npz_and_goldens(keras_setup, tmp_path):
    """The tools/export_keras_unet.py artifact format: flat weight keys +
    golden activations; verify_against_golden passes on a faithful import
    and fails on corrupted weights."""
    W, _, x, golden = keras_setup
    npz = str(tmp_path / "exported.npz")
    flat = {f"{layer}/{k}": v for layer, lw in W.items()
            for k, v in lw.items()}
    np.savez(npz, golden_input=x, golden_logits=golden, **flat)

    params, state = import_keras_unet(npz)
    net = KerasUNet()
    dev = verify_against_golden(net, params, state, npz, atol=2e-3)
    assert dev < 2e-3

    params["final_conv"]["bias"] = params["final_conv"]["bias"] + 0.5
    with pytest.raises(AssertionError):
        verify_against_golden(net, params, state, npz, atol=2e-3)


def test_import_rejects_missing_and_extra_layers(keras_setup, tmp_path):
    W, _, _, _ = keras_setup
    # missing layer
    W1 = {k: v for k, v in W.items() if k != "stage3_unit2_conv1"}
    p1 = str(tmp_path / "missing.h5")
    write_keras_h5(p1, W1)
    with pytest.raises(ValueError, match="missing layer"):
        import_keras_unet(p1)
    # extra weighted layer (e.g. a multislice checkpoint's post_conv)
    W2 = dict(W)
    W2["post_conv"] = {"kernel:0": np.zeros((1, 1, 96, 32), np.float32)}
    p2 = str(tmp_path / "extra.h5")
    write_keras_h5(p2, W2)
    with pytest.raises(ValueError, match="unexpected"):
        import_keras_unet(p2)
    # wrong class count
    p3 = str(tmp_path / "classes.h5")
    write_keras_h5(p3, W)
    with pytest.raises(ValueError, match="shape mismatch"):
        import_keras_unet(p3, n_classes=4)
