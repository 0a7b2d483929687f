"""LIVE whole-graph `.h5` migration goldens (VERDICT r4 items 3 + 4).

The importer's prior end-to-end checks ran against a float64 torch oracle
of the sm-1.0.1 graph plus per-op live-Keras pins (test_keras_import.py,
test_keras_semantics.py). Here the oracle is a REAL tf.keras model: the
exact reference graph rebuilt from raw keras.layers with the reference's
layer names (tools/live_keras_unet.py — reference NNsegmentation/
models.py:73-96 for 2-D, :206-258 for the 2.5-D multislice variant),
weights seeded, saved in the legacy .h5 layout, imported, and the JAX
forward compared against the live TF forward — logits AND argmax classes.

Tolerances: the seeded random weights drive activations to O(10^2-10^3)
through the 40-conv pre-activation graph, so absolute logit deviations are
float32-accumulation-scaled; asserts are relative to the golden magnitude
(measured ~3e-6 relative) plus exact-class agreement.
"""
import numpy as np
import pytest

import jax

tf = pytest.importorskip("tensorflow")

from tools.live_keras_unet import (build_multislice_heads, build_sm_unet,
                                   seed_weights,
                                   write_legacy_h5)  # noqa: E402

_SIZE = 64  # multiple of 32 (KerasUNet constraint), small enough for TF-CPU


def _rel_dev(got, want):
    return np.max(np.abs(got - want)) / max(1.0, float(np.max(np.abs(want))))


@pytest.fixture(scope="module")
def live_2d(tmp_path_factory):
    model = build_sm_unet(n_channels=2, n_classes=3)
    seed_weights(model, seed=0)
    path = str(tmp_path_factory.mktemp("live2d") / "weights.h5")
    write_legacy_h5(model, path)
    rng = np.random.RandomState(1)
    x = rng.rand(2, _SIZE, _SIZE, 2).astype(np.float32)
    golden = np.asarray(model(x, training=False))   # (B, H, W, K)
    return model, path, x, golden


def test_2d_whole_graph_live_golden(live_2d):
    """import_keras_unet reproduces the live tf.keras forward through the
    full 94-weighted-layer graph: weights, layer order, skip wiring, BN
    epsilons, padding geometry all verified in one shot."""
    from dynamorph_tpu.models.unet_keras import KerasUNet
    from dynamorph_tpu.seg.keras_import import import_keras_unet

    _, path, x, golden = live_2d
    net = KerasUNet(n_channels=2, n_classes=3)
    params, state = import_keras_unet(path, n_channels=2, n_classes=3)
    got, _ = jax.jit(lambda p, s, x: net.apply(p, s, x))(
        params, state, x.transpose(0, 3, 1, 2))
    got = np.asarray(got).transpose(0, 2, 3, 1)
    assert _rel_dev(got, golden) < 1e-4
    assert np.mean(got.argmax(-1) == golden.argmax(-1)) > 0.999


def test_2d_nested_model_layout(live_2d, tmp_path):
    """The reference wraps the sm.Unet as ONE layer of the outer model, so
    its weight paths carry a session-dependent model-name prefix
    (``model_1/<layer>/<w>:0``); the importer flattens by the last two
    path components and must produce the same tree."""
    from dynamorph_tpu.seg.keras_import import import_keras_unet

    model, flat_path, _, _ = live_2d
    nested = str(tmp_path / "nested.h5")
    write_legacy_h5(model, nested, nest_under="model_1")
    p1, s1 = import_keras_unet(flat_path, n_channels=2, n_classes=3)
    p2, s2 = import_keras_unet(nested, n_channels=2, n_classes=3)
    jax.tree_util.tree_map(np.testing.assert_array_equal, (p1, s1), (p2, s2))


def test_verify_against_golden_live(live_2d, tmp_path):
    """verify_against_golden passes on a live-TF golden file and its new
    argmax-agreement gate catches a class-flipping import that the scalar
    logit tolerance alone would need to be huge to see."""
    from dynamorph_tpu.models.unet_keras import KerasUNet
    from dynamorph_tpu.seg.keras_import import (import_keras_unet,
                                                verify_against_golden)

    _, path, x, golden = live_2d
    gpath = str(tmp_path / "golden.npz")
    np.savez(gpath, golden_input=x.transpose(0, 3, 1, 2),
             golden_logits=golden.transpose(0, 3, 1, 2))
    net = KerasUNet(n_channels=2, n_classes=3)
    params, state = import_keras_unet(path, n_channels=2, n_classes=3)
    # atol scaled to the seeded goldens' O(700) logit range (~3e-6 relative)
    dev = verify_against_golden(net, params, state, gpath, atol=1e-2)
    assert dev < 1e-2
    # flip two output classes of the head: every predicted pixel of those
    # classes flips while logit SETS stay identical per pixel
    flipped = {**params, "final_conv": {
        "kernel": params["final_conv"]["kernel"][..., [1, 0, 2]],
        "bias": params["final_conv"]["bias"][[1, 0, 2]]}}
    with pytest.raises(AssertionError, match="class"):
        verify_against_golden(net, flipped, state, gpath,
                              atol=np.inf)


# -- 2.5-D multislice migration ---------------------------------------------

_Z, _FEAT, _K = 2, 16, 3


@pytest.fixture(scope="module")
def live_multislice(tmp_path_factory):
    body = build_sm_unet(n_channels=2, n_classes=_FEAT)
    seed_weights(body, seed=2)
    heads = build_multislice_heads(_Z, _FEAT, _K)
    seed_weights(heads, seed=3)
    path = str(tmp_path_factory.mktemp("live25d") / "multislice.h5")
    write_legacy_h5([body, heads], path)

    rng = np.random.RandomState(4)
    x = rng.rand(2, 2, _Z, _SIZE, _SIZE).astype(np.float32)  # (B,C,Z,X,Y)
    # live-TF oracle of the full 2.5-D forward (reference models.py:227-253):
    # SplitSlice fold -> shared U-Net -> MergeSlices -> heads
    b = x.shape[0]
    flat = x.transpose(0, 2, 1, 3, 4).reshape(-1, 2, _SIZE, _SIZE)
    feats = np.asarray(body(flat.transpose(0, 2, 3, 1), training=False))
    feats = feats.transpose(0, 3, 1, 2)               # (B*Z, F, X, Y)
    merged = feats.reshape(b, _Z * _FEAT, _SIZE, _SIZE)
    golden = np.asarray(heads(merged.transpose(0, 2, 3, 1),
                              training=False))        # (B, X, Y, K)
    golden = golden.transpose(0, 3, 1, 2)             # (B, K, X, Y)
    return path, x, golden


def test_multislice_import_matches_live_tf(live_multislice):
    from dynamorph_tpu.seg.model import SegmentWithMultipleSlice

    path, x, golden = live_multislice
    model = SegmentWithMultipleSlice(input_shape=(2, _Z, _SIZE, _SIZE),
                                     n_classes=_K, unet_feat=_FEAT)
    model.load(path)
    logits, _ = jax.jit(
        lambda p, s, x: model._apply_logits(p, s, x, False))(
            model.params, model.state, x)
    logits = np.asarray(logits)
    assert _rel_dev(logits, golden) < 1e-4
    assert np.mean(logits.argmax(1) == golden.argmax(1)) > 0.999
    # predict() keeps the reference output contract (B, K, 1, X, Y)
    probs = model.predict(x)
    assert probs.shape == (2, _K, 1, _SIZE, _SIZE)
    np.testing.assert_allclose(probs.sum(1), 1.0, atol=1e-5)


def test_multislice_dims_inferred_from_file(live_multislice):
    from dynamorph_tpu.seg.keras_import import (import_keras_unet_multislice,
                                                multislice_dims_from_file)

    path, _, _ = live_multislice
    assert multislice_dims_from_file(path) == (2, _Z, _FEAT, _K)
    params, state = import_keras_unet_multislice(path)
    assert params["post_conv"]["kernel"].shape == (1, 1, _Z * _FEAT, _FEAT)
    assert params["pred_head"]["kernel"].shape == (1, 1, _FEAT, _K)
    with pytest.raises(ValueError, match="encodes"):
        import_keras_unet_multislice(path, n_slices=_Z + 1)


def test_2d_importer_rejects_multislice_with_hint(live_multislice):
    from dynamorph_tpu.seg.keras_import import import_keras_unet

    path, _, _ = live_multislice
    with pytest.raises(ValueError, match="SegmentWithMultipleSlice"):
        import_keras_unet(path, n_channels=2, n_classes=_FEAT)


def test_multislice_load_rejects_mismatched_model(live_multislice):
    from dynamorph_tpu.seg.model import SegmentWithMultipleSlice

    path, _, _ = live_multislice
    model = SegmentWithMultipleSlice(input_shape=(2, _Z + 2, _SIZE, _SIZE),
                                     n_classes=_K, unet_feat=_FEAT)
    with pytest.raises(ValueError, match="n_slices|encodes"):
        model.load(path)
