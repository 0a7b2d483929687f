"""U-Net segmentation: model shapes/training, data-pipeline parity vs
reference numpy code, tiled ensemble inference, and the full seg pipeline."""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import REFERENCE_DIR, has_reference

from dynamorph_tpu.models.unet import UNet, weighted_ce_loss
from dynamorph_tpu.seg.data import (generate_ordered_patches,
                                    generate_patches, preprocess)
from dynamorph_tpu.seg.inference import predict_whole_map
from dynamorph_tpu.seg.model import Segment


@pytest.fixture(scope="module")
def tiny_unet():
    net = UNet(n_channels=2, n_classes=3)
    params, state = net.init(jax.random.PRNGKey(0))
    return net, params, state


def test_unet_output_shape(tiny_unet, rng):
    net, params, state = tiny_unet
    x = jnp.asarray(rng.rand(2, 2, 64, 64).astype(np.float32))
    logits, _ = net.apply(params, state, x)
    assert logits.shape == (2, 3, 64, 64)
    probs = net.predict(params, state, x)
    assert probs.shape == (2, 3, 1, 64, 64)
    np.testing.assert_allclose(np.asarray(probs).sum(1), 1.0, atol=1e-5)


def test_weighted_ce_ignores_zero_weight_pixels(rng):
    logits = jnp.asarray(rng.randn(2, 3, 8, 8).astype(np.float32))
    y = np.zeros((2, 4, 8, 8), np.float32)
    y[:, 0] = 1.0          # all true class 0
    y[:, 3] = 0.0          # zero weights -> zero loss
    assert float(weighted_ce_loss(logits, jnp.asarray(y))) == 0.0
    y[:, 3] = 1.0
    assert float(weighted_ce_loss(logits, jnp.asarray(y))) > 0.0


def _scene(rng, size=128, n_frames=2):
    inputs = (rng.rand(n_frames, 2, 1, size, size) * 65535)
    fg = rng.rand(n_frames, 1, 1, size, size) > 0.7
    labels = np.concatenate([1.0 - fg, fg * 0.6, fg * 0.4], axis=1)
    return inputs, labels


def test_generate_patches_shapes(rng):
    inputs, labels = _scene(rng, size=256)
    patches = generate_patches(inputs, labels, n_patches=5, x_size=64,
                               y_size=64, rotate=True, mirror=True, seed=0)
    assert len(patches) == 5
    for X, y in patches:
        assert X.shape == (2, 1, 64, 64)
        assert y.shape == (3, 1, 64, 64)


@pytest.mark.skipif(not has_reference(), reason="no reference checkout")
def test_preprocess_matches_reference(rng):
    sys.path.insert(0, REFERENCE_DIR)
    from NNsegmentation.data import preprocess as ref_preprocess

    inputs, labels = _scene(rng)
    patches = generate_ordered_patches(inputs, labels, x_size=64, y_size=64)
    X, y = preprocess(patches, n_classes=3, label_input="prob")
    Xr, yr = ref_preprocess(patches, n_classes=3, label_input="prob")
    np.testing.assert_allclose(X, Xr)
    np.testing.assert_allclose(y, yr)

    # annotation labels
    ann = (rng.randint(0, 4, size=(len(patches), 1, 1, 64, 64))).astype(int)
    patches_ann = [[p[0], a] for p, a in zip(patches, ann)]
    X, y = preprocess(patches_ann, n_classes=3, label_input="annotation")
    Xr, yr = ref_preprocess(patches_ann, n_classes=3, label_input="annotation")
    np.testing.assert_allclose(X, Xr)
    np.testing.assert_allclose(y, yr)


@pytest.mark.skipif(not has_reference(), reason="no reference checkout")
def test_generate_patches_matches_reference_rng(rng, tmp_path):
    """Seeded random patch generation draws the same crops as the reference."""
    sys.path.insert(0, REFERENCE_DIR)
    from NNsegmentation.data import generate_patches as ref_generate

    inputs, labels = _scene(rng, size=256)
    # the reference only accepts file paths
    np.save(tmp_path / "in.npy", inputs)
    np.save(tmp_path / "lb.npy", labels)
    ours = generate_patches(inputs, labels, n_patches=4, x_size=64, y_size=64,
                            rotate=False, mirror=True, seed=42)
    theirs = ref_generate(str(tmp_path / "in.npy"), str(tmp_path / "lb.npy"),
                          n_patches=4, x_size=64, y_size=64,
                          rotate=False, mirror=True, seed=42)
    for (xo, yo), (xr, yr) in zip(ours, theirs):
        np.testing.assert_allclose(xo, xr)
        np.testing.assert_allclose(yo, yr)


@pytest.mark.skipif(not has_reference(), reason="no reference checkout")
def test_generate_patches_rotate_matches_reference(rng, tmp_path):
    """Rotation-augmented patch generation: same seeded draws + identical
    cv2 warpAffine results as the reference."""
    sys.path.insert(0, REFERENCE_DIR)
    from NNsegmentation.data import generate_patches as ref_generate

    inputs, labels = _scene(rng, size=256)
    np.save(tmp_path / "in.npy", inputs)
    np.save(tmp_path / "lb.npy", labels)
    ours = generate_patches(inputs, labels, n_patches=3, x_size=64, y_size=64,
                            rotate=True, mirror=True, seed=7)
    theirs = ref_generate(str(tmp_path / "in.npy"), str(tmp_path / "lb.npy"),
                          n_patches=3, x_size=64, y_size=64,
                          rotate=True, mirror=True, seed=7)
    for (xo, yo), (xr, yr) in zip(ours, theirs):
        np.testing.assert_allclose(xo, xr)
        np.testing.assert_allclose(yo, yr)


def test_binary_segmentation_gets_background_channel(rng):
    """1-channel masks gain a background channel (reference
    instance_clustering.py:52-53)."""
    from dynamorph_tpu.track.clustering import check_segmentation_dim

    fg = (rng.rand(1, 1, 32, 32) > 0.7).astype(float)
    out = check_segmentation_dim(fg)
    assert out.shape == (2, 1, 32, 32)
    np.testing.assert_allclose(out.sum(0), 1.0)
    np.testing.assert_allclose(out[1], fg[0])


def test_segment_fit_reduces_loss(tmp_path, rng):
    inputs, labels = _scene(rng, size=64)
    patches = generate_ordered_patches(inputs, labels, x_size=32, y_size=32)
    model = Segment(input_shape=(2, 32, 32), n_classes=3,
                    model_path=str(tmp_path))
    history = model.fit(patches, batch_size=4, n_epochs=3,
                        valid_patches=patches[:4])
    assert history[-1]["loss"] < history[0]["loss"]
    assert "val_roc_auc" in history[-1]


def test_lr_plateau_keeps_adam_state_and_compile(tmp_path):
    """ReduceLROnPlateau must only lower the learning rate (Keras
    semantics, reference models.py:66): in-place hyperparam update, no
    step recompile, Adam moments preserved."""
    m = Segment(input_shape=(1, 32, 32), n_classes=3,
                model_path=str(tmp_path))
    opt, step = m._make_step(1e-3)
    st = opt.init(m.params)
    x = jnp.ones((4, 1, 32, 32))
    y = jnp.ones((4, 4, 32, 32))
    p, s, st, _ = step(m.params, m.state, st, x, y)
    assert step._cache_size() == 1
    mu = jax.tree_util.tree_leaves(st.inner_state)[0]
    assert np.any(np.asarray(mu) != 0)
    st.hyperparams["learning_rate"] = jnp.asarray(1e-4, jnp.float32)
    p, s, st2, _ = step(p, s, st, x, y)
    assert step._cache_size() == 1          # no retrace from the lr change
    assert np.any(np.asarray(
        jax.tree_util.tree_leaves(st2.inner_state)[0]) != 0)
    assert abs(float(st2.hyperparams["learning_rate"]) - 1e-4) < 1e-9


def test_predict_whole_map_multislice_multichannel(rng):
    """time_slices>1 with n_channels>1: each tile must reach the model as
    (C, T, x, y) — a blind reshape of the (T, C, ...) stack would
    interleave time into channels (the reference's own time_slices>1 tile
    path is dead code, data.py:283)."""
    import jax.numpy as jnp

    from dynamorph_tpu.core.constants import CHANNEL_MAX
    from dynamorph_tpu.seg.inference import predict_whole_map
    from dynamorph_tpu.seg.model import SegmentWithMultipleSlice

    T, C, S = 4, 2, 3
    model = SegmentWithMultipleSlice(input_shape=(C, S, 32, 32), n_classes=3)
    inputs = (rng.rand(T, C, 1, 64, 64) * 60000).astype(np.float32)
    out = predict_whole_map(inputs, model, use_channels=[0, 1],
                            time_slices=S, n_supp=0)
    assert out.shape == (T - S + 1, 3, 1, 64, 64)
    # cross-check the first tile against a manually-ordered direct forward
    tile = inputs[0:S, :, 0, :32, :32]                  # (S, C, 32, 32)
    x = np.transpose(tile, (1, 0, 2, 3))[None] / CHANNEL_MAX
    probs = np.asarray(model._predict_fn(
        model.params, model.state, jnp.asarray(x, jnp.float32)))[0]
    np.testing.assert_allclose(out[0][..., :32, :32], probs,
                               rtol=1e-5, atol=1e-6)


def test_segment_fit_device_resident_matches_streaming(tmp_path, rng,
                                                       monkeypatch):
    """fit()'s device-resident dataset path (upload once, gather per batch)
    must produce the same training trajectory as host streaming."""
    import dynamorph_tpu.seg.model as seg_model

    inputs, labels = _scene(rng, size=64)
    patches = generate_ordered_patches(inputs, labels, x_size=32, y_size=32)

    m1 = Segment(input_shape=(2, 32, 32), n_classes=3,
                 model_path=str(tmp_path / "res"))
    h1 = m1.fit(patches, batch_size=4, n_epochs=2, valid_patches=patches[:4])

    monkeypatch.setattr(seg_model, "_DEVICE_RESIDENT_BUDGET", 0)
    m2 = Segment(input_shape=(2, 32, 32), n_classes=3,
                 model_path=str(tmp_path / "str"))
    h2 = m2.fit(patches, batch_size=4, n_epochs=2, valid_patches=patches[:4])

    for a, b in zip(h1, h2):
        assert abs(a["loss"] - b["loss"]) < 1e-5
        assert abs(a["val_loss"] - b["val_loss"]) < 1e-4


def test_predict_whole_map_merging(tmp_path, rng):
    """Tiled inference covers the full frame and ensemble passes average."""
    inputs, _ = _scene(rng, size=128, n_frames=1)
    model = Segment(input_shape=(2, 64, 64), n_classes=3,
                    model_path=str(tmp_path))
    out = predict_whole_map(inputs, model, n_supp=2,
                            rng=np.random.RandomState(0))
    assert out.shape == (1, 3, 1, 128, 128)
    assert (out > -1).all()  # every pixel was predicted
    np.testing.assert_allclose(out.sum(1), 1.0, atol=1e-4)


def test_predict_whole_map_direct_mode(tmp_path, rng):
    """Whole-frame single-pass mode: correct shape, valid probabilities, and
    interior agreement with the tile containing it (same conv weights)."""
    inputs, _ = _scene(rng, size=64, n_frames=1)
    model = Segment(input_shape=(2, 32, 32), n_classes=3,
                    model_path=str(tmp_path))
    out = predict_whole_map(inputs, model, mode="direct")
    assert out.shape == (1, 3, 1, 64, 64)
    np.testing.assert_allclose(out.sum(1), 1.0, atol=1e-4)
    # BN is spatially global, so direct-mode equals a "tile" the size of the
    # whole frame: run the frame through model.predict directly and compare.
    whole = model.__class__(input_shape=(2, 64, 64), n_classes=3,
                            model_path=str(tmp_path / "w"))
    whole.params, whole.state = model.params, model.state
    # both inference modes scale intensities by CHANNEL_MAX; Segment.predict
    # on a raw ndarray does not (reference contract), so prescale here
    ref = whole.predict(inputs.astype(np.float32) / 65535.0)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_segment_save_load_roundtrip(tmp_path, rng):
    model = Segment(input_shape=(2, 32, 32), n_classes=3,
                    model_path=str(tmp_path / "m"))
    x = rng.rand(1, 2, 1, 32, 32).astype(np.float32)
    before = model.predict(x)
    model.save(str(tmp_path / "ck"))
    model2 = Segment(input_shape=(2, 32, 32), n_classes=3,
                     model_path=str(tmp_path / "m2"), seed=123)
    model2.load(str(tmp_path / "ck"))
    after = model2.predict(x)
    np.testing.assert_allclose(before, after, atol=1e-6)


def test_multislice_tiled_predict_shapes(tmp_path, rng):
    """2.5-D tiled inference: _predict_tiles must accept the 4-D
    (c, z, x, y) multislice input_shape (regression: a shape assert built
    from input_shape[1:] broke SegmentWithMultipleSlice)."""
    from dynamorph_tpu.seg.inference import predict_whole_map
    from dynamorph_tpu.seg.model import SegmentWithMultipleSlice

    model = SegmentWithMultipleSlice(input_shape=(1, 3, 64, 64),
                                     n_classes=3)
    # 3 consecutive TIME slices feed the model's z axis (stack Z = 1)
    inputs = (rng.rand(4, 1, 1, 128, 128) * 60000).astype(np.uint16)
    out = predict_whole_map(inputs, model, use_channels=[0],
                            n_supp=1, time_slices=3)
    # (T - (slices-1), n_classes, 1, X_full, Y_full)
    assert out.shape == (2, 3, 1, 128, 128)
    np.testing.assert_allclose(out.sum(1), 1.0, rtol=1e-4)


# -- 2.5-D SplitSlice/MergeSlices golden parity -----------------------------
# Numpy oracles transcribing the reference's reshape layers EXACTLY
# (NNsegmentation/layers.py:18-48 and :51-86): SplitSlice permutes
# (B, C, Z, X, Y) -> (B, Z, C, X, Y) then folds Z into batch; MergeSlices
# unfolds (B*Z, F, X, Y) -> (B, Z, F, X, Y) and flattens Z into channels.

def split_slice_np(x, n_channels, x_size, y_size):
    _x = np.transpose(x, (0, 2, 1, 3, 4))
    return _x.reshape(-1, n_channels, x_size, y_size)


def merge_slices_np(x, n_slice, n_channel):
    b = x.shape[0] // n_slice
    _x = x.reshape(b, n_slice, n_channel, x.shape[2], x.shape[3])
    return _x.reshape(b, n_slice * n_channel, x.shape[2], x.shape[3])


def test_split_merge_slice_oracle_semantics():
    """Slot-tagged values pin WHERE each (b, c, z) element lands:
    split -> out[b*Z + z, c] == in[b, c, z];
    merge -> out[b, z*F + f] == in[b*Z + z, f]."""
    B, C, Z, X, Y = 2, 3, 4, 2, 2
    x = np.zeros((B, C, Z, X, Y))
    for b in range(B):
        for c in range(C):
            for z in range(Z):
                x[b, c, z] = 100 * b + 10 * c + z
    s = split_slice_np(x, C, X, Y)
    assert s.shape == (B * Z, C, X, Y)
    for b in range(B):
        for z in range(Z):
            for c in range(C):
                assert np.all(s[b * Z + z, c] == 100 * b + 10 * c + z)
    F = 5
    f_in = np.zeros((B * Z, F, X, Y))
    for r in range(B * Z):
        for f in range(F):
            f_in[r, f] = 100 * r + f
    m = merge_slices_np(f_in, Z, F)
    assert m.shape == (B, Z * F, X, Y)
    for b in range(B):
        for z in range(Z):
            for f in range(F):
                assert np.all(m[b, z * F + f] == 100 * (b * Z + z) + f)


def test_multislice_model_matches_slice_oracle(rng):
    """SegmentWithMultipleSlice's folded forward must equal the reference
    graph computed explicitly: SplitSlice oracle -> the model's own U-Net on
    the flat batch -> MergeSlices oracle -> post_conv(1x1, relu) ->
    pred_head(1x1) (reference models.py:227-253). Catches any silent Z/C
    transposition in the folding."""
    from dynamorph_tpu.seg.model import SegmentWithMultipleSlice

    C, Z, XS, F = 2, 3, 32, 8
    model = SegmentWithMultipleSlice(input_shape=(C, Z, XS, XS),
                                     n_classes=3, unet_feat=F)
    x = rng.rand(2, C, Z, XS, XS).astype(np.float32)
    got, _ = model._apply_logits(model.params, model.state,
                                 jnp.asarray(x), train=False)

    flat = split_slice_np(x, C, XS, XS)                     # (B*Z, C, X, Y)
    feats, _ = model.net.apply(model.params, model.state,
                               jnp.asarray(flat), train=False)
    merged = merge_slices_np(np.asarray(feats), Z, F)       # (B, Z*F, X, Y)

    def conv1x1(p, h):
        k = np.asarray(p["kernel"])[0, 0]                   # (in, out)
        out = np.einsum("bixy,io->boxy", h, k)
        if "bias" in p:
            out = out + np.asarray(p["bias"])[None, :, None, None]
        return out

    h = np.maximum(conv1x1(model.params["post_conv"], merged), 0.0)
    want = conv1x1(model.params["pred_head"], h)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_multislice_fit_predict_end_to_end(tmp_path, rng):
    """Seeded 2.5-D fit + predict: loss decreases on a synthetic multislice
    set whose signal lives in ONE slice, and predict returns normalized
    probabilities (reference multislice training path, models.py:206-258)."""
    from dynamorph_tpu.seg.model import SegmentWithMultipleSlice

    C, Z, XS = 2, 3, 32
    patches = []
    for i in range(8):
        x = rng.rand(C, Z, XS, XS).astype(np.float32) * 0.1 * 65535
        lab = np.zeros((3, 1, XS, XS), np.float32)
        blob = np.zeros((XS, XS), bool)
        cy, cx = rng.randint(8, XS - 8, 2)
        yy, xx = np.mgrid[:XS, :XS]
        blob = (yy - cy) ** 2 + (xx - cx) ** 2 < 6 ** 2
        x[0, 1][blob] = 0.9 * 65535                # signal only in slice 1
        lab[1, 0][blob] = 1.0
        lab[0, 0][~blob] = 1.0
        patches.append((x, lab))
    model = SegmentWithMultipleSlice(input_shape=(C, Z, XS, XS),
                                     n_classes=3, unet_feat=8,
                                     model_path=str(tmp_path))
    hist = model.fit(patches, batch_size=4, n_epochs=3)
    assert hist[-1]["loss"] < hist[0]["loss"]
    probs = model.predict(np.stack([p[0] for p in patches[:2]]) / 65535.0)
    assert probs.shape == (2, 3, 1, XS, XS)
    np.testing.assert_allclose(probs.sum(1), 1.0, rtol=1e-4)
