"""Pin our JAX primitives against LIVE Keras layer semantics.

The Keras-graph reimplementations (models/unet_keras.py,
models/inception_resnet_v2.py) assert specific Keras layer behaviors —
'same' conv alignment, BatchNormalization(scale=False) epsilon placement,
UpSampling2D nearest replication, ZeroPadding2D+MaxPooling 'valid'
equivalence, AveragePooling2D('same') padding exclusion. The full-graph
parity tests (test_keras_import.py's float64 torch oracle,
test_inception_import.py's live-Keras oracle) cover them end-to-end; this
module isolates each primitive against the real Keras layer so a semantics
drift is attributed to the exact op, not a 244-conv diff.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

tf = pytest.importorskip("tensorflow")
import keras  # noqa: E402

from dynamorph_tpu.nn import functional as F  # noqa: E402


def _nhwc(rng, shape):
    return rng.rand(*shape).astype(np.float32)


@pytest.fixture()
def rng():
    return np.random.RandomState(0)


def test_conv2d_same_matches_keras(rng):
    """Keras Conv2D(padding='same', stride 1) == F.conv2d(pad=k//2) for odd
    kernels, including the asymmetric 1x7/7x1 factorized shapes."""
    for kh, kw in [(3, 3), (5, 5), (1, 7), (7, 1), (1, 3), (3, 1)]:
        x = _nhwc(rng, (2, 9, 9, 4))
        layer = keras.layers.Conv2D(5, (kh, kw), padding="same")
        want = np.asarray(layer(x))
        k, b = layer.get_weights()
        got = F.conv2d({"kernel": jnp.asarray(k), "bias": jnp.asarray(b)},
                       jnp.asarray(x), 1, (kh // 2, kw // 2))
        np.testing.assert_allclose(np.asarray(got), want,
                                   atol=1e-5, rtol=1e-5, err_msg=f"{kh}x{kw}")


def test_conv2d_valid_stride2_matches_keras(rng):
    x = _nhwc(rng, (2, 11, 11, 3))
    layer = keras.layers.Conv2D(4, 3, strides=2, padding="valid",
                                use_bias=False)
    want = np.asarray(layer(x))
    (k,) = layer.get_weights()
    got = F.conv2d({"kernel": jnp.asarray(k)}, jnp.asarray(x), 2, 0)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)


def test_batch_norm_scale_false_inference(rng):
    """BatchNormalization(scale=False) at inference: gamma fixed at 1, our
    eps sits inside the sqrt exactly like Keras'."""
    x = _nhwc(rng, (2, 5, 5, 6))
    layer = keras.layers.BatchNormalization(scale=False, epsilon=1e-3)
    layer.build(x.shape)
    beta = rng.randn(6).astype(np.float32) * 0.2
    mean = rng.randn(6).astype(np.float32) * 0.1
    var = (rng.rand(6) + 0.5).astype(np.float32)
    layer.set_weights([beta, mean, var])
    want = np.asarray(layer(x, training=False))
    got, _ = F.batch_norm(
        {"scale": jnp.ones(6), "offset": jnp.asarray(beta)},
        {"mean": jnp.asarray(mean), "var": jnp.asarray(var)},
        jnp.asarray(x), train=False, eps=1e-3)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)


def test_upsampling2d_nearest(rng):
    from dynamorph_tpu.models.unet import _upsample2x

    x = _nhwc(rng, (2, 4, 5, 3))
    want = np.asarray(keras.layers.UpSampling2D(2)(x))  # default 'nearest'
    got = _upsample2x(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(got), want)


def test_zeropad_maxpool_equals_padded_reduce_window(rng):
    """ZeroPadding2D(1) + MaxPooling2D(3, 2, 'valid') on non-negative
    inputs == our -inf-padded 3x3/s2 pool (unet_keras.py stem)."""
    from dynamorph_tpu.models.unet import _max_pool_3x3_s2

    x = np.maximum(_nhwc(rng, (2, 8, 8, 3)) - 0.2, 0.0)  # post-ReLU-like
    want = np.asarray(keras.layers.MaxPooling2D(3, 2, padding="valid")(
        keras.layers.ZeroPadding2D(1)(x)))
    got = _max_pool_3x3_s2(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=0, rtol=0)


def test_maxpool_valid(rng):
    from dynamorph_tpu.models.inception_resnet_v2 import \
        _max_pool_3x3_s2_valid

    x = _nhwc(rng, (2, 9, 9, 3))
    want = np.asarray(keras.layers.MaxPooling2D(3, 2, padding="valid")(x))
    got = _max_pool_3x3_s2_valid(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(got), want)


def test_avgpool_same_excludes_padding(rng):
    """Keras AveragePooling2D(3, 1, 'same') divides by the in-bounds window
    count, not 9 — the mixed_5b branch-pool semantics."""
    from dynamorph_tpu.models.inception_resnet_v2 import _avg_pool_3x3_s1_same

    x = _nhwc(rng, (2, 7, 7, 3))
    want = np.asarray(keras.layers.AveragePooling2D(3, 1, padding="same")(x))
    got = _avg_pool_3x3_s1_same(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-6, rtol=1e-6)
