"""Layer-level geometry parity vs torch CPU (conv, conv-transpose, batchnorm).

These gates guarantee that weight import (models/torch_import.py) reproduces
reference activations layer by layer.
"""
import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from dynamorph_tpu.nn import functional as F
from dynamorph_tpu.nn.functional import (
    conv_kernel_from_torch,
    conv_transpose_kernel_from_torch,
)


def _to_nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


def _to_nchw(x_nhwc):
    return np.transpose(x_nhwc, (0, 3, 1, 2))


@pytest.mark.parametrize("k,s,p,cin,cout", [
    (1, 1, 0, 2, 8),    # reference enc 1x1 pre-conv
    (4, 2, 1, 8, 16),   # reference stride-2 downsample conv
    (3, 1, 1, 16, 16),  # reference 3x3 conv
])
def test_conv2d_matches_torch(rng, k, s, p, cin, cout):
    x = rng.randn(3, cin, 16, 16).astype(np.float32)
    m = torch.nn.Conv2d(cin, cout, k, stride=s, padding=p)
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()
    params = {
        "kernel": jnp.asarray(conv_kernel_from_torch(m.weight.detach().numpy())),
        "bias": jnp.asarray(m.bias.detach().numpy()),
    }
    out = np.asarray(F.conv2d(params, jnp.asarray(_to_nhwc(x)), s, p))
    np.testing.assert_allclose(_to_nchw(out), ref, atol=2e-6, rtol=1e-5)


@pytest.mark.parametrize("k,s,p,cin,cout", [
    (4, 2, 1, 16, 8),   # reference decoder deconv geometry (vae.py:288-295)
    (4, 2, 1, 8, 4),
])
def test_conv_transpose2d_matches_torch(rng, k, s, p, cin, cout):
    x = rng.randn(2, cin, 16, 16).astype(np.float32)
    m = torch.nn.ConvTranspose2d(cin, cout, k, stride=s, padding=p)
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()
    params = {
        "kernel": jnp.asarray(
            conv_transpose_kernel_from_torch(m.weight.detach().numpy())),
        "bias": jnp.asarray(m.bias.detach().numpy()),
    }
    out = np.asarray(F.conv_transpose2d(params, jnp.asarray(_to_nhwc(x)), s, p))
    assert _to_nchw(out).shape == ref.shape
    np.testing.assert_allclose(_to_nchw(out), ref, atol=2e-6, rtol=1e-5)


def test_fused_preconv_stride_conv_exact(rng):
    """Fused conv0(1x1)+conv1(4x4 s2) == sequential, including the border
    bias correction (conv1 zero-pads AFTER conv0)."""
    import jax

    from dynamorph_tpu.models.common import fused_preconv_stride_conv
    from dynamorph_tpu.nn import functional as Fn

    k0, k1 = jax.random.split(jax.random.PRNGKey(7))
    p0 = Fn.init_conv(k0, 1, 1, 2, 8)
    p1 = Fn.init_conv(k1, 4, 4, 8, 8)
    # large bias to make any border-correction error obvious
    p0 = {"kernel": p0["kernel"], "bias": p0["bias"] + 10.0}
    x = jnp.asarray(rng.rand(2, 32, 32, 2).astype(np.float32))
    seq = Fn.conv2d(p1, Fn.conv2d(p0, x, 1, 0), 2, 1)
    fused = fused_preconv_stride_conv(p0, p1, x)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(seq),
                               atol=1e-4, rtol=1e-5)
    # and the bias-free case
    p0nb = {"kernel": p0["kernel"]}
    seq = Fn.conv2d(p1, Fn.conv2d(p0nb, x, 1, 0), 2, 1)
    fused = fused_preconv_stride_conv(p0nb, p1, x)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(seq),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("train", [False, True])
def test_batch_norm_matches_torch(rng, train):
    c = 16
    x = rng.randn(4, c, 8, 8).astype(np.float32)
    m = torch.nn.BatchNorm2d(c)
    init_mean = rng.randn(c).astype(np.float32)
    init_var = (rng.rand(c) + 0.5).astype(np.float32)
    with torch.no_grad():
        m.weight.copy_(torch.from_numpy((rng.rand(c) + 0.5).astype(np.float32)))
        m.bias.copy_(torch.from_numpy(rng.randn(c).astype(np.float32)))
        m.running_mean.copy_(torch.from_numpy(init_mean))
        m.running_var.copy_(torch.from_numpy(init_var))
    m.train(train)
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()

    params = {
        "scale": jnp.asarray(m.weight.detach().numpy()),
        "offset": jnp.asarray(m.bias.detach().numpy()),
    }
    state = {"mean": jnp.asarray(init_mean), "var": jnp.asarray(init_var)}
    y, new_state = F.batch_norm(params, state, jnp.asarray(_to_nhwc(x)), train)
    np.testing.assert_allclose(_to_nchw(np.asarray(y)), ref, atol=1e-5, rtol=1e-4)
    if train:
        # torch updated its running stats in-place during the forward.
        np.testing.assert_allclose(
            np.asarray(new_state["mean"]), m.running_mean.numpy(),
            atol=1e-6, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(new_state["var"]), m.running_var.numpy(),
            atol=1e-6, rtol=1e-5)
