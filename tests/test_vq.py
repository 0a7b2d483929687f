"""VQ lookup op: XLA path vs brute force, Pallas kernel (interpret mode on
CPU) vs XLA path, and gradient flow into the codebook."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamorph_tpu.ops import vq as vq_mod
from dynamorph_tpu.ops.vq import vq_lookup, vq_codebook_counts, perplexity_from_counts


def _brute_force(z, codebook):
    # Reference formulation (HiddenStateExtractor/vae.py:52-56): broadcast
    # squared differences, argmax of negative distance.
    dist = np.sum((z[:, None, :] - codebook[None, :, :]) ** 2, axis=-1)
    idx = np.argmax(-dist, axis=1)
    return codebook[idx], idx


@pytest.mark.parametrize("n,d,k", [(37, 16, 64), (256, 16, 512), (100, 64, 64)])
def test_vq_xla_matches_bruteforce(rng, n, d, k):
    z = rng.randn(n, d).astype(np.float32)
    cb = rng.randn(k, d).astype(np.float32)
    q, idx = vq_lookup(jnp.asarray(z), jnp.asarray(cb), impl="xla")
    q_ref, idx_ref = _brute_force(z, cb)
    np.testing.assert_array_equal(np.asarray(idx), idx_ref)
    np.testing.assert_allclose(np.asarray(q), q_ref, atol=1e-6)


@pytest.mark.parametrize("n,d,k", [(64, 16, 64), (300, 16, 512), (1025, 64, 128), (512, 64, 512)])
def test_vq_pallas_matches_xla(rng, n, d, k):
    z = rng.randn(n, d).astype(np.float32)
    cb = rng.randn(k, d).astype(np.float32)
    q_x, idx_x = vq_lookup(jnp.asarray(z), jnp.asarray(cb), impl="xla")
    # On CPU, pallas TPU kernels run via the interpreter.
    q_p, idx_p = vq_mod._vq_pallas(jnp.asarray(z), jnp.asarray(cb))
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))
    np.testing.assert_allclose(np.asarray(q_p), np.asarray(q_x), atol=1e-5)


def test_vq_lookup_preserves_leading_shape(rng):
    z = rng.randn(2, 4, 4, 16).astype(np.float32)
    cb = rng.randn(64, 16).astype(np.float32)
    q, idx = vq_lookup(jnp.asarray(z), jnp.asarray(cb), impl="xla")
    assert q.shape == z.shape
    assert idx.shape == (2, 4, 4)


def test_perplexity_matches_reference_formula(rng):
    idx = jnp.asarray(rng.randint(0, 8, size=100))
    counts = vq_codebook_counts(idx, 8)
    probs = np.bincount(np.asarray(idx), minlength=8) / 100.0
    ref = np.exp(-np.sum(probs * np.log(probs + 1e-10)))
    np.testing.assert_allclose(float(perplexity_from_counts(counts)), ref, rtol=1e-6)


def test_codebook_gradient_flows_via_take(rng):
    """Training path: q = take(codebook, idx) must scatter grads into rows."""
    z = jnp.asarray(rng.randn(10, 4).astype(np.float32))
    cb = jnp.asarray(rng.randn(6, 4).astype(np.float32))

    def loss_fn(cb):
        _, idx = vq_lookup(z, cb, impl="xla")
        q = jnp.take(cb, idx, axis=0)
        return jnp.mean((q - jax.lax.stop_gradient(z)) ** 2)

    g = jax.grad(loss_fn)(cb)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_gather_codes_grad_matches_scatter():
    """The one-hot-matmul custom VJP equals jnp.take's scatter-add VJP
    (up to f32 accumulation order)."""
    import jax
    import jax.numpy as jnp

    from dynamorph_tpu.ops.vq import gather_codes

    rng = np.random.RandomState(3)
    cb = jnp.asarray(rng.rand(32, 8).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 32, size=(4, 5, 5)).astype(np.int32))
    g = jnp.asarray(rng.rand(4, 5, 5, 8).astype(np.float32))

    def loss_take(c):
        return jnp.sum(jnp.take(c, idx, axis=0) * g)

    def loss_gather(c):
        return jnp.sum(gather_codes(c, idx) * g)

    a = jax.grad(loss_take)(cb)
    b = jax.grad(loss_gather)(cb)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)
    # forward identical
    np.testing.assert_array_equal(np.asarray(gather_codes(cb, idx)),
                                  np.asarray(jnp.take(cb, idx, axis=0)))


@pytest.mark.parametrize("n,d,k", [(64, 16, 64), (300, 16, 512),
                                   (512, 64, 512)])
def test_vq_indices_matches_lookup(rng, n, d, k):
    """The indices-only kernels (both impls) return exactly vq_lookup's
    argmin, including tie-breaking."""
    from dynamorph_tpu.ops.vq import vq_indices

    z = jnp.asarray(rng.rand(n, d).astype(np.float32))
    cb = jnp.asarray(rng.rand(k, d).astype(np.float32))
    _, idx_ref = vq_lookup(z, cb, impl="xla")
    for impl in ("xla", "pallas"):
        idx = vq_indices(z, cb, impl=impl)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))


def test_codebook_counts_exact(rng):
    """int8-one-hot counts are exact integers equal to a numpy histogram."""
    from dynamorph_tpu.ops.vq import vq_codebook_counts

    idx = rng.randint(0, 32, size=(7, 9)).astype(np.int32)
    counts = np.asarray(vq_codebook_counts(jnp.asarray(idx), 32))
    expect = np.bincount(idx.reshape(-1), minlength=32).astype(np.float32)
    np.testing.assert_array_equal(counts, expect)
