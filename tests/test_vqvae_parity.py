"""End-to-end golden parity: our VQ-VAE vs the reference PyTorch models.

Imports the reference module directly from /root/reference (read-only) so the
comparison target is the true upstream code, not a re-implementation. Gates:
- z_before (encoder latents) MSE < 1e-5 relative to reference (the
  BASELINE.md north-star fidelity gate)
- codebook indices identical
- reconstruction identical within float tolerance
- loss dict values match
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from conftest import REFERENCE_DIR, has_reference

pytestmark = pytest.mark.skipif(
    not has_reference(), reason="reference checkout not available")

if has_reference():
    sys.path.insert(0, REFERENCE_DIR)
    from HiddenStateExtractor import vae as ref_vae  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dynamorph_tpu.models import VQVAEz16, VQVAEz32  # noqa: E402
from dynamorph_tpu.models.torch_import import (  # noqa: E402
    import_vqvae_z16,
    import_vqvae_z32,
)


def _state_dict_numpy(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def _rand_inputs(rng, b=4, c=2, hw=128):
    return rng.rand(b, c, hw, hw).astype(np.float32)


@pytest.fixture(scope="module")
def torch_z16():
    torch.manual_seed(0)
    m = ref_vae.VQ_VAE_z16(num_inputs=2, num_hiddens=16,
                           num_residual_hiddens=32, num_residual_layers=2,
                           num_embeddings=64, device="cpu")
    m.eval()
    return m


@pytest.fixture(scope="module")
def torch_z32():
    torch.manual_seed(1)
    m = ref_vae.VQ_VAE_z32(num_inputs=2, num_hiddens=16,
                           num_residual_hiddens=32, num_residual_layers=2,
                           num_embeddings=512, device="cpu")
    m.eval()
    return m


def test_z16_encode_parity(rng, torch_z16):
    x = _rand_inputs(rng)
    with torch.no_grad():
        z_ref = torch_z16.enc(torch.from_numpy(x)).numpy()
        idx_ref = torch_z16.vq.encode_inputs(torch.from_numpy(z_ref)).numpy()

    model = VQVAEz16(num_embeddings=64, vq_impl="xla")
    params, state = import_vqvae_z16(_state_dict_numpy(torch_z16))
    z_before, z_after, idx = model.encode(params, state, jnp.asarray(x))

    mse = float(np.mean((np.asarray(z_before) - z_ref) ** 2))
    assert mse < 1e-5, f"latent MSE {mse} exceeds parity gate"
    np.testing.assert_array_equal(np.asarray(idx), idx_ref)
    # z_after must be exact codebook rows
    cb = torch_z16.vq.w.weight.detach().numpy()
    q_ref = np.transpose(cb[idx_ref], (0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(z_after), q_ref, atol=1e-6)


def test_z16_forward_parity(rng, torch_z16):
    x = _rand_inputs(rng)
    with torch.no_grad():
        dec_ref, losses_ref = torch_z16(torch.from_numpy(x))

    model = VQVAEz16(num_embeddings=64, vq_impl="xla")
    params, state = import_vqvae_z16(_state_dict_numpy(torch_z16))
    decoded, losses, _ = model.apply(params, state, jnp.asarray(x), train=False)

    np.testing.assert_allclose(
        np.asarray(decoded), dec_ref.numpy(), atol=1e-4, rtol=1e-4)
    for key in ["recon_loss", "commitment_loss", "total_loss", "perplexity"]:
        np.testing.assert_allclose(
            float(losses[key]), float(losses_ref[key]), rtol=1e-4, atol=1e-6)


def test_z16_time_matching_loss_parity(rng, torch_z16):
    x = _rand_inputs(rng, b=6)
    rel = rng.randint(0, 3, size=(6, 6)).astype(np.float32)
    with torch.no_grad():
        _, losses_ref = torch_z16(torch.from_numpy(x),
                                  time_matching_mat=torch.from_numpy(rel))

    model = VQVAEz16(num_embeddings=64, vq_impl="xla")
    params, state = import_vqvae_z16(_state_dict_numpy(torch_z16))
    _, losses, _ = model.apply(params, state, jnp.asarray(x), train=False,
                               time_matching_mat=jnp.asarray(rel))
    np.testing.assert_allclose(
        float(losses["time_matching_loss"]),
        float(losses_ref["time_matching_loss"]), rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(
        float(losses["total_loss"]), float(losses_ref["total_loss"]),
        rtol=1e-3, atol=1e-6)


def test_z32_forward_parity(rng, torch_z32):
    x = _rand_inputs(rng)
    with torch.no_grad():
        dec_ref, losses_ref = torch_z32(torch.from_numpy(x))
        z_ref = torch_z32.enc(torch.from_numpy(x)).numpy()

    model = VQVAEz32(num_embeddings=512, vq_impl="xla")
    params, state = import_vqvae_z32(_state_dict_numpy(torch_z32))
    decoded, losses, _ = model.apply(params, state, jnp.asarray(x), train=False)
    z_before, _, _ = model.encode(params, state, jnp.asarray(x))

    mse = float(np.mean((np.asarray(z_before) - z_ref) ** 2))
    assert mse < 1e-5
    np.testing.assert_allclose(
        np.asarray(decoded), dec_ref.numpy(), atol=1e-4, rtol=1e-4)
    for key in ["recon_loss", "commitment_loss", "total_loss", "perplexity"]:
        np.testing.assert_allclose(
            float(losses[key]), float(losses_ref[key]), rtol=1e-4, atol=1e-6)


def test_z16_batch_mask_parity(rng, torch_z16):
    x = _rand_inputs(rng, b=3)
    mask = (rng.rand(3, 2, 128, 128) > 0.3).astype(np.float32)
    with torch.no_grad():
        _, losses_ref = torch_z16(torch.from_numpy(x),
                                  batch_mask=torch.from_numpy(mask))
    model = VQVAEz16(num_embeddings=64, vq_impl="xla")
    params, state = import_vqvae_z16(_state_dict_numpy(torch_z16))
    _, losses, _ = model.apply(params, state, jnp.asarray(x), train=False,
                               batch_mask=jnp.asarray(mask))
    np.testing.assert_allclose(
        float(losses["recon_loss"]), float(losses_ref["recon_loss"]),
        rtol=1e-4, atol=1e-7)
