"""VAE / AAE golden parity vs the reference torch models (deterministic
paths: VAE.predict decodes z_mean without sampling; AAE forward is
deterministic in eval mode)."""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from conftest import REFERENCE_DIR, has_reference

pytestmark = pytest.mark.skipif(
    not has_reference(), reason="reference checkout not available")

if has_reference():
    sys.path.insert(0, REFERENCE_DIR)
    from HiddenStateExtractor import vae as ref_vae

import jax
import jax.numpy as jnp

from dynamorph_tpu.models.torch_import import import_aae, import_vae
from dynamorph_tpu.models.vae import AAEModel, VAEModel


def _sd(model):
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def test_vae_predict_parity(rng):
    torch.manual_seed(21)
    tmodel = ref_vae.VAE(num_inputs=2, num_hiddens=16,
                         num_residual_hiddens=32, num_residual_layers=2)
    tmodel.eval()
    model = VAEModel()
    params, state = import_vae(_sd(tmodel))

    x = rng.rand(3, 2, 128, 128).astype(np.float32)
    with torch.no_grad():
        dec_ref, losses_ref = tmodel.predict(torch.from_numpy(x))
    decoded, losses = model.predict(params, state, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(decoded), dec_ref.numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(float(losses["recon_loss"]),
                               float(losses_ref["recon_loss"]), rtol=1e-4)


def test_iwae_forward_parity_with_fixed_noise(rng):
    """Same eps draws injected into both implementations -> equal losses."""
    from dynamorph_tpu.models.vae import IWAEModel

    torch.manual_seed(31)
    tmodel = ref_vae.IWAE(k=3, num_inputs=2, num_hiddens=16,
                          num_residual_hiddens=32, num_residual_layers=2)
    tmodel.eval()
    model = IWAEModel(k=3)
    params, state = import_vae(_sd(tmodel))

    x = rng.rand(2, 2, 128, 128).astype(np.float32)
    # fixed noise, NCHW for torch / NHWC for ours
    eps_nchw = rng.randn(3, 2, 16, 16, 16).astype(np.float32)
    eps_nhwc = np.transpose(eps_nchw, (0, 1, 3, 4, 2))

    class FixedRP(torch.nn.Module):
        def forward(self, z_mean, z_logstd):
            z_std = torch.exp(0.5 * z_logstd)
            epss = [torch.from_numpy(e) for e in eps_nchw]
            zs = [z_mean + z_std * e for e in epss]
            return zs, epss

    tmodel.rp = FixedRP()
    with torch.no_grad():
        _, losses_ref = tmodel(torch.from_numpy(x))

    _, losses, _ = model.apply(params, state, jnp.asarray(x),
                               jax.random.PRNGKey(0), train=False,
                               fixed_eps=jnp.asarray(eps_nhwc))
    for key in ("recon_loss", "total_loss"):
        np.testing.assert_allclose(float(losses[key]),
                                   float(losses_ref[key]), rtol=1e-3)


def test_aae_forward_parity(rng):
    torch.manual_seed(22)
    tmodel = ref_vae.AAE(num_inputs=2, num_hiddens=16,
                         num_residual_hiddens=32, num_residual_layers=2)
    tmodel.eval()
    model = AAEModel()
    params, state = import_aae(_sd(tmodel))

    x = rng.rand(3, 2, 128, 128).astype(np.float32)
    rel = rng.randint(0, 3, size=(3, 3)).astype(np.float32)
    with torch.no_grad():
        dec_ref, losses_ref = tmodel(torch.from_numpy(x),
                                     time_matching_mat=torch.from_numpy(rel))
    decoded, losses, _ = model.apply(params, state, jnp.asarray(x),
                                     train=False,
                                     time_matching_mat=jnp.asarray(rel))
    np.testing.assert_allclose(np.asarray(decoded), dec_ref.numpy(),
                               atol=1e-4, rtol=1e-4)
    for key in ("recon_loss", "time_matching_loss", "total_loss"):
        np.testing.assert_allclose(float(losses[key]),
                                   float(losses_ref[key]), rtol=1e-3,
                                   atol=1e-6)


def test_aae_discriminator_score_parity(rng):
    """Same latents through both discriminators (eval mode, no dropout)."""
    torch.manual_seed(23)
    tmodel = ref_vae.AAE(num_inputs=2, num_hiddens=16,
                         num_residual_hiddens=32, num_residual_layers=2)
    tmodel.eval()
    model = AAEModel()
    params, state = import_aae(_sd(tmodel))

    z = rng.randn(4, 16, 16, 16).astype(np.float32)  # (B, C, H, W) latents
    with torch.no_grad():
        score_ref = tmodel.enc_d(torch.from_numpy(z)).numpy()
    from dynamorph_tpu.models.common import nchw_to_nhwc

    score, _ = model._apply_disc(params["enc_d"], state["enc_d"],
                                 nchw_to_nhwc(jnp.asarray(z)),
                                 jax.random.PRNGKey(0), train=False)
    np.testing.assert_allclose(np.asarray(score), score_ref, atol=1e-5,
                               rtol=1e-4)
