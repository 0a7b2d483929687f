"""Per-sample recon-loss evaluation: batched path matches per-sample torch."""
import sys

import numpy as np
import pytest

import jax

from conftest import REFERENCE_DIR, has_reference

from dynamorph_tpu.analysis.recon_eval import (evaluate_recon_losses,
                                               recon_loss_summary)
from dynamorph_tpu.models import VQVAEz16


def test_recon_eval_shapes_and_summary(rng):
    model = VQVAEz16(num_embeddings=16, num_hiddens=8, num_residual_hiddens=8,
                     vq_impl="xla")
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    dataset = rng.rand(40, 2, 64, 64).astype(np.float32)
    losses = evaluate_recon_losses(model, params, state, dataset,
                                   n_samples=20, seed=1, batch_size=8)
    assert losses.shape == (20,)
    mean, std = recon_loss_summary(losses)
    assert np.isfinite(mean) and np.isfinite(std)


@pytest.mark.skipif(not has_reference(), reason="no reference checkout")
def test_recon_eval_matches_torch_per_sample(rng):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REFERENCE_DIR)
    from HiddenStateExtractor.vae import VQ_VAE_z16 as RefModel

    from dynamorph_tpu.models.torch_import import import_vqvae_z16

    torch.manual_seed(11)
    tmodel = RefModel(num_inputs=2, num_hiddens=16, num_residual_hiddens=32,
                      num_residual_layers=2, num_embeddings=64, device="cpu")
    tmodel.eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    model = VQVAEz16(num_embeddings=64, vq_impl="xla")
    params, state = import_vqvae_z16(sd)

    dataset = rng.rand(6, 2, 128, 128).astype(np.float32)
    ours = evaluate_recon_losses(model, params, state, dataset,
                                 n_samples=None, batch_size=4)
    refs = []
    with torch.no_grad():
        for i in range(len(dataset)):
            _, loss = tmodel(torch.from_numpy(dataset[i: i + 1]))
            refs.append(float(loss["recon_loss"]))
    np.testing.assert_allclose(ours, refs, rtol=1e-4, atol=1e-6)
