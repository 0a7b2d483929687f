"""AAE adversarial training loop smoke + gradient-group isolation."""
import numpy as np

import jax
import jax.numpy as jnp

from dynamorph_tpu.models.vae import AAEModel
from dynamorph_tpu.train.adversarial import train_adversarial


def test_adversarial_training_smoke(tmp_path, rng):
    # AAE discriminator geometry requires 128x128 inputs (16x16 latents ->
    # three stride-2 convs -> 2x2, reference vae.py:759-778)
    model = AAEModel(num_inputs=2, num_hiddens=8, num_residual_hiddens=8)
    dataset = rng.rand(8, 2, 128, 128).astype(np.float32)
    params, state, history = train_adversarial(
        model, dataset, str(tmp_path), n_epochs=2, batch_size=4,
        transform=True, seed=0)
    assert len(history) == 2
    for k in ("recon_loss", "generator_loss", "descriminator_loss"):
        assert np.isfinite(history[-1][k]), k
    assert (tmp_path / "model_epoch1").exists()


def test_aae_adversarial_losses_finite(rng):
    model = AAEModel(num_inputs=2, num_hiddens=8, num_residual_hiddens=8)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.rand(4, 2, 128, 128).astype(np.float32))
    losses, _ = model.adversarial_loss(params, state, x,
                                       jax.random.PRNGKey(1), train=True)
    assert np.isfinite(float(losses["generator_loss"]))
    assert np.isfinite(float(losses["descriminator_loss"]))
    assert 0 <= float(losses["score"]) <= 1


def test_discriminator_grads_do_not_touch_decoder(rng):
    """D-loss gradients must be zero for enc/dec params (detached data score,
    reference vae.py:850)."""
    model = AAEModel(num_inputs=2, num_hiddens=8, num_residual_hiddens=8)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.rand(4, 2, 128, 128).astype(np.float32))

    def d_loss(params):
        losses, _ = model.adversarial_loss(params, state, x,
                                           jax.random.PRNGKey(1), train=False)
        return losses["descriminator_loss"]

    g = jax.grad(d_loss)(params)
    dec_norm = sum(float(jnp.abs(l).sum())
                   for l in jax.tree_util.tree_leaves(g["dec"]))
    disc_norm = sum(float(jnp.abs(l).sum())
                    for l in jax.tree_util.tree_leaves(g["enc_d"]))
    assert dec_norm == 0.0
    assert disc_norm > 0.0
