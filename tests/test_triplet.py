"""Triplet miners (parity vs reference torch), ResNet/SimCLR encoder, and
triplet training loop."""
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import REFERENCE_DIR, has_reference

from dynamorph_tpu.models.losses import AllTripletMiner, HardNegativeTripletMiner
from dynamorph_tpu.models.resnet_simclr import EncodeProject, LogisticRegression
from dynamorph_tpu.train.triplet_data import TripletDataset, triplet_batches


@pytest.mark.skipif(not has_reference(), reason="no reference checkout")
@pytest.mark.parametrize("margin", [0.5, 1.0])
def test_all_triplet_miner_matches_reference(rng, margin):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REFERENCE_DIR)
    from HiddenStateExtractor.losses import AllTripletMiner as RefMiner

    ids = rng.randint(0, 4, size=16)
    emb = rng.randn(16, 8).astype(np.float32)
    loss, f_pos = AllTripletMiner(margin=margin)(jnp.asarray(ids),
                                                 jnp.asarray(emb))
    with torch.no_grad():
        loss_ref, f_pos_ref = RefMiner(margin=margin)(
            torch.from_numpy(ids), torch.from_numpy(emb))
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-4)
    np.testing.assert_allclose(float(f_pos), float(f_pos_ref), rtol=1e-4)


@pytest.mark.skipif(not has_reference(), reason="no reference checkout")
def test_hard_negative_miner_matches_reference(rng):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REFERENCE_DIR)
    from HiddenStateExtractor.losses import HardNegativeTripletMiner as RefMiner

    ids = rng.randint(0, 3, size=12)
    emb = rng.randn(12, 6).astype(np.float32)
    loss, _ = HardNegativeTripletMiner(margin=0.5)(jnp.asarray(ids),
                                                   jnp.asarray(emb))
    with torch.no_grad():
        loss_ref, _ = RefMiner(margin=0.5)(torch.from_numpy(ids),
                                           torch.from_numpy(emb))
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=1e-4)


def test_encode_project_shapes(rng):
    model = EncodeProject(arch="ResNet18", num_inputs=2, cifar_head=True)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.rand(6, 2, 32, 32).astype(np.float32))
    h, _ = model.encode_fn(params, state, x, out="h")
    assert h.shape == (6, 512)
    z, _ = model.encode_fn(params, state, x, out="z")
    assert z.shape == (6, 128)
    labels = jnp.asarray(rng.randint(0, 2, 6))
    z, losses, _ = model.apply(params, state, x, labels=labels, train=True)
    assert np.isfinite(float(losses["total_loss"]))
    assert 0 <= float(losses["positive_triplet"]) <= 1


def test_triplet_dataset_sampling(rng):
    labels = np.array([0, 0, 0, 1, 1, 1])
    data = rng.rand(6, 2, 8, 8).astype(np.float32)
    ds = TripletDataset(labels, lambda i: data[i], n_sample=3,
                        rng=np.random.RandomState(0))
    lab, dat = ds[0]
    assert lab.shape == (3,) and (lab == 0).all()
    assert dat.shape == (3, 2, 8, 8)
    np.testing.assert_array_equal(dat[0], data[0])

    batches = list(triplet_batches(ds, batch_size=2, shuffle=False,
                                   rng=np.random.RandomState(1)))
    assert len(batches) == 3
    lab_b, dat_b = batches[0]
    assert lab_b.shape == (6,) and dat_b.shape == (6, 2, 8, 8)


def test_train_triplet_smoke(tmp_path, rng):
    from dynamorph_tpu.train.trainer import train_triplet

    labels = np.repeat(np.arange(4), 6)
    data = (rng.rand(24, 2, 32, 32) +
            labels[:, None, None, None] * 0.5).astype(np.float32)
    ds = TripletDataset(labels, lambda i: data[i], n_sample=2,
                        rng=np.random.RandomState(0))
    model = EncodeProject(arch="ResNet18", num_inputs=2, cifar_head=True)
    params, state, history = train_triplet(
        model, ds, ds, str(tmp_path), n_epochs=2, batch_size=6, patience=5)
    assert len(history) == 2
    assert np.isfinite(history[-1]["val"]["total_loss"])
    assert (tmp_path / "model_ckpt").exists()


def test_logistic_regression_probe(rng):
    model = LogisticRegression(input_dim=8, n_class=3)
    params, state = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.randn(10, 8).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 3, 10))
    z, losses, _ = model.apply(params, state, x, labels=labels)
    assert z.shape == (10, 3)
    # zero-init weights -> uniform prediction -> loss = log(3)
    np.testing.assert_allclose(float(losses["total_loss"]), np.log(3),
                               rtol=1e-5)
