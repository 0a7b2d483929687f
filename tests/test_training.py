"""Training runtime: jitted sharded step, trainer loop, data utilities."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from dynamorph_tpu.core.mesh import make_mesh
from dynamorph_tpu.models import VQVAEz16, VQVAEz32
from dynamorph_tpu.train.steps import make_train_step, make_eval_step, augment_batch
from dynamorph_tpu.train import data as data_utils


def test_train_step_reduces_loss(rng):
    model = VQVAEz32(num_embeddings=16, num_hiddens=8, num_residual_hiddens=8)
    params, state = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = make_train_step(model, opt, augment=False)
    x = jnp.asarray(rng.rand(8, 2, 32, 32).astype(np.float32))
    key = jax.random.PRNGKey(1)
    first = None
    for i in range(10):
        params, state, opt_state, losses = step(
            params, state, opt_state, x, None, None, key)
        if first is None:
            first = float(losses["total_loss"])
    assert float(losses["total_loss"]) < first


def test_train_step_sharded_equals_unsharded(rng):
    """The mesh-sharded step must be numerically equivalent to single-device
    (global-view jit semantics: BN stats and grads are global)."""
    model = VQVAEz32(num_embeddings=16, num_hiddens=8, num_residual_hiddens=8,
                     vq_impl="xla")
    params, state = model.init(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    x = jnp.asarray(rng.rand(8, 2, 32, 32).astype(np.float32))
    rel = jnp.asarray(rng.randint(0, 3, (8, 8)).astype(np.float32))
    key = jax.random.PRNGKey(2)

    mesh = make_mesh(8)
    step_m = make_train_step(model, opt, mesh=mesh, augment=False)
    step_1 = make_train_step(model, opt, mesh=None, augment=False)

    p_m, s_m, o_m, l_m = step_m(params, state, opt.init(params), x, rel, None, key)
    p_1, s_1, o_1, l_1 = step_1(params, state, opt.init(params), x, rel, None, key)

    np.testing.assert_allclose(float(l_m["total_loss"]),
                               float(l_1["total_loss"]), rtol=1e-5)

    # Gradients must match across shardings (cross-shard reduction order only
    # perturbs at float rounding level). Post-Adam params are NOT compared:
    # g/sqrt(v) amplifies rounding noise to O(lr) on near-zero grads.
    def loss_fn(p, x, rel):
        _, losses, _ = model.apply(p, state, x, train=True,
                                   time_matching_mat=rel)
        return losses["total_loss"]

    from jax.sharding import NamedSharding, PartitionSpec as P
    g_1 = jax.jit(jax.grad(loss_fn))(params, x, rel)
    x_sh = jax.device_put(x, NamedSharding(mesh, P("data")))
    g_m = jax.jit(jax.grad(loss_fn))(params, x_sh, rel)
    for a, b in zip(jax.tree_util.tree_leaves(g_m),
                    jax.tree_util.tree_leaves(g_1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-3)
    # new batch-norm state (global batch stats) must also agree
    for a, b in zip(jax.tree_util.tree_leaves(s_m),
                    jax.tree_util.tree_leaves(s_1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


def test_augment_batch_preserves_shapes(rng):
    x = jnp.asarray(rng.rand(4, 2, 16, 16).astype(np.float32))
    m = jnp.ones_like(x)
    for seed in range(8):
        out, mask = augment_batch(jax.random.PRNGKey(seed), x, m)
        assert out.shape == x.shape
        # flips/rotations preserve the multiset of pixel values
        np.testing.assert_allclose(np.sort(np.asarray(out).ravel()),
                                   np.sort(np.asarray(x).ravel()), atol=0)


def test_trainer_smoke(tmp_path, rng):
    from dynamorph_tpu.train.trainer import train_vqvae

    model = VQVAEz32(num_embeddings=8, num_hiddens=8, num_residual_hiddens=8)
    dataset = rng.rand(24, 2, 32, 32).astype(np.float32)
    relations = {(0, 1): 2, (1, 0): 2, (1, 2): 2, (2, 1): 2, (5, 6): 1}
    ds, rel_mat, order = data_utils.reorder_with_trajectories(dataset, relations, seed=0)
    params, state, history = train_vqvae(
        model, ds, str(tmp_path), relation_mat=rel_mat, n_epochs=2,
        batch_size=8, patience=5, transform=True)
    assert len(history) == 2
    assert np.isfinite(history[-1]["val"]["total_loss"])
    assert (tmp_path / "model_ckpt").exists()
    assert (tmp_path / "metrics.jsonl").exists()


def test_trainer_resident_feed_matches_streaming(tmp_path, rng, monkeypatch):
    """The device-resident feed (dataset uploaded once, batches gathered on
    device) must train identically to the host-streamed feed — including
    masks and the relation-matrix time-matching loss."""
    import dynamorph_tpu.train.trainer as trainer_mod
    from dynamorph_tpu.train.trainer import train_vqvae

    model = VQVAEz32(num_embeddings=8, num_hiddens=8, num_residual_hiddens=8)
    dataset = rng.rand(24, 2, 32, 32).astype(np.float32)
    mask = np.where(rng.rand(24, 2, 32, 32) > 0.5, 1.0, -1.0)
    relations = {(0, 1): 2, (1, 0): 2, (1, 2): 2, (2, 1): 2, (5, 6): 1}
    ds, rel_mat, order = data_utils.reorder_with_trajectories(
        dataset, relations, seed=0)
    mask = mask[order]

    p1, s1, h1 = train_vqvae(model, ds, str(tmp_path / "res"),
                             relation_mat=rel_mat, mask=mask, n_epochs=2,
                             batch_size=8, patience=5, transform=True)
    monkeypatch.setattr(trainer_mod, "_DEVICE_RESIDENT_BUDGET", 0)
    p2, s2, h2 = train_vqvae(model, ds, str(tmp_path / "str"),
                             relation_mat=rel_mat, mask=mask, n_epochs=2,
                             batch_size=8, patience=5, transform=True)
    for r1, r2 in zip(h1, h2):
        for split in ("train", "val"):
            for k in r1[split]:
                assert abs(r1[split][k] - r2[split][k]) < 1e-5, (k, r1, r2)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_trainer_vae_trains(tmp_path, rng):
    """VAE actually TRAINS through train_vqvae (not just forward parity):
    the trainer must thread a PRNG key into apply for the reparameterisation
    draw (reference vae.py:528 uses torch's global RNG), the loss must
    decrease and the KLD stay finite every epoch."""
    from dynamorph_tpu.models.vae import VAEModel
    from dynamorph_tpu.train.trainer import train_vqvae

    model = VAEModel(num_hiddens=8, num_residual_hiddens=8)
    dataset = rng.rand(24, 2, 32, 32).astype(np.float32)
    relations = {(0, 1): 2, (1, 0): 2, (1, 2): 2, (2, 1): 2, (5, 6): 1}
    ds, rel_mat, _ = data_utils.reorder_with_trajectories(
        dataset, relations, seed=0)
    params, state, history = train_vqvae(
        model, ds, str(tmp_path), relation_mat=rel_mat, n_epochs=4,
        batch_size=8, patience=10, transform=True, lr=1e-3)
    assert len(history) == 4
    for rec in history:
        assert np.isfinite(rec["train"]["KLD"])
        assert np.isfinite(rec["val"]["total_loss"])
    assert history[-1]["train"]["total_loss"] < history[0]["train"]["total_loss"]


def test_trainer_iwae_trains(tmp_path, rng):
    """IWAE (k importance samples inside apply, reference vae.py:619-697)
    trains through the same trainer; loss decreases and stays finite."""
    from dynamorph_tpu.models.vae import IWAEModel
    from dynamorph_tpu.train.trainer import train_vqvae

    model = IWAEModel(num_hiddens=8, num_residual_hiddens=8, k=3)
    dataset = rng.rand(24, 2, 32, 32).astype(np.float32)
    relations = {(0, 1): 2, (1, 0): 2, (1, 2): 2, (2, 1): 2}
    ds, rel_mat, _ = data_utils.reorder_with_trajectories(
        dataset, relations, seed=0)
    params, state, history = train_vqvae(
        model, ds, str(tmp_path), relation_mat=rel_mat, n_epochs=4,
        batch_size=8, patience=10, transform=False, lr=1e-3)
    assert len(history) == 4
    for rec in history:
        assert np.isfinite(rec["train"]["total_loss"])
    assert history[-1]["train"]["total_loss"] < history[0]["train"]["total_loss"]


def test_iwae_bound_tightens_with_k(rng):
    """The importance-weighted bound L_k (Burda et al. eq. 8) is
    non-decreasing in expectation with k; with shared params L_5 must beat
    L_1 (the VAE ELBO estimator) on held-out data, averaged over noise
    draws. Uses IWAEModel.log_likelihood_bound, NOT the reweighted training
    objective (whose value is not the bound)."""
    from dynamorph_tpu.models.vae import IWAEModel

    m1 = IWAEModel(num_hiddens=8, num_residual_hiddens=8, k=1)
    m5 = IWAEModel(num_hiddens=8, num_residual_hiddens=8, k=5)
    params, state = jax.jit(m1.init)(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.rand(8, 2, 32, 32).astype(np.float32))

    b1 = jax.jit(lambda k: m1.log_likelihood_bound(params, state, x, k))
    b5 = jax.jit(lambda k: m5.log_likelihood_bound(params, state, x, k))
    keys = jax.random.split(jax.random.PRNGKey(7), 16)
    l1 = float(np.mean([float(b1(k)) for k in keys]))
    l5 = float(np.mean([float(b5(k)) for k in keys]))
    assert np.isfinite(l1) and np.isfinite(l5)
    assert l5 >= l1, (l1, l5)


def test_trainer_resume_restores_optimizer_and_epoch(tmp_path, rng):
    from dynamorph_tpu.train.trainer import train_vqvae

    model = VQVAEz32(num_embeddings=8, num_hiddens=8, num_residual_hiddens=8)
    dataset = rng.rand(16, 2, 32, 32).astype(np.float32)
    p1, s1, h1 = train_vqvae(model, dataset, str(tmp_path), n_epochs=2,
                             batch_size=8, patience=10, transform=False)
    assert h1[-1]["epoch"] == 1
    # resume continues from epoch 2 with restored params/opt moments
    p2, s2, h2 = train_vqvae(model, dataset, str(tmp_path), n_epochs=4,
                             batch_size=8, patience=10, transform=False,
                             resume=True)
    assert [r["epoch"] for r in h2] == [2, 3]
    assert np.isfinite(h2[-1]["val"]["total_loss"])


def test_checkpoint_roundtrip(tmp_path):
    from dynamorph_tpu.train.checkpoint import save_checkpoint, restore_checkpoint

    model = VQVAEz16(num_embeddings=8, num_hiddens=8)
    params, state = model.init(jax.random.PRNGKey(0))
    save_checkpoint(str(tmp_path / "ck"), {"params": params, "state": state})
    restored = restore_checkpoint(str(tmp_path / "ck"))
    orig = jax.tree_util.tree_leaves(params)
    rest = jax.tree_util.tree_leaves(restored["params"])
    assert len(orig) == len(rest)
    for a, b in zip(orig, rest):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_reorder_with_trajectories_contiguity():
    dataset = np.arange(10)[:, None].astype(np.float32)
    relations = {(3, 4): 2, (4, 3): 2, (4, 5): 2, (5, 4): 2, (3, 5): 1, (5, 3): 1}
    ds, rel, order = data_utils.reorder_with_trajectories(dataset, relations, seed=1)
    # the trajectory {3,4,5} must be contiguous in the new order
    pos = [order.index(i) for i in (3, 4, 5)]
    assert max(pos) - min(pos) == 2
    assert rel.shape == (10, 10)
    # relation values survive the permutation
    i, j = order.index(3), order.index(4)
    assert rel[i, j] == 2


def test_zscore_patch_matches_reference_semantics(rng):
    imgs = rng.rand(5, 2, 8, 8).astype(np.float64)
    out = data_utils.zscore_patch(imgs)
    # each (sample, channel) slice has mean~0 std~1
    np.testing.assert_allclose(out.mean(axis=(2, 3)), 0, atol=1e-9)
    np.testing.assert_allclose(out.std(axis=(2, 3)), 1, atol=1e-6)


def test_train_val_split_disjoint(rng):
    ds = rng.rand(40, 1).astype(np.float32)
    labels = np.arange(40)
    tr, trl, va, val = data_utils.train_val_split(ds, labels, 0.25, seed=3)
    assert len(tr) + len(va) == 40
    assert set(trl).isdisjoint(set(val))


def test_adam_matches_torch(rng):
    """optax.adam must update like torch.optim.Adam (reference optimizer,
    run_training.py:485) for identical grads."""
    torch = pytest.importorskip("torch")
    w0 = rng.randn(5, 3).astype(np.float32)
    g = rng.randn(5, 3).astype(np.float32)

    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt_t = torch.optim.Adam([wt], lr=1e-3, betas=(0.9, 0.999))
    for _ in range(5):
        opt_t.zero_grad()
        wt.grad = torch.from_numpy(g.copy())
        opt_t.step()

    opt_j = optax.adam(1e-3, b1=0.9, b2=0.999)
    wj = jnp.asarray(w0)
    st = opt_j.init(wj)
    for _ in range(5):
        upd, st = opt_j.update(jnp.asarray(g), st, wj)
        wj = optax.apply_updates(wj, upd)
    np.testing.assert_allclose(np.asarray(wj), wt.detach().numpy(),
                               atol=1e-6, rtol=1e-5)


def test_unzscore_roundtrip(rng):
    x = rng.rand(4, 2, 8, 8).astype(np.float32) * 100
    mean, std = x.mean(), x.std()
    norm = (x - mean) / (std + np.finfo(float).eps)
    back = data_utils.unzscore(norm, mean, std)
    assert np.allclose(back, x, atol=1e-4)


def test_prepare_dataset_from_collection_parity(rng, tmp_path):
    """Equal to reference run_training.py:61-96 on a synthetic
    *_all_patches.pkl collection."""
    import pickle
    import sys

    from conftest import REFERENCE_DIR, has_reference, stub_torchvision
    if not has_reference():
        pytest.skip("reference not available")
    stub_torchvision()
    sys.path.insert(0, REFERENCE_DIR)
    try:
        from run_training import (
            prepare_dataset_from_collection as ref_prepare)
    except Exception as ex:  # reference deps missing
        pytest.skip(f"reference import failed: {ex}")
    finally:
        sys.path.remove(REFERENCE_DIR)

    fs = []
    for site in ("D5-Site_0", "D5-Site_1"):
        coll = {}
        for i in range(3):
            name = f"/data/{site}/{i}"
            coll[name] = {"masked_mat": rng.rand(3, 1, 64, 64) * 65535}
            fs.append(name)
        with open(tmp_path / f"{site}_all_patches.pkl", "wb") as fh:
            pickle.dump(coll, fh)

    ours = data_utils.prepare_dataset_from_collection(
        fs, cs=[0, 1], input_shape=(32, 32), file_path=str(tmp_path))
    theirs = ref_prepare(fs, cs=[0, 1], input_shape=(32, 32),
                         file_path=str(tmp_path))
    theirs = np.asarray(theirs)
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)
