"""Trajectory-contiguous sharded time-matching loss (SURVEY.md §7):
blocked ring loss == dense (B, B) loss when trajectories don't straddle
shards; no z_flat all-gather in the compiled program; trainer integration.
"""
import dataclasses

import numpy as np

import jax
import jax.numpy as jnp
from scipy.sparse import csr_matrix

from dynamorph_tpu.core.mesh import make_mesh
from dynamorph_tpu.models import common
from dynamorph_tpu.train import sharded_loss as SL

W = dict(w_a=1.1, w_t=0.1, w_n=-0.5, margin=0.5)


def _traj_relations(lengths):
    """Dense relation matrix + traj ids for consecutive trajectories."""
    n = sum(lengths)
    rel = np.zeros((n, n), np.int64)
    tid = np.zeros(n, np.int64)
    start, t = 0, 0
    for ln in lengths:
        for i in range(start, start + ln):
            tid[i] = t
            for j in range(start, start + ln):
                if i != j:
                    rel[i, j] = 2 if abs(i - j) == 1 else 1
        rel[np.arange(start, start + ln), np.arange(start, start + ln)] = 2
        start += ln
        t += 1
    return rel, tid


def _blockdiag_from_dense(rel, n_shards):
    return SL.blockdiag_relations(csr_matrix(rel), np.arange(len(rel)),
                                  n_shards)


def test_blocked_equals_dense_when_shard_aligned(rng):
    mesh = make_mesh(8)
    b_shard = 4
    # 8 shards x 4 samples; trajectory lengths chosen to tile shards exactly
    rel, _ = _traj_relations([4, 2, 2, 4, 1, 3, 4, 4, 2, 2, 4])
    B = len(rel)
    assert B == 32
    z = jnp.asarray(rng.randn(B, 64).astype(np.float32))
    rel_bd = jnp.asarray(_blockdiag_from_dense(rel, 8))

    dense = common.time_matching_loss(z, jnp.asarray(rel.astype(np.float32)),
                                      **W)
    blocked_fn = SL.make_traj_sharded_tm_loss(mesh)
    blocked = jax.jit(lambda z, r: blocked_fn(z, r, **W))(z, rel_bd)
    np.testing.assert_allclose(float(blocked), float(dense),
                               rtol=1e-6, atol=1e-7)


def test_blocked_gradients_match_dense(rng):
    mesh = make_mesh(8)
    rel, _ = _traj_relations([4] * 8)
    B = len(rel)
    z = jnp.asarray(rng.randn(B, 32).astype(np.float32))
    rel_d = jnp.asarray(rel.astype(np.float32))
    rel_bd = jnp.asarray(_blockdiag_from_dense(rel, 8))
    blocked_fn = SL.make_traj_sharded_tm_loss(mesh)

    g_dense = jax.grad(lambda z: common.time_matching_loss(z, rel_d, **W))(z)
    g_block = jax.jit(jax.grad(lambda z: blocked_fn(z, rel_bd, **W)))(z)
    np.testing.assert_allclose(np.asarray(g_block), np.asarray(g_dense),
                               rtol=1e-5, atol=1e-6)


def test_no_allgather_in_compiled_loss(rng):
    """The ring implementation must compile to collective-permutes, never an
    all-gather of z_flat — the whole point of the blocked loss."""
    mesh = make_mesh(8)
    from jax.sharding import NamedSharding, PartitionSpec as P

    B, L = 64, 512
    z = jax.device_put(rng.randn(B, L).astype(np.float32),
                       NamedSharding(mesh, P("data")))
    rel_bd = jax.device_put(np.zeros((B, B // 8), np.uint8),
                            NamedSharding(mesh, P("data")))
    blocked_fn = SL.make_traj_sharded_tm_loss(mesh)
    lowered = jax.jit(
        lambda z, r: blocked_fn(z, r.astype(jnp.float32), **W)).lower(z, rel_bd)
    hlo = lowered.compile().as_text()
    assert "collective-permute" in hlo
    assert "all-gather" not in hlo


def test_pack_trajectories_keeps_whole_trajs():
    _, tid = _traj_relations([4, 2, 2, 4, 1, 3, 4, 4, 2, 2, 4])
    bids = np.arange(32)
    packed = SL.pack_trajectories(bids, tid, 8)
    assert sorted(packed) == list(range(32))
    for k in range(8):
        chunk = packed[k * 4:(k + 1) * 4]
        # every trajectory present in a chunk must be fully inside it
        for t in np.unique(tid[chunk]):
            assert np.sum(tid[chunk] == t) == np.sum(tid == t)


def test_trajectory_ids_from_relations():
    rel, tid = _traj_relations([3, 5, 2])
    got = SL.trajectory_ids_from_relations(csr_matrix(rel), 10)
    # same partition (labels may be renumbered)
    for t in np.unique(tid):
        members = np.where(tid == t)[0]
        assert len(np.unique(got[members])) == 1
    assert len(np.unique(got)) == 3


def test_train_vqvae_traj_sharded_loss_runs(rng):
    from dynamorph_tpu.models import VQVAEz32
    from dynamorph_tpu.train.trainer import train_vqvae
    import tempfile

    mesh = make_mesh(8)
    rel, _ = _traj_relations([4] * 12)   # 48 samples
    dataset = rng.rand(48, 2, 16, 16).astype(np.float32)
    model = VQVAEz32(num_embeddings=8, num_hiddens=8, num_residual_hiddens=8,
                     vq_impl="xla")
    with tempfile.TemporaryDirectory() as d:
        params, state, hist = train_vqvae(
            model, dataset, d, relation_mat=csr_matrix(rel),
            n_epochs=2, batch_size=16, mesh=mesh, traj_sharded_loss=True,
            val_split_ratio=0.34, patience=5, transform=False)
    assert len(hist) == 2
    assert np.isfinite(hist[-1]["train"]["total_loss"])
    assert hist[-1]["train"]["time_matching_loss"] != 0.0


def test_step_losses_match_dense_path(rng):
    """One train step with the blocked loss == one step with the dense loss
    when the batch's trajectories tile the shards exactly."""
    import optax

    from dynamorph_tpu.models import VQVAEz32
    from dynamorph_tpu.train.steps import make_train_step

    mesh = make_mesh(8)
    rel, _ = _traj_relations([2] * 8)   # 16 samples, 2 per shard
    B = 16
    batch = rng.rand(B, 2, 16, 16).astype(np.float32)
    model = VQVAEz32(num_embeddings=8, num_hiddens=8, num_residual_hiddens=8,
                     vq_impl="xla")
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    key = jax.random.PRNGKey(1)

    dense_step = make_train_step(model, opt, mesh=mesh, augment=False)
    _, _, _, dense_losses = dense_step(
        params, state, opt_state, jnp.asarray(batch),
        jnp.asarray(rel.astype(np.uint8)), None, key)

    blocked_model = dataclasses.replace(
        model, tm_loss_fn=SL.make_traj_sharded_tm_loss(mesh))
    rel_bd = jnp.asarray(_blockdiag_from_dense(rel, 8))
    blocked_step = make_train_step(blocked_model, opt, mesh=mesh,
                                   augment=False)
    _, _, _, blocked_losses = blocked_step(
        params, state, opt_state, jnp.asarray(batch), rel_bd, None, key)

    for k in dense_losses:
        np.testing.assert_allclose(float(blocked_losses[k]),
                                   float(dense_losses[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)
