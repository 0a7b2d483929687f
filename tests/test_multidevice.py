"""Multi-device (8-way CPU mesh) sharding tests for the inference and
training paths."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamorph_tpu.core.mesh import (batch_sharding, make_mesh, shard_batch)
from dynamorph_tpu.models import VQVAEz16
from dynamorph_tpu.pipeline.patch_vae import encode_patches


@pytest.fixture(scope="module")
def model_and_params():
    model = VQVAEz16(num_embeddings=16, num_hiddens=8,
                     num_residual_hiddens=8, vq_impl="xla")
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    return model, params, state


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8


def test_encode_patches_sharded_matches_single(rng, model_and_params):
    model, params, state = model_and_params
    dataset = rng.rand(37, 2, 64, 64).astype(np.float32)  # non-divisible n
    mesh = make_mesh()
    z_b_m, z_a_m = encode_patches(model, params, state, dataset,
                                  batch_size=16, mesh=mesh)
    # single-device path: mesh of 1
    mesh1 = make_mesh(1)
    z_b_1, z_a_1 = encode_patches(model, params, state, dataset,
                                  batch_size=16, mesh=mesh1)
    np.testing.assert_allclose(z_b_m, z_b_1, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(z_a_m, z_a_1, atol=1e-5, rtol=1e-5)


def test_shard_batch_pads_and_distributes(rng):
    mesh = make_mesh()
    x = rng.rand(13, 4).astype(np.float32)
    xd, n_pad = shard_batch(x, mesh)
    assert n_pad == 3
    assert xd.shape == (16, 4)
    assert len(xd.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(xd)[:13], x)


def test_sharded_encode_inserts_no_host_transfers(rng, model_and_params):
    """The sharded encode must compile to one program over the mesh
    (smoke: jit with sharded inputs runs and output is fully addressable)."""
    model, params, state = model_and_params
    mesh = make_mesh()
    from jax.sharding import NamedSharding, PartitionSpec as P

    x = jax.device_put(rng.rand(16, 2, 64, 64).astype(np.float32),
                       NamedSharding(mesh, P("data")))
    p = jax.device_put(params, NamedSharding(mesh, P()))
    s = jax.device_put(state, NamedSharding(mesh, P()))
    zb, za, idx = jax.jit(lambda p, s, x: model.encode(p, s, x))(p, s, x)
    assert zb.shape == (16, 8, 8, 8)  # 64^2 input -> 8^2 latent grid
    assert np.isfinite(np.asarray(zb)).all()


def test_make_mesh_too_many_devices_errors():
    with pytest.raises(ValueError, match="requested 16 devices, found 8"):
        make_mesh(16)


def test_dryrun_multichip_bootstraps_from_pinned_backend():
    """The driver imports __graft_entry__ in a fresh interpreter whose jax
    backend is pinned to the (1-device) TPU plugin and calls
    dryrun_multichip(8) directly. The function must self-bootstrap an
    8-device CPU backend (subprocess re-exec) — regression for
    MULTICHIP_r01 ok:false."""
    import subprocess
    import sys
    import os

    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=580)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8): ok" in proc.stdout


def test_sharded_train_step_has_grad_allreduce(rng, model_and_params):
    """The data-parallel train step must compile to a gradient all-reduce
    (psum) with params replicated — the core DP collective — and must not
    fall back to per-batch host transfers."""
    import optax

    from dynamorph_tpu.train.steps import make_train_step

    model, params, state = model_and_params
    mesh = make_mesh()
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = make_train_step(model, opt, mesh=mesh, augment=True)
    batch = jnp.asarray(rng.rand(16, 2, 64, 64).astype(np.float32))
    rel = jnp.asarray(rng.randint(0, 3, (16, 16)).astype(np.uint8))
    bmask = jnp.asarray(rng.randint(0, 2, (16, 2, 64, 64)).astype(np.uint8))
    lowered = step.lower(params, state, opt_state, batch, rel, bmask,
                         jax.random.PRNGKey(0))
    hlo = lowered.compile().as_text()
    assert "all-reduce" in hlo, "no gradient all-reduce in sharded step"
    assert "outfeed" not in hlo and "infeed" not in hlo


def test_resnet_encode_batched_sharded_matches_single(rng):
    from dynamorph_tpu.models.resnet_simclr import EncodeProject

    model = EncodeProject(arch="ResNet18", num_inputs=2)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    data = rng.rand(19, 2, 64, 64).astype(np.float32)
    single = model.encode_batched(params, state, data, out="z", batch_size=8)
    sharded = model.encode_batched(params, state, data, out="z",
                                   batch_size=8, mesh=make_mesh())
    np.testing.assert_allclose(single, sharded, rtol=2e-5, atol=1e-5)


def test_triplet_step_sharded_matches_single_and_has_collectives(rng):
    """The triplet (ResNet/SimCLR) train step with a mesh must (a) equal the
    unsharded step numerically and (b) compile to a gradient all-reduce —
    regression for the mesh= parameter being accepted but unused."""
    import optax

    from dynamorph_tpu.models.resnet_simclr import EncodeProject
    from dynamorph_tpu.train.steps import make_triplet_steps

    model = EncodeProject(arch="ResNet18", num_inputs=2, cifar_head=True)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    # SGD, not Adam: Adam's first-step update is +-lr (sign of the grad), so
    # reduction-order float noise on near-zero grads would flip whole
    # elements by 2*lr and the param comparison would test nothing
    opt = optax.sgd(1e-2)
    opt_state = opt.init(params)
    labels = np.repeat(np.arange(4), 4)
    batch = jnp.asarray((rng.rand(16, 2, 32, 32) +
                         labels[:, None, None, None] * 0.5).astype(np.float32))
    labels = jnp.asarray(labels)

    step_1, eval_1 = make_triplet_steps(model, opt, mesh=None)
    mesh = make_mesh()
    step_m, eval_m = make_triplet_steps(model, opt, mesh=mesh)

    p1, s1, o1, l1 = step_1(params, state, opt_state, batch, labels)
    pm, sm, om, lm = step_m(params, state, opt_state, batch, labels)
    # losses are continuous across the miner's hinge boundaries -> tight
    for k in l1:
        np.testing.assert_allclose(float(lm[k]), float(l1[k]), rtol=2e-5,
                                   atol=1e-6, err_msg=k)
    # gradients are NOT comparable element-wise: the all-triplet hinge has
    # a dense active-set boundary, and a measured 1e-6 input perturbation
    # already moves single unsharded gradient entries by ~2.5% relative.
    # The meaningful check is update-norm agreement: the sharded update
    # must point essentially the same way, not match ulp-for-ulp.
    num = den = 0.0
    for a, b, p0 in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(pm),
                        jax.tree_util.tree_leaves(params)):
        a, b, p0 = map(np.asarray, (a, b, p0))
        num += float(np.sum((a - b) ** 2))
        den += float(np.sum((a - p0) ** 2))
    assert num <= 0.05 * den, (num, den)
    e1 = eval_1(p1, s1, batch, labels)
    em = eval_m(pm, sm, batch, labels)
    np.testing.assert_allclose(float(em["total_loss"]),
                               float(e1["total_loss"]), rtol=5e-3, atol=1e-4)

    hlo = step_m.lower(params, state, opt_state, batch,
                       labels).compile().as_text()
    assert "all-reduce" in hlo, "no gradient all-reduce in sharded triplet step"
    assert "outfeed" not in hlo and "infeed" not in hlo
