"""End-to-end VAE pipeline stage parity on a synthetic well.

Builds synthetic stacks_*.pkl + cell_traj.pkl for two sites, then checks:
- assemble_vae output (dataset order, resize, relations, labels) matches the
  reference implementations run on the same files
- process_vae latents match direct torch enc/vq of the normalised dataset
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
    from HiddenStateExtractor.vq_vae_supp import prepare_dataset_v2 as ref_prepare
    from SingleCellPatch.generate_trajectories import (
        process_well_generate_trajectory_relations as ref_relations)
    from HiddenStateExtractor import vae as ref_vae

from dynamorph_tpu.config.schema import PipelineConfig, LatentEncodingConfig
from dynamorph_tpu.io.pickles import save_pickle, load_pickle
from dynamorph_tpu.pipeline.patch_vae import (
    assemble_vae, process_vae, prepare_dataset, trajectory_matching)

SITES = ["C5-Site_0", "C5-Site_1"]
WELL = "C5"
N_FRAMES = 2
CELLS = {0: [1, 2], 1: [1, 3]}  # per-frame cell ids


def _make_well(tmp_path, rng):
    raw = tmp_path / "raw"
    supp = tmp_path / "supp"
    raw.mkdir()
    for site in SITES:
        folder = supp / f"{WELL}-supps" / site
        folder.mkdir(parents=True)
        trajs = []
        for t in range(N_FRAMES):
            stack = {}
            for cid in CELLS[t]:
                key = os.path.join(str(folder), f"{t}_{cid}.h5")
                mat = rng.rand(4, 1, 256, 256) * 65535       # 2 img + tm + tm2
                masked = mat.copy()
                masked[:2] *= 0.9
                stack[key] = {"mat": mat.astype("float64"),
                              "masked_mat": masked.astype("float64")}
            save_pickle(stack, str(folder / f"stacks_{t}.pkl"))
        # one trajectory linking cell 1 across both frames
        trajs = [{0: 1, 1: 1}]
        traj_pos = [{0: (100, 100), 1: (110, 105)}]
        save_pickle([trajs, traj_pos], str(folder / "cell_traj.pkl"))
    return str(raw), str(supp)


@pytest.fixture
def config():
    return PipelineConfig(latent_encoding=LatentEncodingConfig(
        channels=[0, 1], patch_type="masked_mat", network="VQ_VAE_z16",
        num_hiddens=16, num_residual_hiddens=32, num_embeddings=64,
        save_output=False))


def test_assemble_matches_reference(tmp_path, rng, config):
    raw, supp = _make_well(tmp_path, rng)
    assemble_vae(raw, supp, SITES, config)

    fs = load_pickle(os.path.join(raw, f"{WELL}_file_paths.pkl"))
    dataset = load_pickle(os.path.join(raw, f"{WELL}_static_patches.pkl"))
    relations = load_pickle(
        os.path.join(raw, f"{WELL}_static_patches_relations.pkl"))
    labels = load_pickle(
        os.path.join(raw, f"{WELL}_static_patches_labels.pkl"))

    # reference pipeline on the same inputs
    dat_fs = []
    for site in SITES:
        folder = os.path.join(supp, f"{WELL}-supps", site)
        dat_fs.extend(os.path.join(folder, f) for f in sorted(os.listdir(folder))
                      if f.startswith("stacks"))
    ref_dataset, ref_fs = ref_prepare(dat_fs, channels=[0, 1], key="masked_mat")
    ref_rel, ref_labels = ref_relations(
        ref_fs, SITES, os.path.join(supp, f"{WELL}-supps"))

    assert fs == ref_fs
    np.testing.assert_allclose(dataset, ref_dataset, atol=1e-8)
    assert relations == ref_rel
    np.testing.assert_array_equal(labels, ref_labels)


def test_process_vae_latents_match_torch(tmp_path, rng, config):
    raw, supp = _make_well(tmp_path, rng)
    assemble_vae(raw, supp, SITES, config)

    # trained torch weights as the reference checkpoint format
    torch.manual_seed(7)
    tmodel = ref_vae.VQ_VAE_z16(num_inputs=2, num_hiddens=16,
                                num_residual_hiddens=32, num_residual_layers=2,
                                num_embeddings=64, device="cpu")
    tmodel.eval()
    weights_dir = tmp_path / "weights"
    weights_dir.mkdir()
    torch.save(tmodel.state_dict(), str(weights_dir / "model.pt"))
    config.latent_encoding.weights = str(weights_dir)

    process_vae(raw, supp, SITES, config, batch_size=4)

    out_dir = os.path.join(raw, "weights")
    z_b = load_pickle(os.path.join(out_dir, f"{WELL}_latent_space.pkl"))
    z_a = load_pickle(os.path.join(out_dir, f"{WELL}_latent_space_after.pkl"))

    # reference-style latents: unbatched torch loop over zscore_patch data
    from dynamorph_tpu.train.data import zscore_patch

    dataset = load_pickle(os.path.join(raw, f"{WELL}_static_patches.pkl"))
    norm = zscore_patch(np.squeeze(dataset)).astype(np.float32)
    z_b_ref, z_a_ref = [], []
    with torch.no_grad():
        for i in range(len(norm)):
            zb = tmodel.enc(torch.from_numpy(norm[i: i + 1]))
            za, _, _ = tmodel.vq(zb)
            z_b_ref.append(zb.numpy().reshape(-1))
            z_a_ref.append(za.numpy().reshape(-1))
    z_b_ref = np.stack(z_b_ref)
    z_a_ref = np.stack(z_a_ref)

    assert z_b.shape == z_b_ref.shape
    mse = np.mean((z_b - z_b_ref) ** 2)
    assert mse < 1e-5, f"latent MSE {mse}"
    np.testing.assert_allclose(z_a, z_a_ref, atol=1e-4)


def test_on_device_normalization_matches_host(rng):
    """encode_patches(normalize='patch') == host zscore_patch + encode,
    within the 1e-5 latent-parity tolerance."""
    import jax

    from dynamorph_tpu.models import VQVAEz16
    from dynamorph_tpu.pipeline.patch_vae import encode_patches
    from dynamorph_tpu.train.data import zscore_patch

    model = VQVAEz16(num_embeddings=16, num_hiddens=8,
                     num_residual_hiddens=8, vq_impl="xla")
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    raw = (rng.rand(10, 2, 64, 64) * 65535).astype(np.float64)

    host_norm = zscore_patch(raw).astype(np.float32)
    z_b_host, z_a_host = encode_patches(model, params, state, host_norm,
                                        batch_size=4)
    z_b_dev, z_a_dev = encode_patches(model, params, state,
                                      raw.astype(np.float32), batch_size=4,
                                      normalize="patch")
    mse = np.mean((z_b_host - z_b_dev) ** 2)
    assert mse < 1e-5, mse


@pytest.mark.skipif(not has_reference(), reason="no reference checkout")
def test_combine_dataset_matches_reference(tmp_path, rng):
    """Multi-well dataset merge: global name sort, relation re-indexing."""
    # the reference module chain imports torchvision (absent here); stub it
    import types

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_models = types.ModuleType("torchvision.models")
        tv_resnet = types.ModuleType("torchvision.models.resnet")

        class _Fake:
            pass

        tv_resnet.ResNet = type("ResNet", (), {"__init__":
                                               lambda self, *a, **k: None})
        tv_resnet.BasicBlock = _Fake
        tv_resnet.Bottleneck = _Fake
        tv_models.resnet = tv_resnet
        tv.models = tv_models
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv_models
        sys.modules["torchvision.models.resnet"] = tv_resnet
    from pipeline.patch_VAE import combine_dataset as ref_combine

    from dynamorph_tpu.pipeline.patch_vae import combine_dataset

    def make_well(name, n, offset):
        fs = [f"/supp/{name}-supps/{name}-Site_0/{t}_{c}.h5"
              for t, c in zip(range(n), range(offset, offset + n))]
        data = rng.rand(n, 2, 128, 128)
        rel = {(i, i): 2 for i in range(n)}
        if n > 1:
            rel[(0, 1)] = rel[(1, 0)] = 2
        return fs, data, rel

    for d, prefix in [(tmp_path / "ours", "o"), (tmp_path / "ref", "r")]:
        d.mkdir()
    names_ours, names_ref = [], []
    rng_state = rng.get_state()
    for base, names in [(tmp_path / "ours", names_ours),
                        (tmp_path / "ref", names_ref)]:
        rng.set_state(rng_state)  # identical data for both trees
        for well, n, off in [("C4", 3, 0), ("C5", 2, 10)]:
            fs, data, rel = make_well(well, n, off)
            name = str(base / well)
            save_pickle(fs, name + "_file_paths.pkl")
            save_pickle(data, name + "_static_patches.pkl")
            save_pickle(rel, name + "_static_patches_relations.pkl")
            names.append(name)

    combine_dataset(names_ours, str(tmp_path / "ours" / "ALL"),
                    save_mask=False)
    ref_combine(names_ref, str(tmp_path / "ref" / "ALL"), save_mask=False)

    for suffix in ["_file_paths.pkl", "_static_patches.pkl",
                   "_static_patches_relations.pkl"]:
        ours = load_pickle(str(tmp_path / "ours" / ("ALL" + suffix)))
        ref = load_pickle(str(tmp_path / "ref" / ("ALL" + suffix)))
        if isinstance(ours, np.ndarray):
            np.testing.assert_allclose(ours, ref)
        else:
            assert ours == ref


def test_trajectory_matching(tmp_path, rng, config):
    raw, supp = _make_well(tmp_path, rng)
    assemble_vae(raw, supp, SITES, config)
    trajectory_matching(raw, supp, SITES, config)
    trajs = load_pickle(os.path.join(raw, f"{WELL}_trajectories.pkl"))
    # one trajectory per site, each covering 2 frames
    assert len(trajs) == 2
    for name, tr in trajs.items():
        assert len(tr) == 2
