"""Compact (.npz float32) storage fast path: roundtrip parity with the
reference pickle contract, pipeline equivalence with ``storage: compact``,
and the two-way converter CLI (io/compact.py, cli/convert_storage.py).

The pickle formats being mirrored are the reference's
extract_patches.py:270-272 (stacks_<t>.pkl) and
pipeline/patch_VAE.py:166,:454-462 (static_patches / latents).
"""
import os

import numpy as np
import pytest

from dynamorph_tpu.io.compact import (convert_storage, load_array_any,
                                      load_stack_any, npz_path, pkl_path,
                                      resolve_any, save_array,
                                      save_stack_compact, storage_path)
from dynamorph_tpu.io.pickles import load_pickle, save_pickle

SITES = ["C5-Site_0", "C5-Site_1"]
WELL = "C5"
N_FRAMES = 2
CELLS = {0: [1, 2], 1: [1, 3]}


def _f32_origin(rng, *shape):
    """float64 values that are exactly representable in float32 — the real
    pipeline's stacks are produced on-device as float32 then cast
    (pipeline/patch.py::assemble_site_data)."""
    return (rng.rand(*shape) * 65535).astype(np.float32).astype(np.float64)


def _stack(rng, n=3):
    out = {}
    for i in range(n):
        mat = _f32_origin(rng, 4, 1, 64, 64)
        masked = mat * np.float64(np.float32(0.9))
        masked = masked.astype(np.float32).astype(np.float64)
        out[f"/supp/site/0_{i}.h5"] = {"mat": mat, "masked_mat": masked}
    return out


# ------------------------------------------------------------------ units


def test_paths():
    assert npz_path("a/b/stacks_0.pkl") == "a/b/stacks_0.npz"
    assert pkl_path("a/b/stacks_0.npz") == "a/b/stacks_0.pkl"
    assert storage_path("x.pkl", "compact") == "x.npz"
    assert storage_path("x.pkl", "pickle") == "x.pkl"
    with pytest.raises(ValueError):
        storage_path("x.pkl", "zarr")


def test_resolve_any(tmp_path):
    pkl = str(tmp_path / "a.pkl")
    npz = str(tmp_path / "a.npz")
    # neither exists: returns the given path
    assert resolve_any(pkl) == pkl
    save_pickle([1], pkl)
    assert resolve_any(npz) == pkl          # sibling found
    np.savez(npz, data=np.zeros(1))
    # both exist: the CLEARLY newest file wins regardless of the asked-for
    # extension — a re-run under a different storage setting rewrites only
    # its own extension, so a stale artifact must not shadow a fresh one
    os.utime(pkl, (100, 100))
    os.utime(npz, (200, 200))
    assert resolve_any(pkl) == npz
    assert resolve_any(npz) == npz
    os.utime(pkl, (300, 300))
    assert resolve_any(pkl) == pkl
    assert resolve_any(npz) == pkl
    # near-equal mtimes (copied/synced trees flatten them): the requested
    # extension wins instead of an arbitrary sub-second ordering
    os.utime(pkl, (400, 400))
    os.utime(npz, (401, 401))
    assert resolve_any(pkl) == pkl
    assert resolve_any(npz) == npz
    # explicit prefer still forces the extension
    assert resolve_any(pkl, prefer="npz") == npz
    assert resolve_any(npz, prefer="pkl") == pkl


def test_stack_roundtrip_exact(tmp_path, rng):
    stack = _stack(rng)
    path = str(tmp_path / "stacks_0.pkl")
    save_stack_compact(stack, path)
    assert os.path.exists(str(tmp_path / "stacks_0.npz"))
    back = load_stack_any(path)
    assert set(back) == set(stack)
    for k in stack:
        for field in ("mat", "masked_mat"):
            got = back[k][field]
            assert got.dtype == np.float32
            np.testing.assert_array_equal(got.astype(np.float64),
                                          stack[k][field])


def test_empty_stack_roundtrip(tmp_path):
    path = str(tmp_path / "stacks_0.npz")
    save_stack_compact({}, path)
    assert load_stack_any(path) == {}


def test_array_roundtrip(tmp_path, rng):
    arr = _f32_origin(rng, 5, 2, 1, 32, 32)
    path = str(tmp_path / "C5_static_patches.pkl")
    save_array(arr, path, storage="compact")
    back = load_array_any(path)
    assert back.dtype == np.float32
    np.testing.assert_array_equal(back.astype(np.float64), arr)
    # pickle storage keeps dtype untouched
    save_array(arr, path, storage="pickle")
    np.testing.assert_array_equal(load_array_any(path), arr)


def test_converter_both_ways(tmp_path, rng):
    stack = _stack(rng)
    src = str(tmp_path / "stacks_3.pkl")
    save_pickle(stack, src)
    dst = convert_storage(src, "compact")
    assert dst.endswith("stacks_3.npz")
    os.remove(src)
    back_pkl = convert_storage(dst, "pickle")
    back = load_pickle(back_pkl)
    assert set(back) == set(stack)
    for k in stack:
        assert back[k]["mat"].dtype == np.float64  # reference contract
        np.testing.assert_array_equal(back[k]["mat"], stack[k]["mat"])

    arr = _f32_origin(rng, 7, 16)
    asrc = str(tmp_path / "C5_latent_space.pkl")
    save_pickle(arr, asrc)
    adst = convert_storage(asrc, "compact")
    np.testing.assert_array_equal(
        load_array_any(adst).astype(np.float64), arr)
    np.testing.assert_array_equal(
        load_pickle(convert_storage(adst, "pickle")).astype(np.float64), arr)


def test_converter_restores_pickle_dtypes(tmp_path, rng):
    """--to pickle restores the reference dtype contract: a float64
    static_patches pickle round-trips back to float64 (the converter
    records the source dtype; pipeline-written compact files fall back to
    the filename contract), while float32 latents stay float32."""
    from dynamorph_tpu.io.compact import save_array_compact

    # converter round-trip: recorded dtype wins
    patches = _f32_origin(rng, 5, 8).astype(np.float64)
    src = str(tmp_path / "C5_static_patches.pkl")
    save_pickle(patches, src)
    dst = convert_storage(src, "compact")
    os.remove(src)
    back = load_pickle(convert_storage(dst, "pickle"))
    assert back.dtype == np.float64
    np.testing.assert_array_equal(back, patches)

    # pipeline-written compact static_patches (no recorded dtype): the
    # filename contract restores float64
    p2 = str(tmp_path / "C6_static_patches.npz")
    save_array_compact(patches, p2)
    back2 = load_pickle(convert_storage(p2, "pickle"))
    assert back2.dtype == np.float64
    np.testing.assert_array_equal(back2, patches)

    # latents stay float32 either way (they are float32 natively in the
    # reference pickle contract)
    lat = _f32_origin(rng, 4, 16).astype(np.float32)
    l1 = str(tmp_path / "C5_latent_space.pkl")
    save_pickle(lat, l1)
    ldst = convert_storage(l1, "compact")
    os.remove(l1)
    assert load_pickle(convert_storage(ldst, "pickle")).dtype == np.float32


def test_converter_rejects_unsupported(tmp_path):
    src = str(tmp_path / "C5_file_paths.pkl")
    save_pickle(["a", "b"], src)
    with pytest.raises(ValueError):
        convert_storage(src, "compact")
    with pytest.raises(ValueError):
        convert_storage(src + "x", "pickle")


def test_convert_storage_cli(tmp_path, rng):
    from dynamorph_tpu.cli.convert_storage import main as cli_main

    d = tmp_path / "supp" / "C5-supps" / "C5-Site_0"
    d.mkdir(parents=True)
    stack = _stack(rng)
    save_pickle(stack, str(d / "stacks_0.pkl"))
    save_pickle(_f32_origin(rng, 4, 8),
                str(tmp_path / "C5_latent_space.pkl"))
    # non-convertible artifacts must be skipped, not errored on
    save_pickle(["p"], str(tmp_path / "C5_file_paths.pkl"))
    save_pickle({}, str(tmp_path / "C5_static_patches_relations.pkl"))

    rc = cli_main(["--to", "compact", str(tmp_path), "--delete-source"])
    assert rc == 0
    assert os.path.exists(str(d / "stacks_0.npz"))
    assert not os.path.exists(str(d / "stacks_0.pkl"))
    assert os.path.exists(str(tmp_path / "C5_latent_space.npz"))
    assert os.path.exists(str(tmp_path / "C5_file_paths.pkl"))

    rc = cli_main(["--to", "pickle", str(tmp_path)])
    assert rc == 0
    back = load_pickle(str(d / "stacks_0.pkl"))
    for k in stack:
        np.testing.assert_array_equal(back[k]["mat"], stack[k]["mat"])


# ------------------------------------------------------- pipeline parity


def _make_well(tmp_path, rng, storage="pickle"):
    """Synthetic well in the reference layout (mirrors
    tests/test_pipeline_vae.py) with float32-origin patch values."""
    from dynamorph_tpu.io.compact import save_stack

    raw = tmp_path / f"raw_{storage}"
    supp = tmp_path / f"supp_{storage}"
    raw.mkdir()
    for site in SITES:
        folder = supp / f"{WELL}-supps" / site
        folder.mkdir(parents=True)
        for t in range(N_FRAMES):
            stack = {}
            for cid in CELLS[t]:
                key = os.path.join(str(folder), f"{t}_{cid}.h5")
                mat = _f32_origin(rng, 4, 1, 256, 256)
                masked = (mat.astype(np.float32) * np.float32(0.9)
                          ).astype(np.float64)
                stack[key] = {"mat": mat, "masked_mat": masked}
            save_stack(stack, str(folder / f"stacks_{t}.pkl"),
                       storage=storage)
        trajs = [{0: 1, 1: 1}]
        traj_pos = [{0: (100, 100), 1: (110, 105)}]
        save_pickle([trajs, traj_pos], str(folder / "cell_traj.pkl"))
    return str(raw), str(supp)


def _config(storage):
    from dynamorph_tpu.config.schema import (LatentEncodingConfig,
                                             PipelineConfig)

    return PipelineConfig(latent_encoding=LatentEncodingConfig(
        channels=[0, 1], patch_type="masked_mat", network="VQ_VAE_z16",
        num_hiddens=16, num_residual_hiddens=32, num_embeddings=64,
        save_output=False, storage=storage))


def test_assemble_compact_matches_pickle(tmp_path):
    """assemble_vae over compact stacks == over pickle stacks: identical
    file paths / relations / labels, static patches equal to float32
    rounding (the pickle path resizes in float64)."""
    from dynamorph_tpu.pipeline.patch_vae import assemble_vae

    rng_a, rng_b = np.random.RandomState(3), np.random.RandomState(3)
    raw_p, supp_p = _make_well(tmp_path, rng_a, storage="pickle")
    raw_c, supp_c = _make_well(tmp_path, rng_b, storage="compact")

    assemble_vae(raw_p, supp_p, SITES, _config("pickle"))
    assemble_vae(raw_c, supp_c, SITES, _config("compact"))

    fs_p = load_pickle(os.path.join(raw_p, f"{WELL}_file_paths.pkl"))
    fs_c = load_pickle(os.path.join(raw_c, f"{WELL}_file_paths.pkl"))
    assert [os.path.basename(f) for f in fs_p] == \
           [os.path.basename(f) for f in fs_c]

    ds_p = load_pickle(os.path.join(raw_p, f"{WELL}_static_patches.pkl"))
    ds_c = load_array_any(os.path.join(raw_c, f"{WELL}_static_patches.pkl"))
    assert os.path.exists(os.path.join(raw_c, f"{WELL}_static_patches.npz"))
    assert ds_c.dtype == np.float32
    np.testing.assert_allclose(ds_c, ds_p, rtol=2e-7, atol=1e-2)

    rel_p = load_pickle(
        os.path.join(raw_p, f"{WELL}_static_patches_relations.pkl"))
    rel_c = load_pickle(
        os.path.join(raw_c, f"{WELL}_static_patches_relations.pkl"))
    assert rel_p == rel_c
    lab_p = load_pickle(
        os.path.join(raw_p, f"{WELL}_static_patches_labels.pkl"))
    lab_c = load_pickle(
        os.path.join(raw_c, f"{WELL}_static_patches_labels.pkl"))
    np.testing.assert_array_equal(np.asarray(lab_p), np.asarray(lab_c))


def test_process_vae_compact_latents(tmp_path):
    """process_vae with storage=compact writes .npz latents numerically
    equal (f32) to the pickle run, and reduce/pca reads them."""
    import jax

    from dynamorph_tpu.models import VQVAEz16
    from dynamorph_tpu.pipeline.patch_vae import assemble_vae, process_vae
    from dynamorph_tpu.train.checkpoint import save_checkpoint

    rng_a, rng_b = np.random.RandomState(5), np.random.RandomState(5)
    raw_p, supp_p = _make_well(tmp_path, rng_a, storage="pickle")
    raw_c, supp_c = _make_well(tmp_path, rng_b, storage="compact")

    model = VQVAEz16(num_embeddings=64, num_hiddens=16,
                     num_residual_hiddens=32)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "model_weights")
    save_checkpoint(ckpt, {"params": params, "state": state})

    cfg_p, cfg_c = _config("pickle"), _config("compact")
    cfg_p.latent_encoding.weights = ckpt
    cfg_c.latent_encoding.weights = ckpt

    assemble_vae(raw_p, supp_p, SITES, cfg_p)
    assemble_vae(raw_c, supp_c, SITES, cfg_c)
    process_vae(raw_p, supp_p, SITES, cfg_p, batch_size=4)
    process_vae(raw_c, supp_c, SITES, cfg_c, batch_size=4)

    out_p = os.path.join(raw_p, "model_weights")
    out_c = os.path.join(raw_c, "model_weights")
    for suffix in ("", "_after"):
        z_p = load_pickle(
            os.path.join(out_p, f"{WELL}_latent_space{suffix}.pkl"))
        npz = os.path.join(out_c, f"{WELL}_latent_space{suffix}.npz")
        assert os.path.exists(npz)
        z_c = load_array_any(npz)
        np.testing.assert_allclose(z_c, z_p, rtol=2e-6, atol=1e-5)

    # dim reduction consumes the compact latents transparently
    from dynamorph_tpu.pipeline.dim_reduction import dim_reduction

    cfg_c.dim_reduction.file_name_prefixes = WELL
    cfg_c.dim_reduction.conditions = None
    weights = str(tmp_path / "pca")
    cfg_c.dim_reduction.fit_model = True
    dim_reduction("pca", [out_c], [out_c], weights, cfg_c)
    cfg_c.dim_reduction.fit_model = False
    dim_reduction("pca", [out_c], [out_c], weights, cfg_c)
    pcaed = load_pickle(
        os.path.join(out_c, f"{WELL}_latent_space_after_PCAed.pkl"))
    assert pcaed.ndim == 2 and len(pcaed) > 0


def test_extract_patches_compact_matches_pickle(tmp_path, rng):
    """process_site_extract_patches(storage='compact') writes stacks_<t>.npz
    with values exactly equal to the pickle run's float64 stacks."""
    from dynamorph_tpu.pipeline.patch import process_site_extract_patches
    from dynamorph_tpu.track.clustering import instance_clustering

    size, n_frames = 512, 1
    yy, xx = np.mgrid[:size, :size]
    centers = rng.randint(80, size - 80, size=(3, 2))
    img = rng.rand(2, 1, size, size) * 1000 + 30000
    fg = np.zeros((size, size), bool)
    for cy, cx in centers:
        m = (yy - cy) ** 2 + (xx - cx) ** 2 < 18 ** 2
        fg |= m
        img[:, 0][:, m] += 10000
    bg = np.where(fg, 0.05, 0.97)
    mg = np.where(fg, 0.9, 0.02)
    seg = np.stack([bg, mg, 1.0 - bg - mg])[:, None]
    images = np.stack([img] * n_frames)
    segs = np.stack([seg] * n_frames)

    raw_path = str(tmp_path / "site.npy")
    seg_path = str(tmp_path / "site_NNProbabilities.npy")
    np.save(raw_path, images)
    np.save(seg_path, segs)
    cpos, cpix = {}, {}
    for t in range(n_frames):
        res = instance_clustering(segs[t], instance_map=False)
        cpos[t] = res[0]
        cpix[t] = res[1:]
    assert len(cpos[0]) > 0

    dirs = {}
    for storage in ("pickle", "compact"):
        d = tmp_path / storage
        d.mkdir()
        save_pickle(cpos, str(d / "cell_positions.pkl"))
        save_pickle(cpix, str(d / "cell_pixel_assignments.pkl"))
        process_site_extract_patches(raw_path, seg_path, str(d),
                                     window_size=256, channels=None,
                                     reload=False, storage=storage)
        dirs[storage] = str(d)

    for t in range(n_frames):
        pkl = load_pickle(os.path.join(dirs["pickle"], f"stacks_{t}.pkl"))
        npz = os.path.join(dirs["compact"], f"stacks_{t}.npz")
        assert os.path.exists(npz)
        assert not os.path.exists(
            os.path.join(dirs["compact"], f"stacks_{t}.pkl"))
        cmp = load_stack_any(npz)
        key = lambda k: os.path.basename(k)  # noqa: E731
        assert {key(k) for k in cmp} == {key(k) for k in pkl}
        pkl_by = {key(k): v for k, v in pkl.items()}
        for k, v in cmp.items():
            for field in ("mat", "masked_mat"):
                np.testing.assert_array_equal(
                    v[field].astype(np.float64), pkl_by[key(k)][field])

    # reload from compact is honoured (no re-extraction error path)
    process_site_extract_patches(raw_path, seg_path, dirs["compact"],
                                 window_size=256, channels=None,
                                 reload=True, storage="compact")
