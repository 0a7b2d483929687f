"""Config loader + preprocess IO tests."""
import os

import numpy as np
import pytest

from conftest import REFERENCE_DIR, has_reference

from dynamorph_tpu.config import load_config
from dynamorph_tpu.io.sites import get_im_sites, group_sites_by_well
from dynamorph_tpu.pipeline.preprocess import (
    discover_sites, load_raw, write_raw_to_npy)


def test_loads_example_config():
    # Note: the reference's own config_example.yml is malformed YAML (trailing
    # comma after a quoted scalar at :134) and cannot be parsed by any YAML
    # loader including the reference's; we test our corrected copy, which
    # preserves the schema.
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(here, "configs/config_example.yml"))
    assert cfg.training.network == "VQ_VAE_z32"
    assert cfg.training.batch_size == 768
    assert cfg.training.num_embeddings == 512
    assert cfg.training.weight_matching == 100
    assert cfg.latent_encoding.network == "VQ_VAE_z16"
    assert cfg.latent_encoding.num_embeddings == 64
    assert cfg.segmentation_inference.window_size == 256
    assert cfg.segmentation_inference.num_pred_rnd == 5
    assert cfg.preprocess.z_slice == 2
    assert cfg.patch.num_cpus == 4
    assert cfg.dim_reduction.fit_model is False


@pytest.mark.skipif(not has_reference(), reason="no reference checkout")
def test_loads_reference_run_patch_config():
    cfg = load_config(os.path.join(REFERENCE_DIR, "configs/config_run_patch.yml"))
    assert cfg.patch.window_size == 256


def test_unknown_keys_warn_not_fail(tmp_path, caplog):
    p = tmp_path / "c.yml"
    p.write_text("training:\n  batch_size: 4\n  bogus_key: 1\n")
    cfg = load_config(str(p))
    assert cfg.training.batch_size == 4
    assert any("bogus_key" in r.message for r in caplog.records)


def test_missing_sections_get_defaults(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text("patch:\n  window_size: 128\n")
    cfg = load_config(str(p))
    assert cfg.patch.window_size == 128
    assert cfg.training.network == "VQ_VAE_z32"


def test_site_discovery_and_wells(tmp_path):
    for name in ["C5-Site_0.npy", "C5-Site_1.npy", "C4-Site_0.npy",
                 "C5-Site_0_NNProbabilities.npy"]:
        np.save(tmp_path / name, np.zeros(1))
    sites = get_im_sites(str(tmp_path))
    assert sites == ["C4-Site_0", "C5-Site_0", "C5-Site_1"]
    wells = group_sites_by_well(sites)
    assert set(wells) == {"C4", "C5"}
    assert wells["C5"] == ["C5-Site_0", "C5-Site_1"]


def _write_tiff(path, arr):
    import cv2

    cv2.imwrite(str(path), arr)


def test_load_raw_singlepage(tmp_path, rng):
    # files: <chan>_t###_z### singlepage tiffs, 2 timepoints, z002
    site_dir = tmp_path / "pos0"
    site_dir.mkdir()
    data = {}
    for chan in ["Phase2D", "Retardance"]:
        frames = []
        for t in range(2):
            img = (rng.rand(32, 32) * 65535).astype(np.uint16)
            _write_tiff(site_dir / f"img_{chan}_t{t:03d}_z002.tif", img)
            frames.append(img)
        data[chan] = np.stack(frames)
    files = [str(site_dir / f) for f in sorted(os.listdir(site_dir))]
    out = load_raw(files, ["Phase2D", "Retardance"], z_slice=2, multipage=False)
    assert out.shape == (2, 3, 1, 32, 32)
    np.testing.assert_array_equal(out[:, 0, 0], data["Phase2D"])
    np.testing.assert_array_equal(out[:, 1, 0], data["Retardance"])
    np.testing.assert_array_equal(out[:, 2, 0], 0)  # missing brightfield


def test_discover_sites_pos_dir(tmp_path):
    for pos in ["C5-Site_0", "C5-Site_1"]:
        d = tmp_path / pos
        d.mkdir()
        (d / "img_Phase2D_t000_z002.tif").touch()
    sites = discover_sites(str(tmp_path), "all", pos_dir=True)
    assert set(sites) == {"C5-Site_0", "C5-Site_1"}
    sites = discover_sites(str(tmp_path), ["C5-Site_1"], pos_dir=True)
    assert set(sites) == {"C5-Site_1"}


def test_discover_sites_flat_files(tmp_path):
    for t in range(2):
        for p in range(2):
            (tmp_path / f"img_t{t:03d}_p{p:03d}_z002.tif").touch()
    sites = discover_sites(str(tmp_path), "all", pos_dir=False)
    assert set(sites) == {0, 1}
    assert len(sites[0]) == 2
