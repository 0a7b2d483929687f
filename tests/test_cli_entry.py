"""Smoke tests for the thin CLI entry points (argv parsing + method
dispatch + directory fan-out): run_preproc, run_vae -m process,
run_segmentation -m segmentation, export_torch. The heavy pipeline
functions behind them are covered elsewhere; these pin the `main()` wiring
that mirrors the reference run_*.py entry scripts.
"""
import os
import sys

import numpy as np
import pytest
import yaml

from dynamorph_tpu.io.pickles import load_pickle, save_pickle


def _write_cfg(tmp_path, sections, name="cfg.yml"):
    p = tmp_path / name
    p.write_text(yaml.safe_dump(sections))
    return str(p)


def test_multihost_partial_flags_rejected():
    """--num-processes/--process-id without --coordinator must error rather
    than silently auto-detect the topology (cli/common.py)."""
    import argparse

    from dynamorph_tpu.cli.common import init_multihost_from_args

    args = argparse.Namespace(multihost=True, coordinator=None,
                              num_processes=2, process_id=0)
    with pytest.raises(SystemExit):
        init_multihost_from_args(args)
    # multihost off: flags ignored entirely, no init attempted
    args = argparse.Namespace(multihost=False, coordinator=None,
                              num_processes=2, process_id=None)
    init_multihost_from_args(args)


def test_run_preproc_cli(tmp_path, monkeypatch):
    """pos_dir TIFF layout -> (T, 3, 1, Y, X) npy per site (reference
    run_preproc.py)."""
    import cv2

    src = tmp_path / "src"
    out = tmp_path / "out"
    pos = src / "C5-Site_0"
    pos.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for t in range(2):
        for chan in ("Phase2D", "Retardance", "Brightfield"):
            img = (rng.rand(32, 32) * 60000).astype(np.uint16)
            cv2.imwrite(str(pos / f"img_{chan}_t{t:03d}_z002.tif"), img)

    cfg = _write_cfg(tmp_path, {"preprocess": {
        "image_dirs": [str(src)], "target_dirs": [str(out)],
        "channels": ["Phase2D", "Retardance", "Brightfield"],
        "pos_dir": True, "z_slice": 2}})
    from dynamorph_tpu.cli import run_preproc

    monkeypatch.setattr(sys, "argv", ["run_preproc", "-c", cfg])
    run_preproc.main()
    stack = np.load(out / "C5-Site_0.npy")
    assert stack.shape == (2, 3, 1, 32, 32)


def test_run_vae_process_cli(tmp_path, monkeypatch):
    """run_vae -m process: site discovery -> prefetch loop -> latent
    pickles per well (reference run_VAE.py:73-95)."""
    import jax

    from dynamorph_tpu.cli import run_vae
    from dynamorph_tpu.models import VQVAEz16
    from dynamorph_tpu.train.checkpoint import save_checkpoint

    raw = tmp_path / "raw"
    raw.mkdir()
    # site npy so get_im_sites discovers the well
    np.save(raw / "C5-Site_0.npy", np.zeros((1, 2, 1, 32, 32), np.uint16))
    n = 12
    rng = np.random.RandomState(0)
    save_pickle((rng.rand(n, 2, 1, 128, 128) * 60000).astype(np.float64),
                str(raw / "C5_static_patches.pkl"))
    save_pickle([f"C5/{i}" for i in range(n)],
                str(raw / "C5_file_paths.pkl"))

    model = VQVAEz16(num_embeddings=16, num_hiddens=8,
                     num_residual_hiddens=8)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "weights")
    save_checkpoint(ckpt, {"params": params, "state": state})

    cfg = _write_cfg(tmp_path, {"latent_encoding": {
        "raw_dirs": [str(raw)], "supp_dirs": [str(raw)],
        "weights": ckpt, "network": "VQ_VAE_z16", "num_hiddens": 8,
        "num_residual_hiddens": 8, "num_embeddings": 16,
        "save_output": False, "channels": [0, 1]}})
    monkeypatch.setattr(sys, "argv",
                        ["run_vae", "-m", "process", "-c", cfg])
    run_vae.main()

    out_dir = raw / "weights"
    z_b = load_pickle(str(out_dir / "C5_latent_space.pkl"))
    z_a = load_pickle(str(out_dir / "C5_latent_space_after.pkl"))
    assert z_b.shape == (n, 8 * 16 * 16) and np.isfinite(z_b).all()
    assert z_a.shape == z_b.shape


def test_run_segmentation_cli_direct(tmp_path, monkeypatch):
    """run_segmentation -m segmentation with direct inference mode writes
    NNProbabilities per discovered site."""
    from dynamorph_tpu.cli import run_segmentation
    from dynamorph_tpu.seg.model import Segment

    raw = tmp_path / "raw"
    supp = tmp_path / "supp"
    raw.mkdir()
    supp.mkdir()
    np.save(raw / "C5-Site_0.npy",
            (np.random.RandomState(0).rand(2, 2, 1, 64, 64)
             * 60000).astype(np.uint16))
    model = Segment(input_shape=(2, 64, 64), n_classes=3)
    weights = str(tmp_path / "w")
    model.save(weights)

    cfg = _write_cfg(tmp_path, {"segmentation_inference": {
        "raw_dirs": [str(raw)], "supp_dirs": [str(supp)],
        "weights": weights, "channels": [0, 1], "window_size": 64,
        "inference_mode": "direct"}})
    monkeypatch.setattr(sys, "argv",
                        ["run_segmentation", "-m", "segmentation",
                         "-c", cfg])
    run_segmentation.main()
    probs = np.load(raw / "C5-Site_0_NNProbabilities.npy")
    assert probs.shape == (2, 3, 1, 64, 64)
    np.testing.assert_allclose(probs.sum(1), 1.0, rtol=1e-5)


def test_export_torch_cli(tmp_path, monkeypatch):
    """export_torch writes a reference-format model.pt from an orbax
    checkpoint; torch can load it back."""
    import jax

    from dynamorph_tpu.cli import export_torch
    from dynamorph_tpu.models import VQVAEz16
    from dynamorph_tpu.train.checkpoint import save_checkpoint

    model = VQVAEz16(num_embeddings=16, num_hiddens=8,
                     num_residual_hiddens=8)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "ck")
    save_checkpoint(ckpt, {"params": params, "state": state})
    out = str(tmp_path / "model.pt")
    monkeypatch.setattr(sys, "argv",
                        ["export_torch", "--checkpoint", ckpt,
                         "--network", "VQ_VAE_z16", "--out", out])
    export_torch.main()

    import torch

    sd = torch.load(out, map_location="cpu", weights_only=False)
    assert any(k.startswith("enc.") for k in sd)
    assert "vq.w.weight" in sd or any("vq" in k for k in sd)
