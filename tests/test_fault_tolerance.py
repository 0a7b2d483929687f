"""Failure tolerance and idempotence: the pipeline degrades per-site instead
of crashing (reference behavior: pipeline/segmentation.py:76-86 per-site
try/except, generate_trajectories.py:431-433 empty-trajectory fallback,
extract_patches.py:204-210 reload-skip)."""
import os

import numpy as np
import pytest

from dynamorph_tpu.io.pickles import load_pickle, save_pickle


def test_tracking_degrades_to_empty_on_bad_inputs(tmp_path):
    """Corrupt positions (non-consecutive timepoints) -> warning + empty
    trajectories, not a crash."""
    from dynamorph_tpu.pipeline.patch import process_site_build_trajectory

    # timepoints 0 and 5: violates the consecutive-frames assertion
    cell_positions = {0: [(0, np.array([10, 10]))],
                      5: [(0, np.array([12, 12]))]}
    cell_pixel_assignments = {
        0: (np.array([[10, 10]]), np.array([0])),
        5: (np.array([[12, 12]]), np.array([0]))}
    save_pickle(cell_positions, str(tmp_path / "cell_positions.pkl"))
    save_pickle(cell_pixel_assignments,
                str(tmp_path / "cell_pixel_assignments.pkl"))
    with pytest.warns(UserWarning, match="No trajectory"):
        process_site_build_trajectory(str(tmp_path))
    trajs = load_pickle(str(tmp_path / "cell_traj.pkl"))
    assert trajs == [[], []]


def test_extract_patches_driver_skips_missing_sites(tmp_path, caplog):
    from dynamorph_tpu.config.schema import PatchConfig, PipelineConfig
    from dynamorph_tpu.pipeline.patch import extract_patches

    raw = tmp_path / "raw"
    supp = tmp_path / "supp"
    raw.mkdir()
    supp.mkdir()
    config = PipelineConfig(patch=PatchConfig(channels=[0, 1]))
    # site files don't exist -> logged error, no exception
    extract_patches(str(raw), str(supp), ["C5-Site_9"], config)
    assert any("not found" in r.message for r in caplog.records)


def test_extract_patches_reload_skips_existing(tmp_path, rng):
    """reload=True must not recompute existing stacks (idempotent re-run,
    reference extract_patches.py:204-210)."""
    from dynamorph_tpu.pipeline.patch import process_site_extract_patches
    from dynamorph_tpu.track.clustering import instance_clustering

    size = 256
    yy, xx = np.mgrid[:size, :size]
    img = rng.rand(2, 1, size, size) * 1000 + 30000
    fg = (yy - 128) ** 2 + (xx - 128) ** 2 < 15 ** 2
    img[:, 0][:, fg] += 10000
    bg = np.where(fg, 0.05, 0.97)
    mg = np.where(fg, 0.9, 0.02)
    seg = np.stack([bg, mg, 1 - bg - mg])[:, None]
    np.save(tmp_path / "s.npy", img[None])
    np.save(tmp_path / "s_NN.npy", seg[None])
    res = instance_clustering(seg, instance_map=False)
    save_pickle({0: res[0]}, str(tmp_path / "cell_positions.pkl"))
    save_pickle({0: res[1:]}, str(tmp_path / "cell_pixel_assignments.pkl"))

    process_site_extract_patches(str(tmp_path / "s.npy"),
                                 str(tmp_path / "s_NN.npy"), str(tmp_path),
                                 window_size=128, reload=False)
    stack_path = tmp_path / "stacks_0.pkl"
    mtime = os.path.getmtime(stack_path)
    # second run with reload=True: must skip (mtime unchanged)
    process_site_extract_patches(str(tmp_path / "s.npy"),
                                 str(tmp_path / "s_NN.npy"), str(tmp_path),
                                 window_size=128, reload=True)
    assert os.path.getmtime(stack_path) == mtime


def test_segmentation_driver_survives_bad_site(tmp_path, caplog, rng):
    """A site whose stack is corrupt is logged and skipped; the driver
    continues (reference pipeline/segmentation.py:76-86)."""
    from dynamorph_tpu.config.schema import (PipelineConfig,
                                             SegmentationInferenceConfig)
    from dynamorph_tpu.pipeline.segmentation import segmentation
    from dynamorph_tpu.seg.model import Segment
    from dynamorph_tpu.train.checkpoint import save_checkpoint

    raw = tmp_path / "raw"
    raw.mkdir()
    # corrupt stack: wrong ndim
    np.save(raw / "C5-Site_0.npy", np.zeros((4, 4)))
    model = Segment(input_shape=(2, 64, 64), n_classes=3,
                    model_path=str(tmp_path / "m"))
    weights = str(tmp_path / "w")
    model.save(weights)
    config = PipelineConfig(segmentation_inference=SegmentationInferenceConfig(
        channels=[0, 1], window_size=64, weights=weights, num_pred_rnd=1))
    segmentation(str(raw), str(tmp_path), None, ["C5-Site_0"], config)
    assert any("Error in predicting site" in r.message
               for r in caplog.records)


def test_fused_driver_survives_bad_site(tmp_path, caplog, rng):
    """The fused seg->patch driver degrades per site like the staged
    drivers (reference pipeline/segmentation.py:76-86): a corrupt site
    logs an error and the next site still processes."""
    import logging

    import numpy as np

    from dynamorph_tpu.config.schema import PipelineConfig
    from dynamorph_tpu.pipeline.fused import seg_patch_fused
    from dynamorph_tpu.seg.model import Segment

    # good site + corrupt site (wrong ndim)
    good = np.zeros((1, 2, 1, 64, 64), np.uint16)
    np.save(tmp_path / "C5-Site_0.npy", good)
    np.save(tmp_path / "C5-Site_1.npy", np.zeros((4, 4), np.uint16))

    model = Segment(input_shape=(2, 64, 64), n_classes=3)
    weights = str(tmp_path / "w")
    model.save(weights)
    config = PipelineConfig()
    config.segmentation_inference.channels = [0, 1]
    config.segmentation_inference.window_size = 64
    config.segmentation_inference.weights = weights
    config.patch.window_size = 32

    supp = str(tmp_path / "supp")
    with caplog.at_level(logging.ERROR):
        seg_patch_fused(str(tmp_path), supp, ["C5-Site_1", "C5-Site_0"],
                        config)
    assert "Error in fused seg->patch for site C5-Site_1" in caplog.text
    # the good site still produced its artifacts
    import os

    assert os.path.exists(os.path.join(supp, "C5-supps", "C5-Site_0",
                                       "cell_positions.pkl"))
