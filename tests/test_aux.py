"""Auxiliary components: 2.5D segmentation, morphology features, trajectory
GIFs, rotated patch extraction vs reference."""
import os
import sys

import numpy as np
import pytest

from conftest import REFERENCE_DIR, has_reference


def test_segment_multislice_shapes(rng, tmp_path):
    from dynamorph_tpu.seg.model import SegmentWithMultipleSlice

    model = SegmentWithMultipleSlice(unet_feat=8,
                                     input_shape=(2, 3, 64, 64),
                                     n_classes=3,
                                     model_path=str(tmp_path))
    x = rng.rand(2, 2, 3, 64, 64).astype(np.float32)
    y = model.predict(x)
    assert y.shape == (2, 3, 1, 64, 64)
    np.testing.assert_allclose(np.asarray(y).sum(1), 1.0, atol=1e-5)


def test_morphology_features(rng):
    from dynamorph_tpu.analysis.morphology import (
        get_angle_apr, get_aspect_ratio_no_rotation, get_intensity_profile,
        get_size)

    mask = np.zeros((64, 64))
    mask[20:40, 25:35] = 1  # 20x10 rectangle, long axis vertical
    size, area = get_size(mask)
    assert size == 200
    assert 150 <= area <= 200
    w, h = get_aspect_ratio_no_rotation(mask)
    assert (w, h) == (10, 20)
    rw, rh, angle = get_angle_apr(mask)
    assert max(rw, rh) >= 19  # long axis aligned after rotation

    dat = [rng.rand(64, 64) * 65535 for _ in range(2)]
    # mask=None means whole-patch profile (the reference's None default is
    # a latent crash, cv2_feature.py:104); equal to an all-ones mask
    prof_none = get_intensity_profile(dat)
    prof_ones = get_intensity_profile(dat, np.ones(dat[0].shape, bool))
    assert repr(prof_none) == repr(prof_ones)
    profile = get_intensity_profile(dat, mask)
    assert len(profile) == 2 and len(profile[0]) == 4
    peak, q95, top200, total = profile[0]
    assert 0 <= q95 <= peak <= 1.0


def test_save_traj_bbox_gif(tmp_path, rng):
    from dynamorph_tpu.track.visualize import save_traj_bbox

    stack = (rng.rand(3, 256, 256, 2) * 65535).astype(np.uint16)
    traj = {0: 1, 1: 1, 2: 1}
    traj_pos = {0: np.array([100, 100]), 1: np.array([110, 105]),
                2: np.array([120, 110])}
    path = str(tmp_path / "traj.gif")
    save_traj_bbox(traj, traj_pos, stack, path)
    from PIL import Image

    im = Image.open(path)
    assert im.n_frames == 3
    assert im.size == (512, 512)


@pytest.mark.skipif(not has_reference(), reason="no reference checkout")
def test_align_axis_extraction_matches_reference(tmp_path, rng):
    sys.path.insert(0, REFERENCE_DIR)
    from SingleCellPatch import extract_patches as ref_ep

    from dynamorph_tpu.io.pickles import load_pickle, save_pickle
    from dynamorph_tpu.pipeline.patch import (
        get_cell_rect_angle, process_site_extract_patches_align_axis)
    from dynamorph_tpu.track.clustering import instance_clustering

    # synthetic scene (same generator as test_patch_track)
    size = 512
    yy, xx = np.mgrid[:size, :size]
    img = rng.rand(2, 1, size, size) * 1000 + 30000
    fg = np.zeros((size, size), bool)
    centers = rng.randint(120, size - 120, size=(3, 2))
    for cy, cx in centers:
        m = ((yy - cy) / 24.0) ** 2 + ((xx - cx) / 12.0) ** 2 < 1  # ellipses
        fg |= m
        img[:, 0][:, m] += 10000
    bg = np.where(fg, 0.05, 0.97)
    mg = np.where(fg, 0.9, 0.02)
    seg = np.stack([bg, mg, 1 - bg - mg])[:, None]
    images, segs = img[None], seg[None]

    raw_path = tmp_path / "s.npy"
    seg_path = tmp_path / "s_NNProbabilities.npy"
    np.save(raw_path, images)
    np.save(seg_path, segs)
    res = instance_clustering(segs[0], instance_map=False)
    cpos = {0: res[0]}
    cpix = {0: res[1:]}

    ours_dir = tmp_path / "ours"
    ref_dir = tmp_path / "ref"
    for d in (ours_dir, ref_dir):
        d.mkdir()
        save_pickle(cpos, str(d / "cell_positions.pkl"))
        save_pickle(cpix, str(d / "cell_pixel_assignments.pkl"))

    process_site_extract_patches_align_axis(
        str(raw_path), str(seg_path), str(ours_dir), window_size=256)

    # the reference targets cv2 3.x (`_, contours, _ = findContours`); shim
    # the 4.x API so the reference code can run in this environment
    import cv2 as _cv2

    orig_find = _cv2.findContours

    def _find_contours_3x(*args, **kwargs):
        out = orig_find(*args, **kwargs)
        return (None,) + out if len(out) == 2 else out

    _cv2.findContours = _find_contours_3x
    try:
        ref_ep.process_site_extract_patches_align_axis(
            str(raw_path), str(seg_path), str(ref_dir), window_size=256)
    finally:
        _cv2.findContours = orig_find

    ours = load_pickle(str(ours_dir / "stacks_rotated_0.pkl"))
    ref = load_pickle(str(ref_dir / "stacks_rotated_0.pkl"))
    assert {os.path.basename(k) for k in ours} == \
           {os.path.basename(k) for k in ref}
    for k_o in ours:
        k_r = [k for k in ref
               if os.path.basename(k) == os.path.basename(k_o)][0]
        for field in ("mat", "masked_mat"):
            np.testing.assert_allclose(ours[k_o][field], ref[k_r][field],
                                       atol=1.0)


def test_config_run_patch_alias(tmp_path):
    # dim_reduction weights_dirs alias maps to weights_dir
    from dynamorph_tpu.config import load_config

    p = tmp_path / "c.yml"
    p.write_text("dim_reduction:\n  weights_dirs: '/tmp/w'\n")
    cfg = load_config(str(p))
    assert cfg.dim_reduction.weights_dir == "/tmp/w"


def test_morphology_features_match_reference(rng):
    """get_intensity_profile and extract_features numerically equal the
    reference cv2_feature implementations. The contour-based functions
    (get_size/get_angle_apr/get_aspect_ratio_no_rotation) use the cv2 3.x
    findContours 3-tuple API and CANNOT run on cv2>=4 — the test pins that
    documented incompatibility (our port is the cv2-4 fix of the same
    math)."""
    import sys

    from conftest import REFERENCE_DIR, has_reference
    if not has_reference():
        pytest.skip("reference not available")
    sys.path.insert(0, REFERENCE_DIR)
    try:
        from HiddenStateExtractor import cv2_feature as ref
    except Exception as ex:
        pytest.skip(f"reference cv2_feature import failed: {ex}")
    finally:
        sys.path.remove(REFERENCE_DIR)

    from dynamorph_tpu.analysis.morphology import (extract_features,
                                                   get_intensity_profile)

    yy, xx = np.mgrid[:128, :128]
    mask = ((((xx - 64) * 0.8 + (yy - 64) * 0.6) ** 2 / 900
             + ((xx - 64) * -0.6 + (yy - 64) * 0.8) ** 2 / 250) < 1.0
            ).astype(float)
    dat = [(rng.rand(128, 128) * 60000) for _ in range(2)]

    ours_prof = get_intensity_profile(dat, mask)
    ref_prof = ref.get_intensity_profile(dat, mask)
    np.testing.assert_allclose(np.asarray(ours_prof, dtype=float),
                               np.asarray(ref_prof, dtype=float))

    # structured image so KAZE finds keypoints
    yy2, xx2 = np.mgrid[:128, :128].astype(float)
    img = np.zeros((128, 128))
    for cy, cx in [(30, 40), (80, 90), (60, 30), (100, 50)]:
        img += 200 * np.exp(-(((yy2 - cy) ** 2 + (xx2 - cx) ** 2) / 80))
    img = img[None]
    a = extract_features(img, vector_size=8)
    b = ref.extract_features(img, vector_size=8)
    if a is None or b is None:
        # this cv2 build lacks KAZE (removed in cv2 5.x main module); both
        # implementations must degrade identically (None)
        assert a is None and b is None
    else:
        np.testing.assert_allclose(a, b)

    # the reference's contour functions break on cv2>=4 (3-tuple unpack of
    # findContours) — this is the incompatibility our port fixes
    with pytest.raises(Exception):
        ref.get_size(mask)


def test_enable_persistent_compile_cache(tmp_path, monkeypatch):
    import jax

    from dynamorph_tpu.core.compile_cache import enable_persistent_cache

    old = jax.config.jax_compilation_cache_dir
    try:
        # CPU-pinned backend (this test process): skipped by default —
        # XLA:CPU AOT cache reloads risk SIGILL on feature mismatch
        assert enable_persistent_cache(str(tmp_path / "nope")) is None
        assert not os.path.exists(str(tmp_path / "nope"))

        # explicit dir wins; dir is created (allow_cpu for the test env)
        d = str(tmp_path / "xla_cache")
        assert enable_persistent_cache(d, allow_cpu=True) == d
        assert os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d

        # env var opt-out
        monkeypatch.setenv("DYNAMORPH_COMPILE_CACHE", "off")
        assert enable_persistent_cache(str(tmp_path / "other"),
                                       allow_cpu=True) is None

        # env var as cache dir
        d2 = str(tmp_path / "from_env")
        monkeypatch.setenv("DYNAMORPH_COMPILE_CACHE", d2)
        assert enable_persistent_cache(allow_cpu=True) == d2
        assert os.path.isdir(d2)
    finally:
        jax.config.update("jax_compilation_cache_dir", old)
