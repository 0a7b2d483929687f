"""Golden parity for instance clustering, on-device patch extraction, and LAP
tracking vs the reference implementations on synthetic microscopy scenes."""
import os
import sys

import numpy as np
import pytest

from conftest import REFERENCE_DIR, has_reference

pytestmark = pytest.mark.skipif(
    not has_reference(), reason="reference checkout not available")

if has_reference():
    sys.path.insert(0, REFERENCE_DIR)
    from SingleCellPatch import extract_patches as ref_ep
    from SingleCellPatch import generate_trajectories as ref_gt
    from SingleCellPatch import instance_clustering as ref_ic

from dynamorph_tpu.io.pickles import load_pickle, save_pickle
from dynamorph_tpu.ops.patch import disk_filter
from dynamorph_tpu.pipeline.patch import (
    process_site_extract_patches, process_site_build_trajectory)
from dynamorph_tpu.track.clustering import instance_clustering
from dynamorph_tpu.track.matching import frame_matching, build_site_trajectories


def _synthetic_scene(rng, size=512, n_frames=2, n_cells=4, r=18):
    """Random circular cells: returns (image_stack (T,2,1,S,S),
    seg_stack (T,3,1,S,S), cell centers per frame)."""
    yy, xx = np.mgrid[:size, :size]
    images, segs, centers_all = [], [], []
    centers0 = rng.randint(80, size - 80, size=(n_cells, 2))
    for t in range(n_frames):
        centers = centers0 + rng.randint(-3, 4, size=centers0.shape) * t
        img = rng.rand(2, 1, size, size) * 1000 + 30000
        fg = np.zeros((size, size), bool)
        for cy, cx in centers:
            mask = (yy - cy) ** 2 + (xx - cx) ** 2 < r ** 2
            fg |= mask
            img[:, 0][:, mask] += 10000
        bg_prob = np.where(fg, 0.05, 0.97)
        mg = np.where(fg, 0.9, 0.02)
        other = 1.0 - bg_prob - mg
        seg = np.stack([bg_prob, mg, other])[:, None]  # (3, 1, S, S)
        images.append(img)
        segs.append(seg)
        centers_all.append(centers)
    return (np.stack(images), np.stack(segs), centers_all)


def test_disk_filters_match_reference():
    np.testing.assert_array_equal(disk_filter(11, strict=False),
                                  ref_ep.filter1)
    np.testing.assert_array_equal(disk_filter(21, strict=True),
                                  ref_ep.filter2)


def test_instance_clustering_matches_reference(rng):
    _, segs, _ = _synthetic_scene(rng, size=512, n_frames=1, n_cells=4)
    ours = instance_clustering(segs[0], instance_map=False)
    theirs = ref_ic.instance_clustering(segs[0], instance_map=False)
    assert [(c, tuple(p)) for c, p in ours[0]] == \
           [(c, tuple(p)) for c, p in theirs[0]]
    np.testing.assert_array_equal(ours[1], theirs[1])
    np.testing.assert_array_equal(ours[2], theirs[2])


def _make_site(tmp_path, rng, n_frames=2):
    images, segs, _ = _synthetic_scene(rng, n_frames=n_frames)
    raw_path = tmp_path / "site.npy"
    seg_path = tmp_path / "site_NNProbabilities.npy"
    np.save(raw_path, images)
    np.save(seg_path, segs)
    # instance clustering (verified identical to reference above)
    cell_positions, cell_pixel_assignments = {}, {}
    for t in range(n_frames):
        res = instance_clustering(segs[t], instance_map=False)
        cell_positions[t] = res[0]
        cell_pixel_assignments[t] = res[1:]
    return str(raw_path), str(seg_path), cell_positions, cell_pixel_assignments


def test_patch_extraction_matches_reference(tmp_path, rng):
    raw_path, seg_path, cpos, cpix = _make_site(tmp_path, rng)

    ours_dir = tmp_path / "ours"
    ref_dir = tmp_path / "ref"
    for d in (ours_dir, ref_dir):
        d.mkdir()
        save_pickle(cpos, str(d / "cell_positions.pkl"))
        save_pickle(cpix, str(d / "cell_pixel_assignments.pkl"))

    process_site_extract_patches(raw_path, seg_path, str(ours_dir),
                                 window_size=256, channels=None, reload=False)
    ref_ep.process_site_extract_patches(raw_path, seg_path, str(ref_dir),
                                        window_size=256, channels=None,
                                        reload=False)

    for t in range(2):
        ours = load_pickle(str(ours_dir / f"stacks_{t}.pkl"))
        ref = load_pickle(str(ref_dir / f"stacks_{t}.pkl"))
        ours_keys = {os.path.basename(k) for k in ours}
        ref_keys = {os.path.basename(k) for k in ref}
        assert ours_keys == ref_keys and len(ours_keys) > 0
        for k_o in ours:
            k_r = [k for k in ref
                   if os.path.basename(k) == os.path.basename(k_o)][0]
            for field in ("mat", "masked_mat"):
                np.testing.assert_allclose(
                    ours[k_o][field], ref[k_r][field], atol=1e-3, rtol=1e-6,
                    err_msg=f"t={t} {field} {os.path.basename(k_o)}")
    # updated cell_positions must match too
    ours_cp = load_pickle(str(ours_dir / "cell_positions.pkl"))
    ref_cp = load_pickle(str(ref_dir / "cell_positions.pkl"))
    for t in ours_cp:
        assert [(c, tuple(p)) for c, p in ours_cp[t]] == \
               [(c, tuple(p)) for c, p in ref_cp[t]]


def test_frame_matching_matches_reference(rng):
    f1 = rng.randint(0, 500, size=(6, 2))
    f2 = f1 + rng.randint(-20, 20, size=f1.shape)
    int1 = rng.randint(500, 2000, size=6)
    int2 = (int1 * rng.uniform(0.8, 1.2, size=6)).astype(int)
    ours_pairs, ours_top = frame_matching(f1, f2, int1, int2, dist_cutoff=100)
    ref_pairs, ref_top = ref_gt.frame_matching(f1, f2, int1, int2,
                                               dist_cutoff=100)
    assert ours_pairs == ref_pairs
    assert set(ours_top) == set(ref_top)


def test_trajectories_match_reference(tmp_path, rng):
    # 14 frames of slowly drifting cells -> trajectories longer than the
    # min-length filter (>10, reference generate_trajectories.py:321)
    n_frames = 14
    raw_path, seg_path, cpos, cpix = _make_site(tmp_path, rng,
                                                n_frames=n_frames)
    ours_dir = tmp_path / "ours"
    ref_dir = tmp_path / "ref"
    for d in (ours_dir, ref_dir):
        d.mkdir()
        save_pickle(cpos, str(d / "cell_positions.pkl"))
        save_pickle(cpix, str(d / "cell_pixel_assignments.pkl"))

    process_site_build_trajectory(str(ours_dir))
    ref_gt.process_site_build_trajectory(str(ref_dir))

    ours = load_pickle(str(ours_dir / "cell_traj.pkl"))
    ref = load_pickle(str(ref_dir / "cell_traj.pkl"))
    assert len(ours[0]) == len(ref[0]) > 0
    assert ours[0] == ref[0]
    for to, tr in zip(ours[1], ref[1]):
        assert to.keys() == tr.keys()
        for k in to:
            np.testing.assert_array_equal(to[k], tr[k])


def test_pack_mask_bits_roundtrip(rng):
    import jax.numpy as jnp

    from dynamorph_tpu.ops.patch import pack_mask_bits

    mask = rng.rand(64, 128) > 0.7
    packed = np.asarray(pack_mask_bits(jnp.asarray(mask)))
    assert packed.shape == (64, 16) and packed.dtype == np.uint8
    unpacked = np.unpackbits(packed, axis=1, bitorder="little")
    np.testing.assert_array_equal(unpacked.astype(bool), mask)


def test_scatter_label_map_matches_host_and_drops_pads(rng):
    import jax.numpy as jnp

    from dynamorph_tpu.ops.patch import labels_to_map, scatter_label_map

    shape = (48, 64)
    n = 500
    pos = np.stack([rng.randint(0, shape[0], n),
                    rng.randint(0, shape[1], n)], 1).astype(np.int32)
    # dedupe so host scatter order can't differ from device
    pos = np.unique(pos, axis=0)
    labs = rng.randint(-1, 7, len(pos)).astype(np.int32)
    host = labels_to_map(shape, pos, labs)

    # pad slots carry POSITIVE out-of-bounds coords -> dropped
    coords = np.concatenate(
        [pos, np.full((37, 2), max(shape), np.int32)], 0)
    labels = np.concatenate([labs, np.full((37,), 99, np.int32)])
    dev = np.asarray(scatter_label_map(jnp.asarray(coords),
                                       jnp.asarray(labels), shape))
    np.testing.assert_array_equal(dev, host)
    assert not (dev == 99).any()
