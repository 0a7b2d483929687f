"""Tests for analysis/plots.py: every figure family renders a valid
non-empty PNG/GIF from synthetic inputs, and the deterministic figures
(seeded inputs, Agg backend) are pinned by golden pixel hashes so a silent
matplotlib or plotting-code regression fails loudly, not just file
existence. Regenerate goldens intentionally with UPDATE_PLOT_GOLDEN=1."""
import hashlib
import json
import os

import numpy as np
import pytest

from dynamorph_tpu.analysis import plots

_GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden",
                            "plot_hashes.json")


@pytest.fixture
def frame(rng):
    return (rng.rand(128, 128) * 60000).astype(np.uint16)


def _pixel_hash(path):
    """Hash DECODED pixels (not file bytes) so PNG encoder metadata can't
    cause false mismatches."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    assert img is not None, f"unreadable image: {path}"
    return hashlib.sha256(np.ascontiguousarray(img).tobytes()).hexdigest()[:16]


def _ok(path, golden=None):
    assert os.path.exists(path)
    assert os.path.getsize(path) > 100
    if golden is None:
        return
    h = _pixel_hash(path)
    table = {}
    if os.path.exists(_GOLDEN_PATH):
        with open(_GOLDEN_PATH) as f:
            table = json.load(f)
    if os.environ.get("UPDATE_PLOT_GOLDEN") or golden not in table:
        table[golden] = h
        os.makedirs(os.path.dirname(_GOLDEN_PATH), exist_ok=True)
        with open(_GOLDEN_PATH, "w") as f:
            json.dump(table, f, indent=1, sort_keys=True)
        return
    assert table[golden] == h, (
        f"figure {golden!r} pixel content changed ({h} != {table[golden]}); "
        f"if intentional, regenerate with UPDATE_PLOT_GOLDEN=1")


def test_plot_patches_and_movie(rng, tmp_path):
    patches = (rng.rand(4, 32, 32) * 60000).astype(np.uint16)
    paths = plots.plot_patches(patches, str(tmp_path / "p"))
    assert len(paths) == 4
    for p in paths:
        _ok(p)
    _ok(plots.save_patch_movie(patches, str(tmp_path / "m.gif")))


def test_plot_class_probabilities(rng, tmp_path):
    probs = rng.rand(3, 64, 64)
    probs /= probs.sum(0)
    _ok(plots.plot_class_probabilities(probs, str(tmp_path / "cls.png"),
                                       ["bg", "mg", "non-mg"]),
        golden="class_probabilities")


def test_plot_instance_separation(rng, frame, tmp_path):
    positions = rng.randint(0, 128, size=(300, 2))
    labels = rng.randint(-1, 4, size=300)
    _ok(plots.plot_instance_separation(frame, positions, labels,
                                       str(tmp_path / "inst.png")),
        golden="instance_separation")


def test_draw_cell_boxes(frame, tmp_path):
    _ok(plots.draw_cell_boxes(frame, [(40, 40), (90, 100)],
                              str(tmp_path / "box.png"),
                              colors=[(255, 0, 0), (0, 255, 0)], half=20),
        golden="cell_boxes")


def test_plot_frame_matching(rng, frame, tmp_path):
    p0 = rng.randint(10, 118, size=(5, 2))
    p1 = p0 + rng.randint(-5, 5, size=(5, 2))
    _ok(plots.plot_frame_matching(frame, frame, p0, p1,
                                  [(i, i) for i in range(5)],
                                  str(tmp_path / "match.png")),
        golden="frame_matching")


def test_plot_trajectory_on_frame(rng, frame, tmp_path):
    pos = np.cumsum(rng.randint(-3, 4, size=(10, 2)), axis=0) + 64
    _ok(plots.plot_trajectory_on_frame(frame, pos,
                                       str(tmp_path / "traj.png")),
        golden="trajectory_on_frame")


def test_plot_embedding_scatter_variants(rng, tmp_path):
    emb = rng.randn(500, 2)
    labels = rng.randint(0, 2, size=500)
    _ok(plots.plot_embedding_scatter(emb, str(tmp_path / "pca_cond.png"),
                                     labels=labels,
                                     conditions=["mock", "infected"]),
        golden="embedding_scatter_cond")
    _ok(plots.plot_embedding_scatter(emb, str(tmp_path / "pca_val.png"),
                                     values=rng.rand(500), cmap="BuPu"),
        golden="embedding_scatter_val")
    _ok(plots.plot_embedding_scatter(emb, str(tmp_path / "pca_plain.png")),
        golden="embedding_scatter_plain")


def test_plot_explained_variance(tmp_path):
    r = np.array([0.4, 0.2, 0.1, 0.05])
    _ok(plots.plot_explained_variance(r, str(tmp_path / "ev.png")),
        golden="explained_variance")


def test_plot_pc_vs_property(rng, tmp_path):
    pc = rng.randn(300)
    size = np.exp(rng.randn(300) + 6)
    _ok(plots.plot_pc_vs_property(pc, size, str(tmp_path / "sc.png"),
                                  log_prop=True), golden="pc_vs_prop_scatter")
    _ok(plots.plot_pc_vs_property(pc, size, str(tmp_path / "d.png"),
                                  density=True), golden="pc_vs_prop_density")


def test_plot_correlation_matrix(rng, tmp_path):
    comp = rng.randn(200, 8)
    props = {"size": rng.rand(200), "aspect": rng.rand(200),
             "density": rng.rand(200)}
    _ok(plots.plot_correlation_matrix(comp, props,
                                      str(tmp_path / "corr.png")),
        golden="correlation_matrix")


def test_plot_distribution_comparison(rng, tmp_path):
    _ok(plots.plot_distribution_comparison(rng.randn(100) + 1,
                                           rng.randn(400),
                                           str(tmp_path / "dist.png")),
        golden="distribution_comparison")


def test_plot_joint_kde(rng, tmp_path):
    _ok(plots.plot_joint_kde(rng.randn(150), rng.randn(150) * 0.5 + 2,
                             str(tmp_path / "kde.png")),
        golden="joint_kde")


def test_plot_violin_modes(rng, tmp_path):
    groups = {"slow": rng.rand(80), "fast": rng.rand(80) + 1}
    _ok(plots.plot_violin_modes(groups, str(tmp_path / "violin.png")),
        golden="violin_modes")


def test_force_aspect(tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots()
    ax.plot([0, 10], [0, 1])
    plots.force_aspect(ax, aspect=1.0)
    assert ax.get_aspect() == pytest.approx(10.0)
    plt.close(fig)


def test_segmentation_validation_mg_filter_orientation(tmp_path):
    """category='mg' must render the MG-dominant cell (red rim) and
    category='nonmg' the non-MG-dominant one (green rim) — class order is
    (BG, non-MG, MG). A prior inversion selected the opposite population."""
    from dynamorph_tpu.config.schema import (PipelineConfig,
                                             SegmentationInferenceConfig)
    from dynamorph_tpu.io.pickles import save_pickle
    from dynamorph_tpu.io.tiff import read_multipage_tiff_pages
    from dynamorph_tpu.pipeline.segmentation import segmentation_validation

    raw_dir, supp_dir = tmp_path / "raw", tmp_path / "supp"
    site = "B4-Site_0"
    seg_dir = supp_dir / "B4-supps" / site
    seg_dir.mkdir(parents=True)
    raw_dir.mkdir()

    size = 64
    raw = np.full((1, 2, 1, size, size), 1000, np.float32)
    np.save(raw_dir / f"{site}.npy", raw)
    # two 5x5 cells: cell 0 MG-dominant, cell 1 non-MG-dominant
    probs = np.zeros((1, 3, 1, size, size), np.float32)
    probs[0, 0] = 0.9                                   # BG everywhere
    cells = {0: (slice(10, 15), slice(10, 15)),
             1: (slice(40, 45), slice(40, 45))}
    probs[0, :, 0, cells[0][0], cells[0][1]] = \
        np.array([0.1, 0.2, 0.7])[:, None, None]        # MG
    probs[0, :, 0, cells[1][0], cells[1][1]] = \
        np.array([0.1, 0.7, 0.2])[:, None, None]        # non-MG
    np.save(raw_dir / f"{site}_NNProbabilities.npy", probs)

    pos, lab = [], []
    for cid, (ys, xs) in cells.items():
        yy, xx = np.mgrid[ys, xs]
        pos.append(np.stack([yy.ravel(), xx.ravel()], 1))
        lab.append(np.full(yy.size, cid))
    save_pickle({0: (np.concatenate(pos), np.concatenate(lab))},
                str(seg_dir / "cell_pixel_assignments.pkl"))
    save_pickle({0: [(0, np.array([12, 12])), (1, np.array([42, 42]))]},
                str(seg_dir / "cell_positions.pkl"))

    def rims(category):
        cfg = PipelineConfig(segmentation_inference=
                             SegmentationInferenceConfig(
                                 seg_val_cat=category))
        segmentation_validation(str(raw_dir), str(supp_dir), None, [site],
                                cfg)
        page = read_multipage_tiff_pages(
            str(supp_dir / "validation_images" / f"{site}_predictions.tif"))[0]
        red = (page[..., 0] == 65535) & (page[..., 1] == 0)
        green = (page[..., 1] == 65535) & (page[..., 0] == 0)
        return red, green

    red, green = rims("mg")
    assert red[10:15, 10:15].any() and not green.any()   # only the MG cell
    red, green = rims("nonmg")
    assert green[40:45, 40:45].any() and not red.any()   # only the non-MG


def test_contour_overlay_and_validation_pngs(tmp_path):
    from dynamorph_tpu.pipeline.segmentation import (
        draw_contour_overlay, segmentation_validation_contours,
        validation_pngs_to_tiff)
    from dynamorph_tpu.io.tiff import read_multipage_tiff_pages

    # a filled square: only its 1px rim should be painted
    seg = np.zeros((64, 64), np.uint8)
    seg[20:40, 20:40] = 255
    phase = np.full((64, 64), 100, np.uint8)
    rgb = draw_contour_overlay(phase, seg)
    assert tuple(rgb[20, 20]) == (255, 0, 0)      # rim corner
    assert tuple(rgb[30, 30]) == (100, 100, 100)  # interior untouched
    assert tuple(rgb[0, 0]) == (100, 100, 100)    # background untouched

    # end-to-end: raw stack + segmentation PNGs -> overlay PNGs -> tiff
    import cv2
    raw_dir, supp_dir, val_dir = (tmp_path / "raw", tmp_path / "supp",
                                  tmp_path / "val")
    site = "B4-Site_0"
    seg_dir = supp_dir / "B4-supps" / site
    seg_dir.mkdir(parents=True)
    raw_dir.mkdir()
    stack = np.random.RandomState(0).rand(3, 2, 1, 64, 64).astype(np.float32)
    np.save(raw_dir / f"{site}.npy", stack)
    for t in range(3):
        cv2.imwrite(str(seg_dir / f"segmentation_{t}.png"), seg)
    segmentation_validation_contours(str(raw_dir), str(supp_dir),
                                     str(val_dir), [site], out_size=(64, 64))
    for t in range(3):
        assert (val_dir / f"{site}_{t}.png").exists()
    out = validation_pngs_to_tiff(str(val_dir), site)
    pages = read_multipage_tiff_pages(out)
    assert len(pages) == 3 and pages[0].shape[:2] == (64, 64)
