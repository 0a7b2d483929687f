"""Fused device-resident seg->instance->patch stage (pipeline/fused.py):
given identical probability maps, its artifacts must be IDENTICAL to the
three staged stages' (segmentation -> instance_segmentation ->
extract_patches). A deterministic elementwise stub model guarantees the
probability maps are bit-equal between the two paths (batch-1 vs batched
frames can differ in float association for real convnets), so any
difference here is a pipeline-logic bug.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamorph_tpu.io.pickles import load_pickle, save_pickle

# small-frame clustering params (reference defaults assume 2048^2 frames)
CLUSTER = dict(ct_thr=(50, 2000), dbscan_thr=(3, 10))


class StubSeg:
    """Deterministic, elementwise 'U-Net': cell prob rises with channel-0
    intensity. Piecewise-linear only (sub/mul/clamp, no transcendentals) so
    XLA produces BIT-equal results at any batch size, sharding, or fusion
    context — exp/sigmoid tails differ at ~2e-6 between program shapes."""

    params = {"w": jnp.float32(10.0)}
    state = {}
    n_classes = 3

    @staticmethod
    @jax.jit
    def _predict_fn(params, state, x):
        # x: (B, C, H, W) scaled to [0, 1]
        blob = jnp.clip((x[:, 0] - 0.5) * params["w"], 0.0, 1.0)  # (B, H, W)
        p1 = 0.9 * blob
        p2 = jnp.full_like(p1, 0.05)
        p0 = 1.0 - p1 - p2
        return jnp.stack([p0, p1, p2], axis=1)[:, :, None]  # (B, 3, 1, H, W)


def _make_site(tmp_path, name):
    """3 frames of 64x64, 3 moving disk cells (~450 px each: >1000 fg px
    per frame so clustering doesn't early-out)."""
    os.makedirs(tmp_path, exist_ok=True)
    rng = np.random.RandomState(42)
    T, H, W = 3, 64, 64
    yy, xx = np.mgrid[:H, :W]
    centers0 = np.array([[18, 18], [18, 46], [46, 32]])
    stack = np.zeros((T, 2, 1, H, W), np.uint16)
    for t in range(T):
        frame = rng.rand(2, H, W) * 5000 + 10000
        for cy, cx in centers0 + t:
            m = (yy - cy) ** 2 + (xx - cx) ** 2 < 12 ** 2
            frame[0][m] = 60000
            frame[1][m] = 45000
        stack[t, :, 0] = frame.astype(np.uint16)
    path = tmp_path / f"{name}.npy"
    np.save(path, stack)
    return str(path)


def _run_staged(site_path, supp):
    from dynamorph_tpu.pipeline.patch import process_site_extract_patches
    from dynamorph_tpu.seg.inference import predict_whole_map
    from dynamorph_tpu.track.clustering import \
        process_site_instance_segmentation

    os.makedirs(supp, exist_ok=True)
    model = StubSeg()
    predict_whole_map(site_path, model, use_channels=np.array([0, 1]),
                      mode="direct")
    prob_path = os.path.splitext(site_path)[0] + "_NNProbabilities.npy"
    process_site_instance_segmentation(site_path, prob_path, supp, **CLUSTER)
    process_site_extract_patches(site_path, prob_path, supp,
                                 window_size=32, channels=[0, 1],
                                 reload=False)
    return prob_path


def _run_fused(site_path, supp, **kw):
    from dynamorph_tpu.pipeline.fused import process_site_seg_patch_fused

    process_site_seg_patch_fused(
        site_path, StubSeg(), supp, seg_channels=[0, 1],
        patch_channels=[0, 1], window_size=32, **CLUSTER, **kw)
    return os.path.splitext(site_path)[0] + "_NNProbabilities.npy"


def _stack_by_basename(supp, t):
    d = load_pickle(os.path.join(supp, f"stacks_{t}.pkl"))
    return {os.path.basename(k): v for k, v in d.items()}


def test_fused_matches_staged(tmp_path):
    staged_site = _make_site(tmp_path / "a", "C5-Site_0")
    fused_site = _make_site(tmp_path / "b", "C5-Site_0")
    (tmp_path / "a").mkdir(exist_ok=True)
    supp_staged = str(tmp_path / "a" / "supp")
    supp_fused = str(tmp_path / "b" / "supp")

    prob_staged = _run_staged(staged_site, supp_staged)
    prob_fused = _run_fused(fused_site, supp_fused)

    # probability maps: bit-equal (elementwise stub)
    np.testing.assert_array_equal(np.load(prob_staged), np.load(prob_fused))

    # instance artifacts: identical cells, pixels, labels
    cp_s = load_pickle(os.path.join(supp_staged, "cell_positions.pkl"))
    cp_f = load_pickle(os.path.join(supp_fused, "cell_positions.pkl"))
    assert cp_s.keys() == cp_f.keys()
    for t in cp_s:
        assert len(cp_s[t]) == len(cp_f[t]) > 0, f"no cells at t={t}"
        for (id_s, pos_s), (id_f, pos_f) in zip(cp_s[t], cp_f[t]):
            assert id_s == id_f
            np.testing.assert_array_equal(pos_s, pos_f)
    pa_s = load_pickle(os.path.join(supp_staged,
                                    "cell_pixel_assignments.pkl"))
    pa_f = load_pickle(os.path.join(supp_fused,
                                    "cell_pixel_assignments.pkl"))
    for t in pa_s:
        np.testing.assert_array_equal(pa_s[t][0], pa_f[t][0])
        np.testing.assert_array_equal(pa_s[t][1], pa_f[t][1])

    # patch stacks: identical mats and masks
    for t in range(3):
        s = _stack_by_basename(supp_staged, t)
        f = _stack_by_basename(supp_fused, t)
        assert s.keys() == f.keys() and len(s) > 0
        for k in s:
            np.testing.assert_array_equal(s[k]["mat"], f[k]["mat"])
            np.testing.assert_array_equal(s[k]["masked_mat"],
                                          f[k]["masked_mat"])

    # instance map PNGs + preview PNGs written by both paths
    for t in range(3):
        assert os.path.exists(os.path.join(supp_fused,
                                           f"segmentation_{t}.png"))
    assert os.path.exists(str(tmp_path / "b" / "C5-Site_0_NNpred.png"))


def test_fused_lookahead_off_matches_on(tmp_path):
    """lookahead=False (no software pipelining) produces bit-identical
    artifacts — the pipelined loop is a pure scheduling change."""
    site_on = _make_site(tmp_path / "on", "C5-Site_0")
    site_off = _make_site(tmp_path / "off", "C5-Site_0")
    supp_on = str(tmp_path / "on" / "supp")
    supp_off = str(tmp_path / "off" / "supp")
    os.makedirs(supp_on), os.makedirs(supp_off)
    prob_on = _run_fused(site_on, supp_on, lookahead=True)
    prob_off = _run_fused(site_off, supp_off, lookahead=False)
    np.testing.assert_array_equal(np.load(prob_on), np.load(prob_off))
    cp_on = load_pickle(os.path.join(supp_on, "cell_positions.pkl"))
    cp_off = load_pickle(os.path.join(supp_off, "cell_positions.pkl"))
    assert repr(cp_on) == repr(cp_off)
    assert any(len(v) for v in cp_on.values())
    for t in range(3):
        a = _stack_by_basename(supp_on, t)
        b = _stack_by_basename(supp_off, t)
        assert a.keys() == b.keys()
        for k in a:
            np.testing.assert_array_equal(a[k]["mat"], b[k]["mat"])
            np.testing.assert_array_equal(a[k]["masked_mat"],
                                          b[k]["masked_mat"])


def test_fused_cluster_workers_matches_serial(tmp_path):
    """cluster_workers=3 (frames clustering in parallel on the host pool,
    consumed in frame order) produces bit-identical artifacts to the
    strictly serial schedule — parallel clustering is pure scheduling."""
    site_par = _make_site(tmp_path / "par", "C5-Site_0")
    site_ser = _make_site(tmp_path / "ser", "C5-Site_0")
    supp_par = str(tmp_path / "par" / "supp")
    supp_ser = str(tmp_path / "ser" / "supp")
    os.makedirs(supp_par), os.makedirs(supp_ser)
    prob_par = _run_fused(site_par, supp_par, lookahead=True,
                          cluster_workers=3)
    prob_ser = _run_fused(site_ser, supp_ser, lookahead=False)
    np.testing.assert_array_equal(np.load(prob_par), np.load(prob_ser))
    for name in ("cell_positions.pkl", "cell_pixel_assignments.pkl"):
        a = load_pickle(os.path.join(supp_par, name))
        b = load_pickle(os.path.join(supp_ser, name))
        assert repr(a) == repr(b)
    cp = load_pickle(os.path.join(supp_par, "cell_positions.pkl"))
    assert any(len(v) for v in cp.values())
    for t in range(3):
        a = _stack_by_basename(supp_par, t)
        b = _stack_by_basename(supp_ser, t)
        assert a.keys() == b.keys() and len(a) > 0
        for k in a:
            np.testing.assert_array_equal(a[k]["mat"], b[k]["mat"])
            np.testing.assert_array_equal(a[k]["masked_mat"],
                                          b[k]["masked_mat"])


def test_fused_skip_boundary_and_no_probs(tmp_path):
    """skip_boundary drops window-crossing cells like the staged path, and
    save_probabilities=False suppresses the NNProbabilities download."""
    from dynamorph_tpu.pipeline.fused import process_site_seg_patch_fused

    site = _make_site(tmp_path, "C5-Site_0")
    supp = str(tmp_path / "supp")
    process_site_seg_patch_fused(
        site, StubSeg(), supp, seg_channels=[0, 1], patch_channels=[0, 1],
        window_size=32, skip_boundary=True, save_probabilities=False,
        **CLUSTER)
    cp = load_pickle(os.path.join(supp, "cell_positions.pkl"))
    # cells at (18,18)+t and (18,46)+t cross the 32px window at 64^2; the
    # center cell (46,32)+t survives until its window crosses the boundary
    for t, cells in cp.items():
        for cid, pos in cells:
            assert pos[0] >= 16 and pos[0] <= 48
            assert pos[1] >= 16 and pos[1] <= 48
    assert not os.path.exists(
        os.path.splitext(site)[0] + "_NNProbabilities.npy")


def test_orchestrator_fused_stage_substitution(tmp_path, monkeypatch):
    """With patch.fused=True and the three front-end stages selected, the
    orchestrator runs the single fused stage instead."""
    from dynamorph_tpu.config.schema import PipelineConfig
    from dynamorph_tpu.pipeline import fused as fused_mod
    from dynamorph_tpu.pipeline.orchestrator import run_pipeline

    calls = []
    monkeypatch.setattr(fused_mod, "seg_patch_fused",
                        lambda *a, **k: calls.append(a))

    config = PipelineConfig()
    config.patch.fused = True
    executed = run_pipeline(str(tmp_path), str(tmp_path), ["C5-Site_0"],
                            config,
                            stages=["segmentation", "instance_segmentation",
                                    "extract_patches"])
    assert executed == ["seg_patch_fused"]
    assert len(calls) == 1

    # without the flag, the staged stages run individually
    calls.clear()
    config.patch.fused = False
    from dynamorph_tpu.pipeline import orchestrator as orch
    monkeypatch.setattr(orch, "segmentation", lambda *a, **k: None)
    monkeypatch.setattr(orch, "instance_segmentation", lambda *a, **k: None)
    monkeypatch.setattr(orch, "extract_patches", lambda *a, **k: None)
    executed = run_pipeline(str(tmp_path), str(tmp_path), ["C5-Site_0"],
                            config,
                            stages=["segmentation", "instance_segmentation",
                                    "extract_patches"], resume=False)
    assert executed == ["segmentation", "instance_segmentation",
                        "extract_patches"]
    assert calls == []


def test_seg_patch_fused_driver_with_real_unet(tmp_path):
    """The site driver loads a real (randomly initialised) Segment U-Net
    from saved weights and runs the fused stage end to end — covers model
    construction/loading and per-site artifact writes (cell discovery with
    a trained model is exercised by examples/full_system_run.py step 3b)."""
    from dynamorph_tpu.config.schema import PipelineConfig
    from dynamorph_tpu.pipeline.fused import seg_patch_fused
    from dynamorph_tpu.seg.model import Segment

    _make_site(tmp_path, "C5-Site_0")
    model = Segment(input_shape=(2, 64, 64), n_classes=3)
    weights = str(tmp_path / "w")
    model.save(weights)

    config = PipelineConfig()
    si = config.segmentation_inference
    si.channels = [0, 1]
    si.window_size = 64
    si.weights = weights
    config.patch.channels = [0, 1]
    config.patch.window_size = 32

    supp = str(tmp_path / "supp")
    seg_patch_fused(str(tmp_path), supp, ["C5-Site_0"], config, **CLUSTER)

    site_supp = os.path.join(supp, "C5-supps", "C5-Site_0")
    cp = load_pickle(os.path.join(site_supp, "cell_positions.pkl"))
    pa = load_pickle(os.path.join(site_supp, "cell_pixel_assignments.pkl"))
    assert set(cp) == set(pa) == {0, 1, 2}
    for t in range(3):
        assert os.path.exists(os.path.join(site_supp, f"stacks_{t}.pkl"))
    # probability map written next to the site npy (driver default)
    assert os.path.exists(str(tmp_path / "C5-Site_0_NNProbabilities.npy"))


def test_fused_programs_cached_per_model():
    """The per-frame jitted programs are cached on the model instance —
    repeated sites must NOT rebuild jit closures (each fresh closure means
    a full U-Net recompile, ~15-40s through the remote-compile relay)."""
    from dynamorph_tpu.pipeline.fused import _site_programs

    m = StubSeg()
    a = _site_programs(m, (0, 1), (0, 1), 0.3, (64, 64))
    b = _site_programs(m, (0, 1), (0, 1), 0.3, (64, 64))
    assert a[0] is b[0] and a[1] is b[1]
    # different config -> different programs; different model -> own cache
    c = _site_programs(m, (0,), (0, 1), 0.3, (64, 64))
    assert c[0] is not a[0]
    m2 = StubSeg()
    d = _site_programs(m2, (0, 1), (0, 1), 0.3, (64, 64))
    assert d[0] is not a[0]


def test_fused_completion_marker_written_last(tmp_path, monkeypatch):
    """cell_positions.pkl is the resume marker: a crash during the trailing
    NNProbabilities save must leave the site unmarked so it reprocesses."""
    from dynamorph_tpu.pipeline.fused import process_site_seg_patch_fused

    site = _make_site(tmp_path, "C5-Site_0")
    supp = str(tmp_path / "supp")

    real_save = np.save

    def boom(path, *a, **k):
        if "NNProbabilities" in str(path):
            raise OSError("disk full")
        return real_save(path, *a, **k)

    monkeypatch.setattr(np, "save", boom)
    with pytest.raises(OSError, match="disk full"):
        process_site_seg_patch_fused(
            site, StubSeg(), supp, seg_channels=[0, 1],
            patch_channels=[0, 1], window_size=32, **CLUSTER)
    assert not os.path.exists(os.path.join(supp, "cell_positions.pkl"))


def test_fused_driver_rerun_false_skips_completed(tmp_path, monkeypatch):
    """rerun=False skips sites whose completion marker exists (same
    semantics as the staged instance_segmentation driver)."""
    from dynamorph_tpu.config.schema import PipelineConfig
    from dynamorph_tpu.pipeline import fused as fused_mod

    _make_site(tmp_path, "C5-Site_0")
    supp = tmp_path / "supp"
    site_supp = supp / "C5-supps" / "C5-Site_0"
    site_supp.mkdir(parents=True)
    save_pickle({}, str(site_supp / "cell_positions.pkl"))

    called = []
    monkeypatch.setattr(fused_mod, "process_site_seg_patch_fused",
                        lambda *a, **k: called.append(a))

    config = PipelineConfig()
    config.segmentation_inference.weights = "unused"
    # bypass the real Segment construction/load inside the driver
    import dynamorph_tpu.seg.model as segmod

    class _FakeSegment:
        def __init__(self, **kw):
            pass

        def load(self, path):
            pass

    monkeypatch.setattr(segmod, "Segment", _FakeSegment)
    fused_mod.seg_patch_fused(str(tmp_path), str(supp), ["C5-Site_0"],
                              config, rerun=False)
    assert called == []


def test_fused_no_png_for_empty_frames(tmp_path):
    """Frames below the foreground early-out write no instance-map PNG —
    identical artifact tree to the staged path."""
    from dynamorph_tpu.pipeline.fused import process_site_seg_patch_fused

    os.makedirs(tmp_path, exist_ok=True)
    # all-background site: no bright blobs -> zero foreground pixels
    stack = np.full((2, 2, 1, 64, 64), 10000, np.uint16)
    site = str(tmp_path / "C5-Site_0.npy")
    np.save(site, stack)
    supp = str(tmp_path / "supp")
    process_site_seg_patch_fused(
        site, StubSeg(), supp, seg_channels=[0, 1], patch_channels=[0, 1],
        window_size=32, save_probabilities=False, **CLUSTER)
    for t in range(2):
        assert not os.path.exists(os.path.join(supp,
                                               f"segmentation_{t}.png"))
        # empty stacks pickles still written (staged parity)
        assert os.path.exists(os.path.join(supp, f"stacks_{t}.pkl"))


def test_fused_site_parallel_matches_sequential(tmp_path, monkeypatch):
    """Site-parallel fused processing (one worker per local device, the
    process-per-GPU analog) produces identical artifacts to the sequential
    path."""
    from dynamorph_tpu.config.schema import PipelineConfig
    from dynamorph_tpu.pipeline import fused as fused_mod
    import dynamorph_tpu.seg.model as segmod

    sites = [f"C5-Site_{i}" for i in range(4)]
    for d in ("par", "seq"):
        for s in sites:
            _make_site(tmp_path / d, s)

    class _StubSegment(StubSeg):
        def __init__(self, **kw):
            pass

        def load(self, path):
            pass

    monkeypatch.setattr(segmod, "Segment", _StubSegment)
    config = PipelineConfig()
    config.segmentation_inference.channels = [0, 1]
    config.patch.channels = [0, 1]
    config.patch.window_size = 32
    config.segmentation_inference.weights = "unused"

    fused_mod.seg_patch_fused(str(tmp_path / "par"), str(tmp_path / "par/s"),
                              sites, config, site_parallelism=4, **CLUSTER)
    fused_mod.seg_patch_fused(str(tmp_path / "seq"), str(tmp_path / "seq/s"),
                              sites, config, site_parallelism=1, **CLUSTER)

    for s in sites:
        sp = os.path.join(str(tmp_path / "par/s"), "C5-supps", s)
        sq = os.path.join(str(tmp_path / "seq/s"), "C5-supps", s)
        cp_p = load_pickle(os.path.join(sp, "cell_positions.pkl"))
        cp_q = load_pickle(os.path.join(sq, "cell_positions.pkl"))
        assert cp_p.keys() == cp_q.keys()
        total = 0
        for t in cp_p:
            assert len(cp_p[t]) == len(cp_q[t])
            total += len(cp_p[t])
            for (ia, pa), (ib, pb) in zip(cp_p[t], cp_q[t]):
                assert ia == ib
                np.testing.assert_array_equal(pa, pb)
        assert total > 0
        for t in range(3):
            a = _stack_by_basename(sp, t)
            b = _stack_by_basename(sq, t)
            assert a.keys() == b.keys()
            for key in a:
                np.testing.assert_array_equal(a[key]["mat"], b[key]["mat"])


def test_fused_multidevice_frames_match_single(tmp_path):
    """Frame round-robin over a 4-device mesh slice (the idle-silicon fix,
    VERDICT r4 item 2) produces artifacts identical to the single-device
    fused run: clustering consumes frames in order regardless of which
    chip computed them."""
    import jax

    devices = jax.devices()[:4]
    assert len(devices) == 4  # conftest forces the 8-device CPU mesh

    single_site = _make_site(tmp_path / "one", "C5-Site_0")
    multi_site = _make_site(tmp_path / "many", "C5-Site_0")
    supp_one = str(tmp_path / "one" / "supp")
    supp_many = str(tmp_path / "many" / "supp")
    _run_fused(single_site, supp_one)
    _run_fused(multi_site, supp_many, devices=devices)

    np.testing.assert_array_equal(
        np.load(os.path.splitext(single_site)[0] + "_NNProbabilities.npy"),
        np.load(os.path.splitext(multi_site)[0] + "_NNProbabilities.npy"))
    cp_1 = load_pickle(os.path.join(supp_one, "cell_positions.pkl"))
    cp_n = load_pickle(os.path.join(supp_many, "cell_positions.pkl"))
    assert cp_1.keys() == cp_n.keys()
    total = 0
    for t in cp_1:
        assert len(cp_1[t]) == len(cp_n[t])
        total += len(cp_1[t])
        for (ia, pa), (ib, pb) in zip(cp_1[t], cp_n[t]):
            assert ia == ib
            np.testing.assert_array_equal(pa, pb)
    assert total > 0
    for t in range(3):
        a = _stack_by_basename(supp_one, t)
        b = _stack_by_basename(supp_many, t)
        assert a.keys() == b.keys() and len(a) > 0
        for k in a:
            np.testing.assert_array_equal(a[k]["mat"], b[k]["mat"])
            np.testing.assert_array_equal(a[k]["masked_mat"],
                                          b[k]["masked_mat"])


def test_fused_driver_splits_devices_into_groups(tmp_path, monkeypatch):
    """seg_patch_fused hands each site worker a round-robin device GROUP
    (k=2 workers on the 8-device mesh -> 4 devices per site), and a single
    site gets the whole mesh."""
    from dynamorph_tpu.config.schema import PipelineConfig
    from dynamorph_tpu.pipeline import fused as fused_mod
    import dynamorph_tpu.seg.model as segmod

    seen = []
    real = fused_mod.process_site_seg_patch_fused

    def spy(site_path, model, supp, **kw):
        seen.append(list(kw.get("devices") or []))
        return real(site_path, model, supp, **kw)

    class _StubSegment(StubSeg):
        def __init__(self, **kw):
            pass

        def load(self, path):
            pass

    monkeypatch.setattr(segmod, "Segment", _StubSegment)
    monkeypatch.setattr(fused_mod, "process_site_seg_patch_fused", spy)
    config = PipelineConfig()
    config.segmentation_inference.channels = [0, 1]
    config.patch.channels = [0, 1]
    config.patch.window_size = 32
    config.segmentation_inference.weights = "unused"

    sites = ["C5-Site_0", "C5-Site_1"]
    for s in sites:
        _make_site(tmp_path, s)
    fused_mod.seg_patch_fused(str(tmp_path), str(tmp_path / "s"), sites,
                              config, site_parallelism=2, **CLUSTER)
    assert len(seen) == 2
    import jax

    all_devs = jax.devices()
    assert sorted(d.id for g in seen for d in g) == \
        sorted(d.id for d in all_devs)
    assert all(len(g) == len(all_devs) // 2 for g in seen)

    seen.clear()
    fused_mod.seg_patch_fused(str(tmp_path), str(tmp_path / "s1"),
                              ["C5-Site_0"], config, site_parallelism=1,
                              **CLUSTER)
    assert len(seen) == 1 and len(seen[0]) == len(all_devs)
