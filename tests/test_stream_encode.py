"""Device-resident streaming encode (pipeline/stream.py): raw stacks ->
latents in one pass must BIT-match the staged chain
(fused front-end -> assemble_vae -> process_vae), reference
pipeline/patch_VAE.py:115-175 (assemble) and :343-508 (process_VAE).

The exactness hinges on the device 2x2 block-mean resize reproducing
cv2's INTER_LINEAR at an exact 2x downscale bit-for-bit on the pipeline's
half-integer-valued patches — pinned directly in
test_device_resize_matches_cv2 below.
"""
import os

import numpy as np
import pytest

import jax

from dynamorph_tpu.config.schema import (LatentEncodingConfig, PatchConfig,
                                         PipelineConfig,
                                         SegmentationInferenceConfig)
from dynamorph_tpu.io.pickles import load_pickle

from test_fused_seg_patch import CLUSTER, StubSeg, _make_site, _run_fused


@pytest.mark.parametrize("factor", [2, 3, 4])
def test_device_resize_matches_cv2(factor):
    """cv2 INTER_LINEAR at an exact integer-factor downscale reduces to
    the central-2x2 mean (even factors; the whole block at 2) or the
    block-center pixel (odd factors) — _resize_select_fn's derivation. On
    the pipeline's patch values (uint16-origin integers and .5-medians,
    i.e. multiples of 0.5 below 2^16) both the float64 cv2 path and the
    float32 device path are exact, so they agree bit-for-bit at EVERY
    integer factor, not just the reference 256->128 operating point."""
    from dynamorph_tpu.pipeline.patch_vae import _resize_chw
    from dynamorph_tpu.pipeline.stream import _resize_select_fn

    rng = np.random.RandomState(0)
    # integers + half-integers, the pipeline's actual value lattice
    size = 16 * factor
    mat = rng.randint(0, 2 ** 16,
                      size=(5, 4, size, size)).astype(np.float32)
    mat += 0.5 * rng.randint(0, 2, size=mat.shape).astype(np.float32)

    for channels in [(0, 1), (2,), (3, 0)]:
        dev = np.asarray(_resize_select_fn(channels, factor)(mat))
        # the staged path: float64 stacks -> cv2 resize -> astype(float32)
        # at encode time (patch_vae.prepare_dataset + encode_patches)
        staged = _resize_chw(
            mat[:, list(channels)].astype(np.float64), (16, 16))
        np.testing.assert_array_equal(dev, staged.astype(np.float32))


def test_take_chunk_is_offset_agnostic():
    """_take_chunk_fn uses a traced index: chunks at every offset return
    the right rows (and share one compiled program per bucket shape)."""
    from dynamorph_tpu.pipeline.stream import _take_chunk_fn

    arr = np.arange(4 * 8 * 3, dtype=np.float32).reshape(32, 3)
    take = _take_chunk_fn(8)
    for ci in range(4):
        np.testing.assert_array_equal(np.asarray(take(arr, np.int32(ci))),
                                      arr[ci * 8: ci * 8 + 8])


@pytest.fixture
def tiny_weights(tmp_path):
    from dynamorph_tpu.models import VQVAEz16
    from dynamorph_tpu.train.checkpoint import save_checkpoint

    model = VQVAEz16(num_embeddings=16, num_hiddens=8,
                     num_residual_hiddens=8)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    path = str(tmp_path / "weights")
    save_checkpoint(path, {"params": params, "state": state})
    return path


def _config(weights, patch_type="mat"):
    return PipelineConfig(
        segmentation_inference=SegmentationInferenceConfig(
            channels=[0, 1], weights="unused"),
        patch=PatchConfig(channels=[0, 1], window_size=32),
        latent_encoding=LatentEncodingConfig(
            channels=[0, 1], network="VQ_VAE_z16", num_hiddens=8,
            num_residual_hiddens=8, num_embeddings=16, input_size=16,
            patch_type=patch_type, weights=weights, save_output=False),
    )


class _StubSegment(StubSeg):
    def __init__(self, **kw):
        pass

    def load(self, path):
        pass


@pytest.mark.parametrize("patch_type", ["mat", "masked_mat"])
def test_stream_matches_staged(tmp_path, monkeypatch, tiny_weights,
                               patch_type):
    """One streaming pass over two sites == fused front-end + assemble +
    process, for both patch variants: identical file_paths, bit-identical
    static_patches AND latents."""
    import dynamorph_tpu.seg.model as segmod
    from dynamorph_tpu.pipeline.patch import build_trajectories
    from dynamorph_tpu.pipeline.patch_vae import assemble_vae, process_vae
    from dynamorph_tpu.pipeline.stream import (assemble_relations,
                                               seg_patch_stream)

    from dynamorph_tpu.io.sites import site_supp_folder

    monkeypatch.setattr(segmod, "Segment", _StubSegment)
    config = _config(tiny_weights, patch_type=patch_type)
    sites = ["C5-Site_0", "C5-Site_1"]

    # --- staged chain ---
    raw_s = tmp_path / "staged"
    supp_s = str(raw_s / "supp")
    for site in sites:
        _run_fused(_make_site(raw_s, site), site_supp_folder(supp_s, site))
    build_trajectories(str(raw_s), supp_s, sites, config)
    assemble_vae(str(raw_s), supp_s, sites, config, patch_type=patch_type)
    process_vae(str(raw_s), supp_s, sites, config)

    # --- streaming pass (same raw data) ---
    raw_t = tmp_path / "stream"
    supp_t = str(raw_t / "supp")
    for site in sites:
        _make_site(raw_t, site)
    seg_patch_stream(str(raw_t), supp_t, sites, config, **CLUSTER)
    build_trajectories(str(raw_t), supp_t, sites, config)
    assemble_relations(str(raw_t), supp_t, sites, config)

    fs_s = load_pickle(os.path.join(raw_s, "C5_file_paths.pkl"))
    fs_t = load_pickle(os.path.join(raw_t, "C5_file_paths.pkl"))
    assert [os.path.relpath(f, supp_s) for f in fs_s] == \
        [os.path.relpath(f, supp_t) for f in fs_t]
    assert len(fs_s) > 0

    ds_s = load_pickle(os.path.join(raw_s, "C5_static_patches.pkl"))
    ds_t = load_pickle(os.path.join(raw_t, "C5_static_patches.pkl"))
    assert ds_s.shape == ds_t.shape and ds_s.dtype == ds_t.dtype
    np.testing.assert_array_equal(ds_s, ds_t)

    for name in ["C5_latent_space.pkl", "C5_latent_space_after.pkl"]:
        z_s = load_pickle(os.path.join(raw_s, "weights", name))
        z_t = load_pickle(os.path.join(raw_t, "weights", name))
        np.testing.assert_array_equal(z_s, z_t)

    for name in ["C5_static_patches_relations.pkl",
                 "C5_static_patches_labels.pkl"]:
        r_s = load_pickle(os.path.join(raw_s, name))
        r_t = load_pickle(os.path.join(raw_t, name))
        assert type(r_s) is type(r_t)
        if isinstance(r_s, dict):
            assert r_s == r_t
        else:
            np.testing.assert_array_equal(np.asarray(r_s), np.asarray(r_t))


def test_stream_multidevice_matches_single(tmp_path, monkeypatch,
                                           tiny_weights):
    """Streaming with frames fanned over the full 8-device mesh returns the
    same latents as a single-device stream: per-device accumulation + the
    final sorted-name reorder make the result device-count independent."""
    import dynamorph_tpu.seg.model as segmod
    from dynamorph_tpu.pipeline.stream import seg_patch_stream

    monkeypatch.setattr(segmod, "Segment", _StubSegment)
    config = _config(tiny_weights)
    all_devs = jax.local_devices()
    assert len(all_devs) == 8  # conftest forces the 8-device CPU mesh
    outs = {}
    for tag, devs in [("one", all_devs[:1]), ("all", all_devs)]:
        raw = tmp_path / tag
        _make_site(raw, "C5-Site_0")
        monkeypatch.setattr(jax, "local_devices",
                            lambda *a, _d=devs, **k: list(_d))
        seg_patch_stream(str(raw), str(raw / "supp"), ["C5-Site_0"],
                         config, **CLUSTER)
        outs[tag] = (
            load_pickle(os.path.join(raw, "C5_file_paths.pkl")),
            load_pickle(os.path.join(raw, "weights",
                                     "C5_latent_space.pkl")),
            load_pickle(os.path.join(raw, "weights",
                                     "C5_latent_space_after.pkl")))
    assert [os.path.basename(f) for f in outs["one"][0]] == \
        [os.path.basename(f) for f in outs["all"][0]]
    np.testing.assert_array_equal(outs["one"][1], outs["all"][1])
    np.testing.assert_array_equal(outs["one"][2], outs["all"][2])


def test_stream_partial_failure_raises(tmp_path, monkeypatch,
                                       tiny_weights):
    """A site failing inside the fused front-end must FAIL the streaming
    stage instead of publishing complete-looking well artifacts assembled
    from partial streams (which the orchestrator's skip_if would then
    treat as done forever)."""
    import dynamorph_tpu.seg.model as segmod
    from dynamorph_tpu.pipeline.stream import seg_patch_stream

    monkeypatch.setattr(segmod, "Segment", _StubSegment)
    config = _config(tiny_weights)
    raw = tmp_path / "exp"
    _make_site(raw, "C5-Site_0")
    # C5-Site_1 raw stack intentionally missing: the fused driver logs and
    # continues (staged contract), but streaming must not publish C5
    with pytest.raises(RuntimeError, match="C5-Site_1"):
        seg_patch_stream(str(raw), str(raw / "supp"),
                         ["C5-Site_0", "C5-Site_1"], config, **CLUSTER)
    assert not os.path.exists(os.path.join(raw, "C5_file_paths.pkl"))
    assert not os.path.exists(os.path.join(raw, "C5_static_patches.pkl"))
    assert not os.path.exists(
        os.path.join(raw, "weights", "C5_latent_space.pkl"))


def test_stream_rejects_resnet_network(tmp_path, tiny_weights):
    """The streaming encoder is VAE-family only: a ResNet latent_encoding
    config must fail loudly at stage entry (the staged process_vae has a
    ResNet branch; streaming does not)."""
    from dynamorph_tpu.pipeline.stream import seg_patch_stream

    config = _config(tiny_weights)
    config.latent_encoding.network = "ResNet50"
    with pytest.raises(ValueError, match="VAE family"):
        seg_patch_stream(str(tmp_path), str(tmp_path / "supp"),
                         ["C5-Site_0"], config)


def test_orchestrator_streaming_resnet_falls_back(tmp_path, monkeypatch,
                                                  tiny_weights):
    """streaming + fused with a ResNet network routes through the fused
    front-end + STAGED assemble/process (with a warning) instead of
    crashing in the VAE-only streaming stage."""
    from dynamorph_tpu.pipeline import fused as fused_mod
    from dynamorph_tpu.pipeline import orchestrator as orch
    from dynamorph_tpu.pipeline import patch_vae as pv
    from dynamorph_tpu.pipeline import stream as stream_mod

    calls = []
    monkeypatch.setattr(fused_mod, "seg_patch_fused",
                        lambda *a, **k: calls.append("fused") or [])
    monkeypatch.setattr(stream_mod, "seg_patch_stream",
                        lambda *a, **k: calls.append("stream"))
    monkeypatch.setattr(orch, "build_trajectories",
                        lambda *a, **k: calls.append("bt"))
    monkeypatch.setattr(orch, "assemble_vae",
                        lambda *a, **k: calls.append("assemble"))
    monkeypatch.setattr(orch, "process_vae",
                        lambda *a, **k: calls.append("process"))
    monkeypatch.setattr(orch, "trajectory_matching",
                        lambda *a, **k: calls.append("tm"))
    monkeypatch.setattr(
        pv, "load_well_inputs",
        lambda *a, **k: (["a"], np.zeros((1, 2, 1, 16, 16))))

    config = _config(tiny_weights)
    config.patch.fused = True
    config.latent_encoding.streaming = True
    config.latent_encoding.network = "ResNet50"
    executed = orch.run_pipeline(
        str(tmp_path), str(tmp_path / "supp"), ["C5-Site_0"], config,
        stages=["segmentation", "instance_segmentation", "extract_patches",
                "build_trajectories", "assemble", "process"],
        resume=False)
    assert "seg_patch_fused" in executed
    assert "seg_patch_stream" not in executed
    assert "stream" not in calls
    assert calls[:1] == ["fused"] and "process" in calls


def test_orchestrator_streaming_flag(tmp_path, monkeypatch, tiny_weights):
    """latent_encoding.streaming + patch.fused routes the orchestrator
    through seg_patch_stream; assemble runs the relations half only and
    process is absorbed into the stream."""
    import dynamorph_tpu.seg.model as segmod
    from dynamorph_tpu.pipeline import fused as fused_mod
    from dynamorph_tpu.pipeline.orchestrator import run_pipeline

    monkeypatch.setattr(segmod, "Segment", _StubSegment)
    # small-frame clustering thresholds (the driver passes none; the
    # defaults assume 2048^2 frames)
    real_site = fused_mod.process_site_seg_patch_fused
    monkeypatch.setattr(
        fused_mod, "process_site_seg_patch_fused",
        lambda *a, **kw: real_site(*a, **{**kw, **CLUSTER}))
    config = _config(tiny_weights)
    config.patch.fused = True
    config.latent_encoding.streaming = True
    raw = tmp_path / "exp"
    _make_site(raw, "C5-Site_0")
    stages = ["segmentation", "instance_segmentation", "extract_patches",
              "build_trajectories", "assemble", "process",
              "trajectory_matching"]
    executed = run_pipeline(str(raw), str(raw / "supp"), ["C5-Site_0"],
                            config, stages=stages)
    assert executed == ["seg_patch_stream", "build_trajectories",
                        "assemble", "trajectory_matching"]
    for f in ["C5_file_paths.pkl", "C5_static_patches.pkl",
              "C5_static_patches_relations.pkl", "C5_trajectories.pkl",
              os.path.join("weights", "C5_latent_space.pkl"),
              os.path.join("weights", "C5_latent_space_after.pkl")]:
        assert os.path.exists(os.path.join(raw, f)), f

    # resume: everything idempotent skips
    executed2 = run_pipeline(str(raw), str(raw / "supp"), ["C5-Site_0"],
                             config, stages=stages)
    assert executed2 == []
