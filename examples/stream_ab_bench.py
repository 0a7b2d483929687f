"""Staged vs streaming raw->latents A/B at production frame scale.

Measures the two data paths from raw 5-D stacks to encoded latents on the
SAME synthetic well (reference-scale 2048x2048 frames, ~35 cells/frame):

  staged:    seg_patch_fused -> (stacks pickles on disk) -> assemble_vae
             (host cv2 resize, static_patches float64 on disk) ->
             process_vae (re-upload, encode)       [patch_VAE.py:115-175,
                                                    :343-508 structure]
  streaming: seg_patch_stream — patches stay in HBM through resize +
             z-score + encode; stacks/static_patches/latent pickles are
             AsyncWriter side-effects (pipeline/stream.py)

A deterministic piecewise-linear stub U-Net (same device work shape as a
conv net is NOT needed here: the A/B isolates the PATCH->LATENT data
path, which is identical work in both modes) guarantees bit-equal
probability maps, so cells/patches are identical and the wall-clock delta
is purely the data-path structure. Latents are asserted bit-equal at the
end (the stream's exactness contract, tests/test_stream_encode.py).

Prints per-stage wall clocks, raw->latents patches/s for both paths, and
the per-patch transfer/IO ledger.

    python examples/stream_ab_bench.py [output_dir] [--frames N]
"""
import json
import os
import shutil
import sys
import time

import numpy as np


def make_site(raw, name, n_frames=6, size=2048, n_cells=35, r=24, seed=0):
    """Bright-disk cells on noisy background; channel-0 intensity is the
    stub model's segmentation signal. Disk area ~1.8k px sits inside the
    production DBSCAN defaults (eps 10 / min_samples 250, ct (500, 12k))."""
    rng = np.random.RandomState(seed)
    os.makedirs(raw, exist_ok=True)
    yy, xx = np.mgrid[:size, :size]
    centers0 = rng.randint(220, size - 220, size=(n_cells, 2))
    vel = rng.randint(-4, 5, size=centers0.shape)
    stack = np.zeros((n_frames, 2, 1, size, size), np.uint16)
    for t in range(n_frames):
        frame = rng.rand(2, size, size) * 5000 + 10000
        for cy, cx in centers0 + vel * t:
            m = (yy - cy) ** 2 + (xx - cx) ** 2 < r ** 2
            frame[0][m] = 60000
            frame[1][m] = 45000
        stack[t, :, 0] = frame.astype(np.uint16)
    np.save(os.path.join(raw, f"{name}.npy"), stack)


def install_stub_segment():
    """Replace seg.model.Segment with the piecewise-linear stub (same
    trick as tests/test_fused_seg_patch.py): prob rises with channel-0
    intensity; sub/mul/clamp only, so outputs are bit-equal at any batch
    size or device placement."""
    import jax
    import jax.numpy as jnp

    import dynamorph_tpu.seg.model as segmod

    class StubSegment:
        n_classes = 3
        params = {"w": jnp.float32(10.0)}
        state = {}

        def __init__(self, **kw):
            pass

        def load(self, path):
            pass

        @staticmethod
        @jax.jit
        def _predict_fn(params, state, x):
            blob = jnp.clip((x[:, 0] - 0.5) * params["w"], 0.0, 1.0)
            p1 = 0.9 * blob
            p2 = jnp.full_like(p1, 0.05)
            p0 = 1.0 - p1 - p2
            return jnp.stack([p0, p1, p2], axis=1)[:, :, None]

    segmod.Segment = StubSegment


def build_config(root):
    import jax

    from dynamorph_tpu.config.schema import (LatentEncodingConfig,
                                             PatchConfig, PipelineConfig,
                                             SegmentationInferenceConfig)
    from dynamorph_tpu.models import VQVAEz16
    from dynamorph_tpu.train.checkpoint import save_checkpoint

    model = VQVAEz16(num_embeddings=64)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    ckpt = os.path.join(root, "model_weights")
    save_checkpoint(ckpt, {"params": params, "state": state})
    return PipelineConfig(
        segmentation_inference=SegmentationInferenceConfig(
            channels=[0, 1], window_size=256, weights=ckpt,  # stub ignores
            inference_mode="direct"),
        patch=PatchConfig(channels=[0, 1], window_size=256, reload=False),
        latent_encoding=LatentEncodingConfig(
            channels=[0, 1], network="VQ_VAE_z16", weights=ckpt,
            save_output=False),
    )


def main(root, n_frames=6):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from dynamorph_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    install_stub_segment()

    from dynamorph_tpu.io.pickles import load_pickle
    from dynamorph_tpu.pipeline.fused import seg_patch_fused
    from dynamorph_tpu.pipeline.patch import build_trajectories
    from dynamorph_tpu.pipeline.patch_vae import assemble_vae, process_vae
    from dynamorph_tpu.pipeline.stream import seg_patch_stream

    site = "C5-Site_0"
    timings = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        fn()
        timings[name] = time.perf_counter() - t0
        print(f"   [{name}] {timings[name]:.1f}s", flush=True)

    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    config = build_config(root)

    # --- staged path -----------------------------------------------------
    raw_s = os.path.join(root, "staged")
    supp_s = os.path.join(raw_s, "supp")
    make_site(raw_s, site, n_frames=n_frames)
    print(f"== staged: fused front-end -> assemble -> process "
          f"({n_frames} frames 2048^2) ==")
    timed("staged_front_end",
          lambda: seg_patch_fused(raw_s, supp_s, [site], config,
                                  save_probabilities=False))
    # host-only, identical in both paths; assemble needs cell_traj
    timed("trajectories_staged",
          lambda: build_trajectories(raw_s, supp_s, [site], config))
    timed("staged_assemble",
          lambda: assemble_vae(raw_s, supp_s, [site], config))
    timed("staged_process",
          lambda: process_vae(raw_s, supp_s, [site], config))

    # --- streaming path (same raw data) ----------------------------------
    raw_t = os.path.join(root, "stream")
    supp_t = os.path.join(raw_t, "supp")
    make_site(raw_t, site, n_frames=n_frames)
    print("== streaming: one device-resident pass ==")
    timed("stream_pass",
          lambda: seg_patch_stream(raw_t, supp_t, [site], config,
                                   save_probabilities=False))

    # --- parity + report --------------------------------------------------
    fs_s = load_pickle(os.path.join(raw_s, "C5_file_paths.pkl"))
    fs_t = load_pickle(os.path.join(raw_t, "C5_file_paths.pkl"))
    assert [os.path.basename(f) for f in fs_s] == \
        [os.path.basename(f) for f in fs_t]
    n = len(fs_s)
    for name in ["C5_latent_space.pkl", "C5_latent_space_after.pkl"]:
        z_s = load_pickle(os.path.join(raw_s, "model_weights", name))
        z_t = load_pickle(os.path.join(raw_t, "model_weights", name))
        np.testing.assert_array_equal(z_s, z_t)
    print(f"   latents bit-equal across paths ({n} patches)")

    staged_e2e = (timings["staged_front_end"] + timings["staged_assemble"]
                  + timings["staged_process"])
    stream_e2e = timings["stream_pass"]
    report = {
        "n_patches": n,
        "staged_raw_to_latents_s": round(staged_e2e, 2),
        "staged_patch_to_latent_s": round(
            timings["staged_assemble"] + timings["staged_process"], 2),
        "stream_raw_to_latents_s": round(stream_e2e, 2),
        "staged_patches_per_s": round(n / staged_e2e, 1),
        "stream_patches_per_s": round(n / stream_e2e, 1),
        "timings": {k: round(v, 2) for k, v in timings.items()},
    }
    # per-patch transfer/IO ledger (C=2 channels, 256^2 window, 128^2
    # model input): what crosses host<->device or disk per patch, and
    # whether it sits on the critical path or drains on a writer thread
    report["ledger_per_patch_bytes"] = {
        "stacks_download_256^2_f32": 2 * 256 * 256 * 4,      # both paths;
        # async in both since the round-3 deferred patch fetch
        "staged_static_patches_disk_f64_128^2": 2 * 128 * 128 * 8,
        # staged only: written by assemble, re-READ by process (x2 IO)
        "staged_encode_upload_f32_128^2": 2 * 128 * 128 * 4,
        # staged only, CRITICAL PATH: process_vae re-uploads every patch
        "stream_resized_download_f32_128^2": 2 * 128 * 128 * 4,
        # streaming only, async: the static_patches artifact copy
        "stream_encode_upload": 0,  # patches never leave HBM
    }
    print("\n== report ==")
    print(json.dumps(report, indent=1))
    with open(os.path.join(root, "stream_ab.json"), "w") as fh:
        json.dump(report, fh, indent=1)


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith(
        "--") else "/tmp/dynamorph_stream_ab"
    n = int(sys.argv[sys.argv.index("--frames") + 1]) \
        if "--frames" in sys.argv else 6
    main(out, n_frames=n)
