"""Benchmarks: VQ-VAE z16 encode (headline) + z32 train step, per TPU chip.

Measures the north-star workload (BASELINE.json): batched encode of 128x128
2-channel cell patches through the VQVAEz16 encoder + fused Pallas VQ lookup,
matching the reference's `run_VAE.py -m process` hot loop
(reference pipeline/patch_VAE.py:445-452, which runs one patch at a time).

Methodology (honest under async/pipelined runtimes):
- each iteration's input DEPENDS on the previous iteration's output (a
  data-dependency chain), so the device cannot overlap or elide iterations;
- the only sync point is a host fetch of a scalar reduced from the last
  output — `block_until_ready` alone is not a reliable barrier through
  remote-execution relays;
- throughput is the MARGINAL cost between a short and a long chain, which
  cancels fixed dispatch/fetch latency.

Output: the HEADLINE metric is the LAST JSON line (the driver's contract);
secondary lines precede it — host-only compact-deserialize patches/s,
multichip sharded-step health (8-device CPU mesh + collective-set check),
U-Net seg frames/s, z32 train-step patches/s — so training/seg/scaling/IO
regressions are visible in BENCH_r*.json history. Chain-timed metrics also
emit per-replicate "samples" + raw chain times so the relay's documented
±10% swings are visible in the JSON itself.
vs_baseline on the headline is relative to the measured reference
throughput on CPU (323.9 patches/s unbatched — see BASELINE.md); on the
train/seg lines it is relative to our own first scripted measurements
(constants below) so a regression shows as <1.
Run with --encode-only / --train-only / --seg-only / --multichip-only to
restrict.
"""
import json
import os
import sys
import time

import numpy as np

REFERENCE_CPU_PATCHES_PER_SEC = 323.9  # BASELINE.md (measured)
# First scripted seg-inference measurement (2026-08-16, this bench):
# direct whole-frame mode, 48.2 ms per 2048x2048 2-channel frame.
SEG_BASELINE_FRAMES_PER_SEC = 20.75
# Post-optimization, post-per-image-augmentation baseline (2026-08-18,
# driver run BENCH_r03.json: 13,815 patches/s) — pinned so vs_baseline
# measures drift from the CURRENT step semantics (per-image flip/rot90
# augmentation, one-pass BN, HIGH-precision training argmin), not from the
# stale round-2 starting point (10,593; history in BASELINE.md).
TRAIN_BASELINE_PATCHES_PER_SEC = 13815.0
# First scripted end-to-end process_vae measurement (2026-08-17, this
# bench, relay-tunnel environment): pickle IO + transfer + encode + save.
E2E_BASELINE_PATCHES_PER_SEC = 264.1
# First scripted host-only compact (.npz f32) static_patches deserialize
# measurement (2026-08-19, this bench, 1-vCPU relay host; run-to-run
# spread ~±15%, speedup vs pickle-f64 1.5-1.8x on this host).
COMPACT_DESER_BASELINE_PPS = 12000.0


def _samples_of(fn, reps: int, budget_s: float) -> list:
    """Up to ``reps`` calls, stopping early once ``budget_s`` of wall time
    is spent (>=1 call always runs). The relay's dispatch speed varies >3x
    between runs; a fixed rep count either wastes the budget on fast days
    or starves the other metrics on slow days. One rep costs ~±5-10%%
    noise — irrelevant at the tracked margins."""
    vals = []
    t0 = time.time()
    for _ in range(reps):
        vals.append(fn())
        if time.time() - t0 > budget_s:
            break
    return vals


def _best_of(fn, reps: int, budget_s: float) -> float:
    return min(_samples_of(fn, reps, budget_s))


def _chain_stats(t_short: list, t_long: list, d_iters: int, batch: int):
    """Per-replicate throughput estimates + min/max, emitted alongside the
    headline so relay-variance swings (documented ±10%, BASELINE.md
    "Chain-methodology validation") are visible in BENCH_r*.json itself
    instead of reading as regressions (VERDICT r4 weak #3). The headline
    value stays min(short)/min(long) — the least-interference estimate —
    while ``samples`` pairs replicate k's short and long chains."""
    per_rep = []
    for ts, tl in zip(t_short, t_long):
        marginal = max((tl - ts) / d_iters, 1e-9)
        per_rep.append(round(batch / marginal, 1))
    return {
        "samples": per_rep,
        "sample_min": min(per_rep),
        "sample_max": max(per_rep),
        "chain_s": {"short": [round(t, 4) for t in t_short],
                    "long": [round(t, 4) for t in t_long]},
    }


def bench_train_step():
    """VQ-VAE z32 full train step at the reference production config
    (batch 768, 128x128 2-ch, K=512 — reference configs/config_example.yml:
    157-182): forward incl. relation-matrix time-matching loss + backward +
    Adam + on-device augmentation. Steps chain naturally through params, so
    iterations cannot overlap."""
    import jax
    import optax

    sys.path.insert(0, ".")
    from dynamorph_tpu.models import VQVAEz32
    from dynamorph_tpu.train.steps import make_train_step

    batch_size = 768
    model = VQVAEz32(num_embeddings=512, num_hiddens=64,
                     num_residual_hiddens=64)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
    optimizer = optax.adam(1e-4)
    opt_state = optimizer.init(params)
    step = make_train_step(model, optimizer, augment=True)

    rng = np.random.RandomState(0)
    batch = jax.device_put(
        rng.rand(batch_size, 2, 128, 128).astype(np.float32))
    rel = jax.device_put(
        rng.randint(0, 3, size=(batch_size, batch_size)).astype(np.uint8))
    bmask = jax.device_put(
        rng.randint(0, 2, size=(batch_size, 1, 128, 128)).astype(np.uint8))
    key = jax.random.PRNGKey(1)

    def run_chain(iters, params, state, opt_state):
        t0 = time.perf_counter()
        losses = None
        for i in range(iters):
            params, state, opt_state, losses = step(
                params, state, opt_state, batch, rel, bmask,
                jax.random.fold_in(key, i))
        _ = float(losses["total_loss"])  # host fetch = true sync
        return time.perf_counter() - t0

    # warmup / compile
    run_chain(1, params, state, opt_state)

    short_iters, long_iters = 5, 25
    ts = _samples_of(
        lambda: run_chain(short_iters, params, state, opt_state), 3, 30)
    tl = _samples_of(
        lambda: run_chain(long_iters, params, state, opt_state), 3, 90)
    marginal = max((min(tl) - min(ts)) / (long_iters - short_iters), 1e-9)
    patches_per_sec = batch_size / marginal
    out = {
        "metric": "vqvae_z32_train_step_patches_per_sec_per_chip",
        "value": round(patches_per_sec, 1),
        "unit": "128x128 2-ch patches/s (train, batch 768)",
        "vs_baseline": round(patches_per_sec / TRAIN_BASELINE_PATCHES_PER_SEC, 2),
    }
    out.update(_chain_stats(ts, tl, long_iters - short_iters, batch_size))
    return out


def bench_seg_inference():
    """U-Net direct whole-frame segmentation (the production seg hot path,
    reference NNsegmentation/data.py:350-482 runs 309 tiled Keras forwards
    per frame; our direct mode is one fully-convolutional device pass —
    1.9x faster than even our batched tiled ensemble, see BASELINE.md)."""
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from dynamorph_tpu.seg.model import Segment

    model = Segment(input_shape=(2, 256, 256), n_classes=3)
    predict = model._predict_fn
    rng = np.random.RandomState(0)
    x_in = jax.device_put(rng.rand(1, 2, 2048, 2048).astype(np.float32))

    @jax.jit
    def chained(p, s, x):
        probs = predict(p, s, x)
        return x + 1e-12 * jnp.mean(probs), jnp.sum(probs)

    def run(n):
        x = x_in
        out = None
        t0 = time.perf_counter()
        for _ in range(n):
            x, out = chained(model.params, model.state, x)
        _ = float(out)
        return time.perf_counter() - t0

    run(1)  # compile
    short_iters, long_iters = 3, 12
    t_short = _best_of(lambda: run(short_iters), 3, 20)
    t_long = _best_of(lambda: run(long_iters), 3, 60)
    marginal = max((t_long - t_short) / (long_iters - short_iters), 1e-9)
    frames_per_sec = 1.0 / marginal
    return {
        "metric": "unet_direct_seg_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 2),
        "unit": "2048x2048 2-ch frames/s (direct mode)",
        "vs_baseline": round(frames_per_sec / SEG_BASELINE_FRAMES_PER_SEC, 2),
    }


def bench_e2e_encode(n_wells: int = 3, patches_per_well: int = 512,
                     storage: str = "pickle"):
    """END-TO-END latent encoding throughput: the wall-clock a user gets
    from `run_vae -m process` — reference-format float64 pickle load,
    host->device transfer, device-side per-patch z-score fused into the
    jitted encode, the encode itself, and latent pickle save, multi-well
    with the next well's pickles prefetched (io/prefetch.py). The headline
    encode number is the device-only ceiling; this is the user-visible
    floor. In THIS environment host<->device runs through a ~20 MB/s relay
    tunnel, so the number here is transfer-bound (production TPU hosts move
    GB/s over PCIe — see BASELINE.md for the decomposition).

    ``storage="compact"`` (bench flag --compact) runs the same pipeline on
    the opt-in float32 .npz artifact format (io/compact.py): halves IO +
    transfer bytes and skips the pickle bytecode walk."""
    import shutil
    import tempfile

    import jax

    sys.path.insert(0, ".")
    from dynamorph_tpu.config.schema import PipelineConfig
    from dynamorph_tpu.io.compact import save_array, storage_path
    from dynamorph_tpu.io.pickles import save_pickle
    from dynamorph_tpu.io.prefetch import Prefetcher
    from dynamorph_tpu.models import VQVAEz16
    from dynamorph_tpu.pipeline.patch_vae import (load_well_inputs,
                                                  process_vae)
    from dynamorph_tpu.train.checkpoint import save_checkpoint

    base = tempfile.mkdtemp(prefix="e2e_encode_")
    try:
        model = VQVAEz16(num_embeddings=64)
        params, state = jax.jit(model.init)(jax.random.PRNGKey(0))
        ckpt = os.path.join(base, "model_weights")
        save_checkpoint(ckpt, {"params": params, "state": state})

        rng = np.random.RandomState(0)
        wells = {}
        for w in range(n_wells):
            well = f"C{4 + w}"
            wells[well] = [f"{well}-Site_0"]
            # reference pickle contract: float64 (N, C, 1, 128, 128);
            # compact: the same values as float32 .npz
            patches = (rng.rand(patches_per_well, 2, 1, 128, 128)
                       * 60000).astype(np.float64)
            save_array(patches,
                       storage_path(
                           os.path.join(base,
                                        f"{well}_static_patches.pkl"),
                           storage), storage=storage)
            save_pickle([f"{well}/{i}" for i in range(patches_per_well)],
                        os.path.join(base, f"{well}_file_paths.pkl"))

        config = PipelineConfig()
        le = config.latent_encoding
        le.network = "VQ_VAE_z16"
        le.weights = ckpt
        le.save_output = False
        le.storage = storage

        def run_all():
            from dynamorph_tpu.io.prefetch import AsyncWriter

            feed = Prefetcher(list(wells.items()),
                              lambda kv: load_well_inputs(base, kv[0]))
            t0 = time.perf_counter()
            with AsyncWriter(depth=2) as writer:
                for (well, ws), preloaded in feed:
                    process_vae(base, None, ws, config, preloaded=preloaded,
                                writer=writer)
            return time.perf_counter() - t0

        run_all()          # warm: compile + page cache
        elapsed = run_all()
        pps = n_wells * patches_per_well / elapsed
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return {
        "metric": (f"e2e_process_vae_patches_per_sec"
                   + ("_compact" if storage == "compact" else "")),
        "value": round(pps, 1),
        "unit": (f"128x128 2-ch patches/s END-TO-END incl. {storage} IO + "
                 "transfer (relay-tunnel-bound here; see BASELINE.md)"),
        "vs_baseline": round(pps / E2E_BASELINE_PATCHES_PER_SEC, 2),
    }


def bench_compact_deserialize(n_patches: int = 256, reps: int = 5):
    """HOST-ONLY compact-storage regression line (VERDICT r4 item 6): time
    deserializing one synthetic well's static_patches in both formats —
    reference float64 pickle (pipeline/patch_VAE.py:454-462 contract) vs
    compact float32 .npz (io/compact.py) — with zero relay/device
    dependence, so the 2.2x host win (BASELINE.md "Compact storage") is
    pinned by the default driver run instead of an opt-in A/B.

    value = npz-f32 patches/s; vs_baseline is measured against the pinned
    first measurement so drift in the compact reader itself shows as <1;
    the pickle number and the speedup ride along as extra keys."""
    import shutil
    import tempfile

    sys.path.insert(0, ".")
    from dynamorph_tpu.io.compact import (load_array_compact,
                                          save_array_compact)
    from dynamorph_tpu.io.pickles import load_pickle, save_pickle

    base = tempfile.mkdtemp(prefix="compact_deser_")
    try:
        rng = np.random.RandomState(0)
        patches = (rng.rand(n_patches, 2, 1, 128, 128) * 60000
                   ).astype(np.float64)
        pkl = os.path.join(base, "well_static_patches.pkl")
        npz = os.path.join(base, "well_static_patches.npz")
        save_pickle(patches, pkl)
        save_array_compact(patches, npz)

        def time_loads(fn, path):
            fn(path)  # warm the page cache
            best = np.inf
            for _ in range(reps):
                t0 = time.perf_counter()
                out = fn(path)
                best = min(best, time.perf_counter() - t0)
                del out
            return best

        t_pkl = time_loads(load_pickle, pkl)
        t_npz = time_loads(load_array_compact, npz)
    finally:
        shutil.rmtree(base, ignore_errors=True)
    pps_npz = n_patches / t_npz
    pps_pkl = n_patches / t_pkl
    return {
        "metric": "host_compact_deserialize_patches_per_sec",
        "value": round(pps_npz, 1),
        "unit": ("static_patches/s npz-f32 host deserialize "
                 "(no relay/device)"),
        "vs_baseline": round(pps_npz / COMPACT_DESER_BASELINE_PPS, 2),
        "pickle_f64_patches_per_sec": round(pps_pkl, 1),
        "speedup_vs_pickle": round(pps_npz / pps_pkl, 2),
    }


def _multichip_start():
    """Multi-chip health on an 8-device CPU mesh (no TPU pod needed):
    executes the FULL sharded train step (dryrun_multichip(8) — batch-DP +
    trajectory-sharded ring time-matching loss) and asserts the compiled
    collective set is still right: the ring loss lowers to
    `collective-permute` with NO `all-gather` of z_flat (the scaling-killer
    the blocked loss exists to avoid, BASELINE.md "Multi-chip time-matching
    loss"). Runs in a CPU-backend subprocess because this process's jax is
    pinned to the real chip — and because it never touches the relay, the
    default bench starts it CONCURRENTLY with the headline and collects it
    afterwards, so this line always lands regardless of relay speed.
    value 1.0 = pass, 0.0 = fail."""
    import os
    import subprocess

    child = """
import sys; sys.path.insert(0, '.')
import jax
jax.config.update('jax_platforms', 'cpu')
import __graft_entry__
__graft_entry__.dryrun_multichip(8)
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from dynamorph_tpu.core.mesh import make_mesh
from dynamorph_tpu.train import sharded_loss as SL
mesh = make_mesh(8)
rng = np.random.RandomState(0)
z = jax.device_put(rng.randn(64, 512).astype(np.float32),
                   NamedSharding(mesh, P('data')))
rel = jax.device_put(np.zeros((64, 8), np.uint8),
                     NamedSharding(mesh, P('data')))
f = SL.make_traj_sharded_tm_loss(mesh)
hlo = jax.jit(lambda z, r: f(z, r.astype(jnp.float32), w_a=1.1, w_t=0.1,
                             w_n=-0.5, margin=0.5)).lower(z, rel)\\
    .compile().as_text()
assert 'collective-permute' in hlo, 'ring ppermute missing from HLO'
assert 'all-gather' not in hlo, 'z_flat all-gather regressed into HLO'
print('collective set ok')
"""
    env = dict(os.environ)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if not f.startswith("--xla_force_host_platform_device_count")]
    flags.append("--xla_force_host_platform_device_count=8")
    env["XLA_FLAGS"] = " ".join(flags)
    return subprocess.Popen(
        [sys.executable, "-c", child], env=env,
        cwd=os.path.dirname(os.path.abspath(__file__)) or ".",
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)


def _multichip_collect(proc, timeout: float = 300.0):
    import subprocess

    try:
        out, err = proc.communicate(timeout=timeout)
        ok = (proc.returncode == 0
              and "dryrun_multichip(8): ok" in out
              and "collective set ok" in out)
        if not ok:
            print(out[-1000:] + err[-1000:], file=sys.stderr)
    except subprocess.TimeoutExpired:
        proc.kill()
        ok = False
        print("multichip bench timed out", file=sys.stderr)
    return {
        "metric": "multichip_8dev_sharded_step_ok",
        "value": 1.0 if ok else 0.0,
        "unit": "8-dev CPU-mesh sharded train step + collective-set check (1=pass)",
        "vs_baseline": 1.0 if ok else 0.0,
    }


def bench_multichip():
    return _multichip_collect(_multichip_start())


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from dynamorph_tpu.models import VQVAEz16

    # 512 is the measured per-patch throughput sweet spot on v5e (~12%
    # faster than 1024 — activation working set stays resident; BASELINE.md
    # batch-size sweep 2026-08-16); encode_patches defaults to the same.
    batch = 512
    model = VQVAEz16(num_embeddings=64)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    x_in = jax.device_put(rng.rand(batch, 2, 128, 128).astype(np.float32))

    @jax.jit
    def chained(params, state, x):
        z_before, z_after, idx = model.encode(params, state, x)
        # next input depends on this output -> forces serial execution
        return x + 1e-12 * jnp.mean(z_before), jnp.sum(z_before)

    # warmup / compile
    x, s = chained(params, state, x_in)
    _ = float(s)

    def timed_chain(iters: int) -> float:
        x = x_in
        t0 = time.perf_counter()
        s = None
        for _ in range(iters):
            x, s = chained(params, state, x)
        _ = float(s)  # host fetch = true sync
        return time.perf_counter() - t0

    short_iters, long_iters = 10, 40
    # best-of-3 over (10, 40) chains: measured equivalent to the earlier
    # best-of-5 (10, 60) methodology within the relay's ±5% run-to-run
    # noise (2026-08-17 cross-check: 1,010k vs 965k patches/s on the same
    # warm program) at ~57% of the chain cost; reps are TIME-BOXED so a
    # slow-relay day degrades to best-of-1 instead of starving the
    # secondary metrics (VERDICT r2 item 2)
    ts = _samples_of(lambda: timed_chain(short_iters), 3, 60)
    tl = _samples_of(lambda: timed_chain(long_iters), 3, 150)
    marginal = (min(tl) - min(ts)) / (long_iters - short_iters)
    marginal = max(marginal, 1e-9)

    patches_per_sec = batch / marginal
    out = {
        "metric": "vqvae_z16_encode_patches_per_sec_per_chip",
        "value": round(patches_per_sec, 1),
        "unit": "128x128 2-ch patches/s",
        "vs_baseline": round(patches_per_sec / REFERENCE_CPU_PATCHES_PER_SEC, 1),
    }
    out.update(_chain_stats(ts, tl, long_iters - short_iters, batch))
    return out


def _emit(d):
    print(json.dumps(d), flush=True)


if __name__ == "__main__":
    # persistent XLA compile cache: repeated bench runs skip the 15-40s
    # per-program relay compiles (DYNAMORPH_COMPILE_CACHE=0 opts out)
    sys.path.insert(0, ".")
    from dynamorph_tpu.core.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    if "--train-only" in sys.argv:
        _emit(bench_train_step())
    elif "--encode-only" in sys.argv:
        _emit(main())
    elif "--seg-only" in sys.argv:
        _emit(bench_seg_inference())
    elif "--multichip-only" in sys.argv:
        _emit(bench_multichip())
    elif "--compact-deser-only" in sys.argv:
        _emit(bench_compact_deserialize())
    elif "--e2e-only" in sys.argv:
        storage = "compact" if "--compact" in sys.argv else "pickle"
        _emit(bench_e2e_encode(storage=storage))
    else:
        # The headline is measured FIRST (fast compile) but printed LAST
        # (driver contract: last JSON line). Secondary benches run
        # cheapest-first under a shared budget so a tight run drops the
        # expensive ones, not all of them; each result is emitted as soon
        # as it's measured so a runner-side kill keeps everything finished
        # so far (with the headline re-emitted last on normal completion).
        t0 = time.time()
        # multichip runs on the LOCAL CPU backend and never touches the
        # relay: start it now, in parallel with the headline, so it always
        # lands even on a slow-relay day
        mc_proc = _multichip_start()
        headline = main()
        # emit immediately so a kill during a secondary bench can never
        # discard the measured headline (it stays the last printed line in
        # that case too); re-emitted last on normal completion
        _emit(headline)
        # host-only (no relay): always cheap enough to run
        _emit(bench_compact_deserialize())
        _emit(_multichip_collect(
            mc_proc, timeout=max(30.0, 560 - (time.time() - t0))))
        # (secondary, budget-seconds-remaining needed to attempt it)
        for fn, needed in ((bench_seg_inference, 90),
                           (bench_train_step, 90)):
            if time.time() - t0 < 520 - needed:
                _emit(fn())
            else:
                print(f"skipping {fn.__name__} (time budget)",
                      file=sys.stderr)
        _emit(headline)  # headline metric stays the LAST line
