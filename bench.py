"""Headline benchmark: VQ-VAE z16 encode throughput per TPU chip.

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

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is relative to the measured reference throughput on CPU
(323.9 patches/s unbatched — see BASELINE.md).
"""
import json
import sys
import time

import numpy as np

REFERENCE_CPU_PATCHES_PER_SEC = 323.9  # BASELINE.md (measured)


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from dynamorph_tpu.models import VQVAEz16

    batch = 1024
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

    short_iters, long_iters = 10, 60
    # best-of-3 to reduce relay jitter
    t_short = min(timed_chain(short_iters) for _ in range(3))
    t_long = min(timed_chain(long_iters) for _ in range(3))
    marginal = (t_long - t_short) / (long_iters - short_iters)
    marginal = max(marginal, 1e-9)

    patches_per_sec = batch / marginal
    print(json.dumps({
        "metric": "vqvae_z16_encode_patches_per_sec_per_chip",
        "value": round(patches_per_sec, 1),
        "unit": "128x128 2-ch patches/s",
        "vs_baseline": round(patches_per_sec / REFERENCE_CPU_PATCHES_PER_SEC, 1),
    }))


if __name__ == "__main__":
    main()
