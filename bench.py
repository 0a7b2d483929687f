"""Headline benchmark: VQ-VAE z16 encode throughput per TPU chip.

Measures the north-star workload (BASELINE.json): batched encode of 128x128
2-channel cell patches through the VQVAEz16 encoder + fused Pallas VQ lookup,
matching the reference's `run_VAE.py -m process` hot loop
(reference pipeline/patch_VAE.py:445-452, which runs one patch at a time).

Methodology: distinct device-resident input batches (host->device transfer in
this dev environment goes through a ~20 MB/s tunnel that does not exist on a
production TPU host, so it is excluded from the per-chip compute metric);
many timed iterations cycling through the batches; final block_until_ready.

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
    n_batches = 4
    iters = 50

    model = VQVAEz16(num_embeddings=64)
    params, state = model.init(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    xs = [
        jax.device_put(rng.rand(batch, 2, 128, 128).astype(np.float32))
        for _ in range(n_batches)
    ]

    encode = jax.jit(lambda p, s, x: model.encode(p, s, x))

    # Warmup / compile.
    for x in xs:
        zb, za, idx = encode(params, state, x)
    jax.block_until_ready((zb, za, idx))

    t0 = time.perf_counter()
    outs = []
    for i in range(iters):
        outs.append(encode(params, state, xs[i % n_batches]))
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0

    patches_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": "vqvae_z16_encode_patches_per_sec_per_chip",
        "value": round(patches_per_sec, 1),
        "unit": "128x128 2-ch patches/s",
        "vs_baseline": round(patches_per_sec / REFERENCE_CPU_PATCHES_PER_SEC, 1),
    }))


if __name__ == "__main__":
    main()
