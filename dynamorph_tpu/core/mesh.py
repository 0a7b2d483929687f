"""Device meshes and shardings.

The reference parallelises by forking one OS process per GPU and statically
splitting work (reference run_segmentation.py:74-84, run_VAE.py:73-85). The
TPU-native replacement is a single process holding a `jax.sharding.Mesh` over
all local devices; batches of patches/tiles are sharded over the ``data`` axis
and parameters are replicated, with XLA inserting the collectives.

The default mesh is 1-D (``data``,) because every workload axis in this
framework (patches, tiles, frames) is embarrassingly batch-parallel; a
``model`` axis is accepted for forward-compatibility and for the driver's
multi-chip dry-run.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> None:
    """Initialise JAX's multi-process (multi-host / DCN) runtime.

    Call ONCE per process, before any other jax use, then build meshes as
    usual — ``make_mesh()`` already spans `jax.devices()`, which becomes the
    GLOBAL device list after initialisation, so the sharding annotations and
    collectives are unchanged (jit global-view semantics).

    On TPU pods all three arguments are auto-detected from the environment
    (pass nothing). For CPU-based multi-process tests pass them explicitly;
    the test suite runs 2 processes x 4 virtual devices with gloo
    collectives (tests/test_multihost.py).

    The reference has no multi-host story at all (share-nothing processes,
    reference run_segmentation.py:74-84); this replaces it with real
    cross-host data-parallel training.
    """
    explicit = (coordinator_address, num_processes, process_id)
    if any(v is not None for v in explicit) and \
            any(v is None for v in explicit):
        raise ValueError(
            "init_multihost: pass coordinator_address, num_processes and "
            "process_id together (explicit topology), or none of them "
            "(TPU-pod auto-detection) — a partial set would be silently "
            "ignored by auto-detection")
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def is_main_process() -> bool:
    return jax.process_index() == 0


def put_global(x, sharding: NamedSharding):
    """Create a global device array on ``sharding`` from a host array that
    every process holds in full (replicated host-side data loading).

    Single-process: plain ``device_put``. Multi-process: each process
    materialises only the shards its local devices own
    (``make_array_from_callback``) — a ``jnp.asarray``/``device_put`` of the
    full array would build a process-local array that cannot feed a jitted
    computation over a multi-process mesh.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding,
                                        lambda idx: x[idx])


def local_mesh(axis_names=("data",)) -> Mesh | None:
    """1-D Mesh over THIS process's local devices, or None if there is one.

    Pipeline stages (segmentation, patch extraction, latent encoding) are
    share-nothing per site/well — the reference runs them as independent
    worker processes (run_segmentation.py:74-84, run_VAE.py:73-85). Under a
    multi-process JAX runtime each process therefore shards its own sites
    over its own devices only: a GLOBAL mesh would deadlock, because the
    other processes never join these per-site programs. Training is the
    opposite case and keeps the global ``make_mesh()``.
    """
    devs = jax.local_devices()
    if len(devs) <= 1:
        return None
    return Mesh(np.array(devs), axis_names)


def process_slice(items):
    """This process's contiguous slice of a share-nothing work list.

    The multi-host equivalent of the reference's static ``np.linspace``
    site split across worker processes (run_segmentation.py:74-84) and
    well-per-worker round-robin (run_VAE.py:73-85): deterministic, no
    coordination, every item owned by exactly one process. Processes beyond
    ``len(items)`` receive an empty slice.
    """
    items = list(items)
    n = jax.process_count()
    if n == 1:
        return items
    bounds = np.linspace(0, len(items), n + 1).astype(int)
    i = jax.process_index()
    return items[bounds[i]:bounds[i + 1]]


def make_mesh(n_devices: int | None = None, axis_names=("data",), shape=None) -> Mesh:
    """Build a Mesh over the first ``n_devices`` local devices.

    Args:
        n_devices: number of devices (default: all).
        axis_names: mesh axis names.
        shape: mesh shape; default puts all devices on the first axis.
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(
            f"make_mesh: requested {n_devices} devices, found {len(devs)} "
            f"on platform '{devs[0].platform}'. For logic tests, force an "
            f"n-device CPU backend (jax.config.update('jax_platforms', "
            f"'cpu') + XLA_FLAGS=--xla_force_host_platform_device_count=n "
            f"before backend init).")
    devs = devs[:n_devices]
    if shape is None:
        shape = (n_devices,) + (1,) * (len(axis_names) - 1)
    arr = np.array(devs).reshape(shape)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard dim 0 over ``axis``, replicate the rest."""
    spec = P(axis, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def shard_batch(x, mesh: Mesh, axis: str = "data"):
    """Device-put a host batch sharded over the mesh's ``axis``.

    Pads the batch to a multiple of the axis size (returns the pad count so
    callers can trim results). Padding uses edge replication so that padded
    rows still flow through BatchNorm-free inference unchanged.
    """
    n = x.shape[0]
    size = mesh.shape[axis]
    n_pad = pad_to_multiple(n, size) - n
    if n_pad:
        pad_width = [(0, n_pad)] + [(0, 0)] * (x.ndim - 1)
        x = np.pad(x, pad_width, mode="edge")
    sharding = batch_sharding(mesh, x.ndim, axis)
    return put_global(x, sharding), n_pad
