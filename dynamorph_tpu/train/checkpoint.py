"""Checkpointing via orbax (TPU equivalent of the reference's torch.save
state_dict checkpoints, reference pipeline/train_utils.py:54-60,
run_training.py:542-545)."""
from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save_checkpoint(path: str, tree: Any):
    """Save a pytree (params/state/opt_state/metadata) to ``path``.

    Multi-host: EVERY process must call this (orbax coordinates the write
    with cross-host sync barriers — a process-0-only call deadlocks the
    other processes at the next collective). Verified in
    tests/test_multihost.py.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.device_get(tree), force=True)


def restore_checkpoint(path: str, target: Optional[Any] = None):
    """Restore a pytree saved by ``save_checkpoint``. ``target`` (a template
    pytree) restores with matching structure/dtypes when given."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        return ckptr.restore(path, item=jax.device_get(target))
    return ckptr.restore(path)
