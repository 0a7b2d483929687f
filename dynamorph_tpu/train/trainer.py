"""VQ-VAE training loop (the reference `train` entry, run_training.py:455-551),
TPU-native: one jitted, mesh-sharded train step; host only slices relation
blocks and feeds batches.

Batches stay trajectory-contiguous when a relation matrix is used
(shuffle_data=False, reference run_training.py:471-472); the relation block
for each batch is sliced from the csr matrix on host (cheap) while the
previous step runs on device (dispatch is async).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh

from . import data as data_utils
from .checkpoint import save_checkpoint
from .metrics import MetricsWriter
from .steps import make_train_step, make_eval_step

# train_vqvae keeps the patch dataset in HBM across epochs up to this many
# bytes (v5e: 16 GB; leave room for params, moments, activations)
_DEVICE_RESIDENT_BUDGET = 4 * 1024**3


class EarlyStopping:
    """Stop when val loss hasn't improved for `patience` epochs; checkpoint on
    improvement (reference pipeline/train_utils.py:8-60)."""

    def __init__(self, patience: int = 7, delta: float = 0.0,
                 path: str = "checkpoint", verbose: bool = False,
                 save_enabled: bool = True):
        self.patience = patience
        self.delta = delta
        self.path = path
        self.verbose = verbose
        # under a multi-process runtime every process must reach the save
        # (orbax coordinates the write with cross-host barriers — a
        # process-0-only call deadlocks); save_enabled exists for callers
        # that checkpoint elsewhere
        self.save_enabled = save_enabled
        self.counter = 0
        self.best_score = None
        self.early_stop = False
        self.val_loss_min = np.inf

    def __call__(self, val_loss: float, tree) -> None:
        score = -val_loss
        if self.best_score is None:
            self.best_score = score
            self._save(val_loss, tree)
        elif score < self.best_score + self.delta:
            self.counter += 1
            if self.verbose:
                print(f"EarlyStopping counter: {self.counter} / {self.patience}")
            if self.counter >= self.patience:
                self.early_stop = True
        else:
            self.best_score = score
            self._save(val_loss, tree)
            self.counter = 0

    def _save(self, val_loss: float, tree) -> None:
        if self.verbose:
            print(f"Validation loss decreased ({self.val_loss_min:.6f} -> "
                  f"{val_loss:.6f}). Saving model ...")
        if self.save_enabled:
            save_checkpoint(self.path, tree)
        self.val_loss_min = val_loss


def train_vqvae(model, dataset: np.ndarray, output_dir: str,
                relation_mat=None, mask: Optional[np.ndarray] = None,
                n_epochs: int = 10, lr: float = 1e-3, batch_size: int = 16,
                shuffle_data: bool = False, transform: bool = False,
                val_split_ratio: float = 0.15, patience: Optional[int] = 20,
                mesh: Optional[Mesh] = None, seed: int = 0,
                params=None, state=None, save_every_epoch: bool = False,
                resume: bool = False, traj_sharded_loss: bool = False):
    """Train a VQ-VAE family model. Returns (params, state, history).

    ``resume=True`` restores params/state/optimizer-moments/epoch from the
    output dir's best checkpoint if present and continues.

    Multi-host: when ``mesh`` spans multiple processes (after
    ``core.mesh.init_multihost()``), every process must call this function
    with the SAME arguments (dataset/relations replicated host-side — these
    are small; each process materialises only its local devices' shards).
    Dataset rows additionally stay device-RESIDENT per shard (uploaded in
    batch-pool order, gathered per step by a shard_map-local take — see
    the resident_mp block): once for the whole run with
    ``shuffle_data=False``, once per epoch (after the shuffle) with
    ``shuffle_data=True``. Checkpoint/metrics writes happen on
    process 0 only; loss scalars are replicated so control flow (early
    stopping, epoch order) stays in lockstep. Verified 2-process x 4-device
    == 1-process x 8-device in tests/test_multihost.py.

    ``traj_sharded_loss=True`` (requires ``mesh`` and ``relation_mat``):
    assign whole trajectories to device shards each batch and compute the
    time-matching loss block-diagonally with a ring pass for cross-shard
    negatives (train/sharded_loss.py) — no (B, L) z_flat all-gather and
    n_devices-times less relation-matrix host->device traffic. Requires
    batch_size divisible by the mesh; trailing partial batches are dropped.

    Args mirror the reference `train` (run_training.py:455-486): Adam(0.9,
    0.999), per-epoch train/val loss averaging, TensorBoard scalars, early
    stopping with best-val checkpoint at <output_dir>/model_ckpt.
    """
    assert val_split_ratio is None or 0 < val_split_ratio < 1
    os.makedirs(output_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    key = jax.random.PRNGKey(seed)

    if params is None:
        init_key, key = jax.random.split(key)
        # jitted init: eager init dispatches one tiny program per layer
        # (dozens of round-trips on remote-compile setups)
        params, state = jax.jit(model.init)(init_key)

    optimizer = optax.adam(lr, b1=0.9, b2=0.999)
    opt_state = optimizer.init(params)
    start_epoch = 0
    resume_path = os.path.join(output_dir, "model_ckpt")
    if resume and os.path.exists(resume_path):
        from .checkpoint import restore_checkpoint

        ck = restore_checkpoint(resume_path)
        params, state = ck["params"], ck["state"]
        if "opt_state" in ck and ck["opt_state"] is not None:
            opt_state = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(opt_state),
                jax.tree_util.tree_leaves(ck["opt_state"]))
        start_epoch = int(ck.get("epoch", -1)) + 1
        print(f"Resuming from {resume_path} at epoch {start_epoch}")
    n = len(dataset)
    n_shards, traj_ids = 1, None
    if traj_sharded_loss:
        if mesh is None or relation_mat is None:
            raise ValueError(
                "traj_sharded_loss requires a mesh and a relation_mat")
        import dataclasses as _dc

        from . import sharded_loss as SL

        n_shards = mesh.shape["data"]
        if batch_size % n_shards:
            raise ValueError(
                f"batch_size {batch_size} must divide the mesh ({n_shards})")
        traj_ids = SL.trajectory_ids_from_relations(relation_mat, n)
        model = _dc.replace(
            model, tm_loss_fn=SL.make_traj_sharded_tm_loss(mesh))
    # VAE/IWAE draw reparameterisation noise inside apply (models/vae.py:121,
    # 173 — reference vae.py:528,641 use torch's global RNG); their apply
    # signatures take an explicit PRNG key, detected here so one trainer
    # serves the whole network registry (reference run_training.py:885-897).
    import inspect

    needs_key = "key" in inspect.signature(model.apply).parameters
    train_step = make_train_step(model, optimizer, mesh=mesh,
                                 augment=transform, needs_key=needs_key)
    eval_step = make_eval_step(model, mesh=mesh, needs_key=needs_key)

    from ..core.mesh import is_main_process, is_multiprocess

    multiproc = mesh is not None and is_multiprocess()
    is_main = is_main_process()
    if multiproc:
        from ..core.mesh import batch_sharding, put_global, replicated_sharding
        from jax.sharding import NamedSharding, PartitionSpec as P

        if batch_size % mesh.shape["data"]:
            raise ValueError(
                f"multi-process training needs batch_size ({batch_size}) "
                f"divisible by the mesh ({mesh.shape['data']})")
        # blocked relations are laid out P('data', None); dense relations
        # and everything else follow the step's sharding constraints
        rel_sharding = (NamedSharding(mesh, P("data", None))
                        if traj_sharded_loss else replicated_sharding(mesh))

    train_ids, val_ids = data_utils.split_data_ids(
        n, val_split_ratio, shuffle_data, rng)
    if multiproc or traj_sharded_loss:
        # drop trailing partial batches: multi-process runs need identical
        # full batches on every process (static, divisible shard shapes);
        # the blocked traj-sharded loss needs full shard chunks
        train_ids = train_ids[:len(train_ids) - len(train_ids) % batch_size]
        val_ids = val_ids[:len(val_ids) - len(val_ids) % batch_size]
    if traj_sharded_loss:
        if len(train_ids) == 0:
            raise ValueError(
                f"traj_sharded_loss requires at least one full batch: "
                f"dataset of {n} leaves 0 training batches of size "
                f"{batch_size} after the {val_split_ratio} val split")
    n_batches = int(np.ceil(len(train_ids) / batch_size))
    n_val_batches = int(np.ceil(len(val_ids) / batch_size))

    writer = MetricsWriter(output_dir) if is_main else None
    ckpt_path = os.path.join(output_dir, "model_ckpt")
    early = EarlyStopping(patience=patience or 10 ** 9, path=ckpt_path,
                          verbose=is_main)
    history = []

    # Device-resident feed (single-process): streaming re-uploads the whole
    # dataset every epoch — at B=768 a batch is ~100 MB against a ~55 ms
    # step, so the feed is bandwidth-bound on anything slower than a few
    # GB/s. Resident, the patches (and the pre-transformed uint8 masks)
    # upload ONCE and batches gather on device from int32 index vectors;
    # only the uint8 relation blocks still travel per step. Gather is
    # exact, so numerics are unchanged.
    # the resident footprint includes the pre-transformed uint8 mask (one
    # channel, slice_mask) alongside the patches — gate on BOTH so a
    # dataset that barely fits doesn't OOM once the mask uploads too
    _resident_bytes = dataset.nbytes + (
        0 if mask is None else len(mask) * int(np.prod(mask.shape[2:])))
    resident = (not multiproc
                and _resident_bytes <= _DEVICE_RESIDENT_BUDGET)
    if resident:
        dataset_src = jnp.asarray(dataset)
        mask_src = None
        if mask is not None:
            # slice_mask's transform applied once over the full set, so the
            # resident path can never diverge from the streaming one
            mask_src = jnp.asarray(
                data_utils.slice_mask(mask, np.arange(len(mask))))
        take = jax.jit(lambda a, b: jnp.take(a, b, axis=0))

    # Device-resident feed (multi-process): every batch's per-shard chunk
    # is known up-front for the epoch (batch composition only changes at
    # epoch boundaries, when shuffle_data reorders train_ids). Rows are
    # uploaded in "pool" order — device s holds, contiguously, chunk s of
    # every (trajectory-packed) batch — and each step gathers its chunk
    # with a shard_map-local jnp.take: shard-aligned batches need NO
    # cross-process collective, and the per-step host->device traffic
    # drops to the uint8 relation block plus one int32 index vector
    # (VERDICT r3 item 3; feed semantics of reference
    # run_training.py:455-551). With shuffle_data=False (the
    # relation-matrix production path, run_training.py:471-472) the pool
    # uploads ONCE for the whole run; with shuffle_data=True it re-uploads
    # once per epoch after the shuffle (one bulk transfer instead of
    # per-step batch streaming — same total bytes, none of it on the step
    # path). Values are identical to the streamed feed because the pool
    # layout equals put_global's contiguous-chunk split.
    resident_mp = (multiproc
                   and _resident_bytes <= _DEVICE_RESIDENT_BUDGET)
    if resident_mp:
        S = mesh.shape["data"]
        chunk = batch_size // S
        data_sh = batch_sharding(mesh, dataset.ndim)
        mfull = (data_utils.slice_mask(mask, np.arange(len(mask)))
                 if mask is not None else None)

        def _build_pool():
            """(Re)build the shard-major row pool from the CURRENT
            train_ids/val_ids order; called once up-front and again after
            each epoch's shuffle."""
            packed = []
            for ids, n_b in ((train_ids, n_batches),
                             (val_ids, n_val_batches)):
                for i in range(n_b):
                    bids = ids[i * batch_size:(i + 1) * batch_size]
                    if traj_sharded_loss:
                        from . import sharded_loss as SL

                        bids = SL.pack_trajectories(bids, traj_ids,
                                                    n_shards)
                    packed.append(np.asarray(bids, dtype=np.int64))
            if not packed:
                return None, None
            order = np.stack(packed)                      # (nB, batch_size)
            pool_ids = (order.reshape(len(packed), S, chunk)
                        .transpose(1, 0, 2).reshape(-1))  # shard-major

            def _pool_cb(src):
                # each process materialises only its local shards' rows
                return lambda idx: src[pool_ids[idx[0]]]

            new_pool = jax.make_array_from_callback(
                (len(pool_ids),) + dataset.shape[1:], data_sh,
                _pool_cb(dataset))
            new_mask_pool = None
            if mfull is not None:
                new_mask_pool = jax.make_array_from_callback(
                    (len(pool_ids),) + mfull.shape[1:],
                    batch_sharding(mesh, mfull.ndim), _pool_cb(mfull))
            return new_pool, new_mask_pool

        pool, mask_pool = _build_pool()
        if pool is None:
            resident_mp = False
        else:
            def _local_take(d, idx):
                return jnp.take(d, idx, axis=0)

            _mp_gather = jax.jit(jax.shard_map(
                _local_take, mesh=mesh,
                in_specs=(P("data"), P()), out_specs=P("data")))

    def load_batch(item):
        """Host batch assembly (relation slice + fancy-index copy) and the
        host->device transfer enqueue. Runs in a prefetch thread so the next
        batch's feed overlaps the current device step."""
        i, bids, base = item
        if traj_sharded_loss:
            from . import sharded_loss as SL

            bids = SL.pack_trajectories(bids, traj_ids, n_shards)
            rel = SL.blockdiag_relations(relation_mat, bids, n_shards)
        else:
            rel = data_utils.slice_relation_mat(relation_mat, bids)
        if resident_mp:
            k = base + i
            idx = put_global(
                np.arange(k * chunk, (k + 1) * chunk, dtype=np.int32),
                replicated_sharding(mesh))
            batch = _mp_gather(pool, idx)
            bmask = (_mp_gather(mask_pool, idx)
                     if mask_pool is not None else None)
            rel = put_global(rel, rel_sharding) if rel is not None else None
        elif multiproc:
            bmask = data_utils.slice_mask(mask, bids)
            batch = put_global(dataset[bids], batch_sharding(mesh, dataset.ndim))
            rel = put_global(rel, rel_sharding) if rel is not None else None
            bmask = (put_global(bmask, batch_sharding(mesh, bmask.ndim))
                     if bmask is not None else None)
        elif resident:
            bidx = jnp.asarray(np.asarray(bids, dtype=np.int32))
            batch = take(dataset_src, bidx)
            bmask = take(mask_src, bidx) if mask_src is not None else None
            rel = jnp.asarray(rel) if rel is not None else None
        else:
            bmask = data_utils.slice_mask(mask, bids)
            batch = jnp.asarray(dataset[bids])
            rel = jnp.asarray(rel) if rel is not None else None
            bmask = jnp.asarray(bmask) if bmask is not None else None
        return batch, rel, bmask

    def run_epoch(ids, n_b, training, epoch_key, ordinal_base=0):
        nonlocal params, state, opt_state
        from ..io.prefetch import Prefetcher

        # Loss scalars accumulate ON DEVICE (a running sum per key); the only
        # host fetch is one device_get per epoch. A per-batch float() would
        # force a device->host sync every step and serialise the async
        # dispatch pipeline.
        totals = None
        feed = Prefetcher(
            [(i, ids[i * batch_size: (i + 1) * batch_size], ordinal_base)
             for i in range(n_b)], load_batch, depth=2)
        for (i, _, _), (batch, rel, bmask) in feed:
            step_key = jax.random.fold_in(epoch_key, i)
            if training:
                params, state, opt_state, losses = train_step(
                    params, state, opt_state, batch, rel, bmask, step_key)
            else:
                losses = eval_step(params, state, batch, rel, bmask, step_key)
            totals = losses if totals is None else jax.tree_util.tree_map(
                jnp.add, totals, losses)
        if totals is None:
            return {}
        totals = jax.device_get(totals)  # single host sync per epoch
        return {k: float(v) / n_b for k, v in totals.items()}

    for epoch in range(start_epoch, n_epochs):
        ek_train, ek_val, key = jax.random.split(key, 3)
        train_losses = run_epoch(train_ids, n_batches, True, ek_train)
        val_losses = run_epoch(val_ids, n_val_batches, False, ek_val,
                               ordinal_base=n_batches)
        if writer is not None:
            writer.write("Loss", train_losses, epoch)
            writer.write("Val loss", val_losses, epoch)
        history.append({"epoch": epoch, "train": train_losses, "val": val_losses})
        if save_every_epoch:
            # legacy per-epoch checkpoints (reference vq_vae_supp.py:385);
            # all processes enter (orbax coordinates the multihost write)
            save_checkpoint(os.path.join(output_dir, f"model_epoch{epoch}"),
                            {"params": params, "state": state})
        if not val_losses:
            # val set rounded down to zero full batches (can happen under
            # traj_sharded_loss with small datasets): early-stop on train
            # loss. Warn once — train loss rarely plateaus, so patience is
            # much less likely to trigger and runs tend to go full n_epochs.
            if epoch == start_epoch:
                import warnings
                warnings.warn(
                    "validation split has zero full batches; early stopping "
                    "will monitor the TRAIN loss (patience may never "
                    "trigger — consider more data or a smaller batch_size)")
            val_losses = train_losses
        early(val_losses["total_loss"],
              {"params": params, "state": state, "opt_state": opt_state,
               "epoch": epoch})
        if early.early_stop:
            print("Early stopping")
            break
        if shuffle_data and epoch < n_epochs - 1:
            # reshuffle for the NEXT epoch only — after the early-stop
            # check and never on the final epoch, so a run's last act is
            # not a pool re-upload nobody reads (resident_mp re-uploads up
            # to the full device-resident budget per shuffle)
            rng.shuffle(train_ids)
            if resident_mp:
                # batch composition changed: re-upload the pool in the new
                # order (one bulk transfer, off the step path)
                pool, mask_pool = _build_pool()
    if writer is not None:
        writer.close()
    return params, state, history


def train_triplet(model, train_set, val_set, output_dir: str,
                  n_epochs: int = 10, lr: float = 1e-3,
                  batch_size: int = 192, patience: Optional[int] = 20,
                  earlystop_metric: str = "positive_triplet",
                  retrain: bool = False, log_step_offset: int = 0,
                  mesh: Optional[Mesh] = None, params=None, state=None,
                  seed: int = 0):
    """Triplet-loss training with positive-set sampling (the reference
    `train_with_loader`, run_training.py:554-627).

    ``train_set``/``val_set`` are TripletDataset instances
    (train/triplet_data.py); each step runs the whole flattened batch through
    one jitted forward+backward with the triplet miner inside. With ``mesh``
    the batch shards over the 'data' axis (params replicated, gradient psum
    + embedding all-gather for the miner inserted by XLA).

    Multi-host: when ``mesh`` spans multiple processes (after
    ``core.mesh.init_multihost()``), every process must call this with the
    SAME arguments and seed — datasets replicated host-side, so the seeded
    shuffle and positive-set draws agree everywhere; batches feed through
    ``put_global`` (each process materialises only its local shards) and
    trailing partial batches are dropped (static, divisible shard shapes).
    Checkpoint/metrics writes happen on process 0; loss scalars are
    replicated so early stopping stays in lockstep. Verified 2-process x
    4-device == 1-process x 8-device in tests/test_multihost.py.
    """
    import optax

    from ..core.mesh import is_main_process, is_multiprocess

    multiproc = mesh is not None and is_multiprocess()
    is_main = is_main_process()
    if multiproc:
        from ..core.mesh import batch_sharding, put_global

    from .triplet_data import triplet_batches

    os.makedirs(output_dir, exist_ok=True)
    rng = np.random.RandomState(seed)

    if params is None:
        params, state = jax.jit(model.init)(jax.random.PRNGKey(seed))
    ckpt_path = os.path.join(output_dir, "model_ckpt")
    if os.path.exists(ckpt_path) and not retrain:
        from .checkpoint import restore_checkpoint

        if is_main:
            print(f"Found previously saved model state {ckpt_path}. "
                  "Continue training...")
        ck = restore_checkpoint(ckpt_path)
        params, state = ck["params"], ck["state"]

    optimizer = optax.adam(lr, b1=0.9, b2=0.999)
    opt_state = optimizer.init(params)
    from .steps import make_triplet_steps

    step, eval_step = make_triplet_steps(model, optimizer, mesh=mesh)

    writer = MetricsWriter(output_dir) if is_main else None
    early = EarlyStopping(patience=patience or 10 ** 9, path=ckpt_path,
                          verbose=is_main)
    history = []
    warned_fallback = False
    for epoch in range(log_step_offset, n_epochs):
        # on-device running loss sums; one host fetch per epoch per split
        totals = {True: None, False: None}
        counts = {True: 0, False: 0}
        for training, dataset in ((True, train_set), (False, val_set)):
            for labels, data in triplet_batches(dataset, batch_size,
                                                shuffle=training, rng=rng):
                if multiproc:
                    full_rows = batch_size * dataset.n_sample
                    if (len(data) != full_rows
                            or len(data) % mesh.shape["data"]):
                        # trailing partial batch: multi-process shard
                        # shapes must be static — ANY second shape (even
                        # one that happens to divide the shard count)
                        # would compile a second train-step program, so
                        # drop everything short of the full batch (same
                        # policy as train_vqvae's up-front truncation)
                        continue
                    batch = put_global(np.asarray(data, np.float32),
                                       batch_sharding(mesh, data.ndim))
                    lab = put_global(np.asarray(labels),
                                     batch_sharding(mesh, 1))
                else:
                    batch = jnp.asarray(data, jnp.float32)
                    lab = jnp.asarray(labels)
                if training:
                    params, state, opt_state, losses = step(
                        params, state, opt_state, batch, lab)
                else:
                    losses = eval_step(params, state, batch, lab)
                totals[training] = losses if totals[training] is None else \
                    jax.tree_util.tree_map(jnp.add, totals[training], losses)
                counts[training] += 1

        def mean_of(flag):
            if totals[flag] is None:
                return {}
            fetched = jax.device_get(totals[flag])
            return {k: float(v) / counts[flag] for k, v in fetched.items()}

        train_losses = mean_of(True)
        val_losses = mean_of(False)
        if writer is not None:
            writer.write("Loss", train_losses, epoch)
            writer.write("Val loss", val_losses, epoch)
        history.append({"epoch": epoch, "train": train_losses,
                        "val": val_losses})
        # metric fallbacks instead of a KeyError mid-training: an empty val
        # set yields no val losses (monitor train), and the hard-negative
        # miner has no positive_triplet metric (monitor total_loss — the
        # reference's own loop would crash here, run_training.py:818 +
        # losses.py:263 returning None)
        if not train_losses:
            # zero train batches ran this epoch: empty dataset, or (multi-
            # process) everything was dropped by the full-batch-only feed
            raise ValueError(
                f"no training batches ran: the dataset ({len(train_set)} "
                f"anchors) must cover at least one "
                f"{'full ' if multiproc else ''}batch of {batch_size} "
                "anchors" + (" (multi-process runs drop partial batches; "
                             "shrink batch_size or add data)"
                             if multiproc else ""))
        monitored = val_losses or train_losses
        metric = earlystop_metric if earlystop_metric in monitored \
            else "total_loss"
        if (not val_losses or metric != earlystop_metric) \
                and not warned_fallback:
            import warnings

            warnings.warn(
                f"early stopping monitors "
                f"{'val' if val_losses else 'TRAIN'} '{metric}' "
                f"(requested '{earlystop_metric}')")
            warned_fallback = True
        early(monitored[metric], {"params": params, "state": state})
        if early.early_stop:
            if is_main:
                print("Early stopping")
            break
    if writer is not None:
        writer.close()
    return params, state, history
