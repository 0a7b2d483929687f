"""Model training entry point (VQ-VAE family or ResNet/SimCLR triplet).

Usage: python -m dynamorph_tpu.cli.run_training -c <config.yml>
(reference run_training.py:771-966).

Dataflow: per raw_dir, load {im_file_paths, im_static_patches, labels,
relations}.pkl, z-score, concat relations across dirs; VAE branch reorders
trajectory-contiguously and trains with the time-matching loss; ResNet branch
samples positive sets via TripletDataset and trains with the triplet miner.
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from ..config import load_config
from ..io.pickles import load_pickle
from ..models.registry import get_model_cls
from ..models.resnet_simclr import EncodeProject
from ..train import data as data_utils
from ..train.trainer import train_triplet, train_vqvae
from ..train.triplet_data import TripletDataset, augment_img


def main(config_path: str):
    from ..core.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    config = load_config(config_path)
    tr = config.training

    use_loader = "ResNet" in tr.network
    dir_sets = list(zip(tr.supp_dirs, tr.weights_dirs, tr.raw_dirs))

    datasets, masks, relations, labels_list = [], [], [], []
    id_offsets = [0]
    for supp_dir, train_dir, raw_dir in dir_sets:
        os.makedirs(train_dir, exist_ok=True)
        from dynamorph_tpu.io.compact import load_array_any

        # static patches may be pickle or compact npz (io/compact.py)
        dataset = load_array_any(
            os.path.join(raw_dir, "im_static_patches.pkl"))
        label = load_pickle(
            os.path.join(raw_dir, "im_static_patches_labels.pkl"))
        relation = load_pickle(
            os.path.join(raw_dir, "im_static_patches_relations.pkl"))
        relations.append(relation)
        dataset = data_utils.zscore(
            np.squeeze(dataset), channel_mean=tr.channel_mean,
            channel_std=tr.channel_std).astype(np.float32)
        datasets.append(dataset)
        labels_list.append(label)
        id_offsets.append(len(dataset))
        if tr.use_mask:
            masks.append(load_array_any(
                os.path.join(raw_dir, "im_static_patches_mask.pkl")))
    # cumulative offsets [0, n0, n0+n1, ...]: the reference keeps raw
    # per-dir lengths (run_training.py:866-871), silently mis-indexing the
    # third-and-later dirs' relations/labels into the concatenated dataset
    id_offsets = list(np.cumsum(id_offsets[:-1]))
    dataset = np.concatenate(datasets, axis=0)
    mask = np.concatenate(masks, axis=0) if tr.use_mask else None
    relations, labels = data_utils.concat_relations(
        relations, labels_list, offsets=id_offsets)
    model_dir = os.path.join(dir_sets[-1][1], tr.model_name)

    if not use_loader:
        dataset, relation_mat, order = data_utils.reorder_with_trajectories(
            dataset, relations, seed=123)
        labels = labels[np.asarray(order)]
        model_cls = get_model_cls(tr.network)
        import dataclasses as _dc

        # VQ-only knobs (num_embeddings, commitment_cost, vq_train_precision)
        # are filtered by the target dataclass's fields so the VAE/IWAE/AAE
        # networks construct cleanly from the same config section.
        model_kwargs = dict(
            num_inputs=tr.num_inputs,
            num_hiddens=tr.num_hiddens,
            num_residual_hiddens=tr.num_residual_hiddens,
            num_residual_layers=tr.num_residual_layers,
            num_embeddings=tr.num_embeddings,
            commitment_cost=tr.commitment_cost,
            weight_matching=tr.weight_matching,
            w_a=tr.w_a, w_t=tr.w_t, w_n=tr.w_n, margin=tr.margin,
            vq_train_precision=tr.vq_train_precision)
        accepted = {f.name for f in _dc.fields(model_cls)}
        model = model_cls(
            **{k: v for k, v in model_kwargs.items() if k in accepted})
        # Multi-chip: shard the batch over all local devices. With a relation
        # matrix and a divisible batch, also pack whole trajectories per
        # shard so the time-matching loss runs block-diagonally with a ring
        # ppermute instead of an all-gather (documents/6-scaling.md).
        import jax

        from ..core.mesh import make_mesh

        mesh = None
        traj_sharded = False
        if jax.device_count() > 1:
            mesh = make_mesh()
            traj_sharded = (relation_mat is not None
                            and tr.batch_size % mesh.shape["data"] == 0)
        # Resume semantics mirror the ResNet branch (reference
        # run_training.py:938-947): start_model_path seeds initial weights;
        # retrain=False lets an interrupted run continue from the output
        # dir's checkpoint (with optimizer moments + epoch); retrain=True
        # forces a fresh optimizer/epoch even if a checkpoint exists.
        params = state = None
        if tr.start_model_path:
            # handles both an orbax checkpoint dir and a reference-format
            # torch model.pt (same dispatch as the latent-encoding CLI)
            from ..pipeline.patch_vae import _load_model_weights

            params, state = _load_model_weights(model, tr.start_model_path)
        train_vqvae(model, dataset, model_dir,
                    relation_mat=relation_mat, mask=mask,
                    n_epochs=tr.n_epochs, lr=tr.learn_rate,
                    batch_size=tr.batch_size, transform=True,
                    shuffle_data=tr.shuffle_data,
                    val_split_ratio=tr.val_split_ratio,
                    patience=tr.patience, mesh=mesh,
                    traj_sharded_loss=traj_sharded,
                    params=params, state=state,
                    resume=not tr.retrain)
    else:
        train_set, train_labels, val_set, val_labels = \
            data_utils.train_val_split(dataset, labels,
                                       val_split_ratio=tr.val_split_ratio,
                                       seed=0)
        tri_train = TripletDataset(
            train_labels, lambda i: augment_img(train_set[i]),
            tr.n_pos_samples)
        tri_val = TripletDataset(
            val_labels, lambda i: augment_img(val_set[i]),
            tr.n_pos_samples)
        batch_size_adj = int(np.floor(tr.batch_size / tr.n_pos_samples))
        model = EncodeProject(arch=tr.network, num_inputs=tr.num_inputs,
                              margin=tr.margin)
        params = state = None
        if tr.start_model_path:
            from ..train.checkpoint import restore_checkpoint

            ck = restore_checkpoint(tr.start_model_path)
            params, state = ck["params"], ck["state"]
        # Multi-chip: shard triplet batches over all local devices (the
        # miner's embedding all-gather and the grad psum come from the
        # step's sharding annotations, train/steps.py::make_triplet_steps)
        import jax

        from ..core.mesh import make_mesh

        mesh = make_mesh() if jax.device_count() > 1 else None
        train_triplet(model, tri_train, tri_val, model_dir,
                      n_epochs=tr.n_epochs, lr=tr.learn_rate,
                      batch_size=batch_size_adj, patience=tr.patience,
                      earlystop_metric=tr.earlystop_metric,
                      retrain=tr.retrain, log_step_offset=tr.start_epoch,
                      params=params, state=state, mesh=mesh)


def parse_args():
    from .common import add_multihost_args, init_multihost_from_args

    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, required=True,
                        help="path to yaml configuration file")
    add_multihost_args(parser)
    args = parser.parse_args()
    # training under --multihost uses the GLOBAL mesh (make_mesh spans all
    # hosts' devices after init): one data-parallel train step across hosts,
    # per documents/6-scaling.md
    init_multihost_from_args(args)
    return args


if __name__ == "__main__":
    main(parse_args().config)
