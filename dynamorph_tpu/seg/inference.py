"""Whole-map tiled segmentation inference with offset-ensemble averaging.

Behavioral spec: reference NNsegmentation/data.py:350-482 — tile the frame
into (rows x cols) windows, predict, reassemble; then n_supp passes at random
offsets covering the interior (rows-1 x cols-1), each merged by running mean.

TPU-native: all tiles of a pass form ONE device batch (padded to a bucket so
jit compiles two programs total), instead of the reference's batches of 8
host-looped through Keras. For a 2048x2048 frame that is 64 + 5x49 = 309
U-Net forwards per frame fused into 6 device calls.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from .data import load_input, plot_prediction_prob


def _predict_tiles(model, tiles: np.ndarray, batch_bucket: int = 8):
    """Predict a stack of (C, Z, x, y) tiles in one padded device batch;
    with multiple local devices the tile batch is sharded over the mesh.

    Intensities scale to [0, 1] on DEVICE: the reference's tile path goes
    through ``preprocess`` which divides by CHANNEL_MAX
    (NNsegmentation/data.py:312, :412-425); doing the divide after upload
    keeps uint16 tiles at half the transfer bytes.
    """
    import jax

    n = len(tiles)
    n_dev = len(jax.local_devices())
    if n_dev > 1:
        # bucket must divide the mesh so every shard is equal
        batch_bucket = max(batch_bucket, n_dev)
        batch_bucket -= batch_bucket % n_dev
    n_pad = ((n + batch_bucket - 1) // batch_bucket) * batch_bucket
    # keep the raw dtype — uint16 tiles upload at half the bytes of f32;
    # the [0,1] CHANNEL_MAX scaling runs on device (_scaled_predict_fn,
    # bit-identical f32 divide)
    if tiles.dtype == np.float64:
        tiles = tiles.astype(np.float32)
    if n_pad != n:
        tiles = np.concatenate(
            [tiles, np.zeros((n_pad - n,) + tiles.shape[1:], tiles.dtype)], 0)
    x = tiles.reshape((-1,) + model.input_shape)
    if n_dev > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..core.mesh import local_mesh

        # device_put the numpy array with the sharding directly: each shard
        # transfers straight to its device (staging via jnp.asarray would
        # land the whole batch on device 0 first, then reshard)
        x = jax.device_put(x, NamedSharding(local_mesh(), P("data")))
    y = _scaled_predict_fn(model)(model.params, model.state, x)
    y = np.asarray(y)[:n]
    # output spatial dims = the LAST two input dims: input_shape is
    # (c, x, y) for Segment but (c, z, x, y) for SegmentWithMultipleSlice,
    # whose z collapses to the single output slice
    assert y.shape[1:] == (model.n_classes, 1) + \
        tuple(model.input_shape[-2:])
    return y


def _scaled_predict_fn(model):
    """Jitted device-side cast + [0,1] scale + predict, cached ON the model
    instance so repeated sites reuse one compiled program (a fresh jit
    wrapper per call would retrace) without a module-level cache pinning
    dead models' device buffers for the process lifetime."""
    try:
        return model._scaled_predict
    except AttributeError:
        pass
    import jax
    import jax.numpy as jnp

    from ..core.constants import CHANNEL_MAX

    predict = model._predict_fn
    fn = jax.jit(
        lambda p, s, x: predict(p, s, x.astype(jnp.float32) / CHANNEL_MAX))
    try:
        model._scaled_predict = fn
    except AttributeError:        # model without __dict__: skip caching
        pass
    return fn


def predict_whole_map_direct(inputs: np.ndarray, model,
                             frame_batch: int = 4) -> np.ndarray:
    """Whole-frame segmentation, frames batched through one device pass.

    The U-Net is fully convolutional, so the 2048x2048 frame can run through
    it directly instead of as 64 + n_supp*49 overlapping tile forwards — no
    tile-edge artifacts, no ensemble passes needed, ~6x fewer FLOPs. Frame
    dims must be multiples of 32 (the encoder's total stride). This is the
    TPU-native fast path; the tiled ensemble (``predict_whole_map``) is kept
    for bit-parity with the reference. With multiple local devices, frame
    batches are sharded over the mesh's data axis.

    Args: inputs (T, C, Z, X, Y). Returns (T, n_classes, 1, X, Y).
    """
    import jax
    import jax.numpy as jnp

    n_frame, n_channel, n_z, x_full, y_full = inputs.shape
    assert x_full % 32 == 0 and y_full % 32 == 0, \
        "frame dims must be multiples of 32 for direct mode"

    n_dev = len(jax.local_devices())
    put = jnp.asarray
    if n_dev > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..core.mesh import local_mesh

        mesh = local_mesh()
        frame_batch = max(frame_batch, n_dev)
        frame_batch = (frame_batch // n_dev) * n_dev
        sh = NamedSharding(mesh, P("data"))

        def put(batch):  # noqa: F811
            return jax.device_put(jnp.asarray(batch), sh)

    # model._predict_fn is jitted once at construction; jit handles the new
    # whole-frame input shape as a separate cache entry. The [0,1] scaling
    # happens ON DEVICE so uint16 stacks upload at half the bytes of f32
    # (cast-then-divide in f32 is bit-identical to the former host path).
    predict_scaled = _scaled_predict_fn(model)
    outs = []
    for t0 in range(0, n_frame, frame_batch):
        batch = inputs[t0: t0 + frame_batch, :, 0]
        if batch.dtype == np.float64:
            batch = batch.astype(np.float32)  # don't upload f64
        n_b = len(batch)
        if n_b < frame_batch:
            batch = np.concatenate(
                [batch, np.zeros((frame_batch - n_b,) + batch.shape[1:],
                                 batch.dtype)], 0)
        probs = predict_scaled(model.params, model.state, put(batch))
        outs.append(np.asarray(probs)[:n_b])
    return np.concatenate(outs, 0)


def predict_whole_map(file_path, model, use_channels: Sequence[int] = (),
                      out_file_path: Optional[str] = None,
                      batch_size: int = 8, n_supp: int = 5,
                      time_slices: int = 1, rng=None, mode: str = "tiled",
                      **kwargs):
    """Segment a full 5-D stack (reference data.py:350-482).

    Args:
        file_path: path to .npy stack or the array itself.
        model: a seg.Segment instance.
        use_channels: channel indices for prediction.
        out_file_path: output path; default <input>_NNProbabilities.npy.
        batch_size: tile-count bucket for padding.
        n_supp: number of random-offset supplementary passes.
        rng: np.random-like generator for offsets (global np.random if None —
            matching the reference's use of the global RNG, data.py:440-441).
        mode: "tiled" (reference-parity offset ensemble) or "direct"
            (single whole-frame pass, see predict_whole_map_direct).
    """
    if rng is None:
        rng = np.random
    inputs = load_input(file_path) if isinstance(file_path, str) else file_path
    if len(use_channels) == 0:
        use_channels = list(range(inputs.shape[1]))
    inputs = inputs[:, np.array(use_channels)]

    if mode == "direct":
        total_outputs = predict_whole_map_direct(inputs, model)
        return _finish_whole_map(file_path, inputs, total_outputs,
                                 out_file_path)

    x_size, y_size = model.x_size, model.y_size
    n_classes = model.n_classes
    n_frame, n_channel, n_z, x_full, y_full = inputs.shape
    assert x_full % x_size == 0 and y_full % y_size == 0
    assert n_channel == model.n_channels
    rows, cols = x_full // x_size, y_full // y_size

    total_outputs = []
    for t in range(n_frame - (time_slices - 1)):
        inp = inputs[t:(t + time_slices)]

        def tile_at(x0, y0):
            patch = inp[..., x0:x0 + x_size, y0:y0 + y_size]
            if time_slices == 1:
                return patch[0]
            # (T, C, 1, x, y) -> (C, T, x, y): SegmentWithMultipleSlice's
            # input_shape is (c, z, x, y) with the time slices on z. A
            # blind reshape would interleave time into channels for C > 1
            # (the reference's own time_slices>1 tile path is dead code —
            # it feeds 5-D tiles into preprocess's 4-D unpack, data.py:283)
            return patch[:, :, 0].transpose(1, 0, 2, 3)

        # Base tiling pass
        tiles = np.stack([tile_at(r * x_size, c * y_size)
                          for r in range(rows) for c in range(cols)])
        outputs = _predict_tiles(model, tiles, batch_size)
        concatenated = -np.ones((n_classes, 1, x_full, y_full))
        ct = 0
        for r in range(rows):
            for c in range(cols):
                concatenated[..., r * x_size:(r + 1) * x_size,
                             c * y_size:(c + 1) * y_size] = outputs[ct]
                ct += 1

        # Random-offset supplementary passes, running-mean merged. A
        # single-tile frame has no interior for offset tiles (rows == 1):
        # merging zero tiles is the identity, so skip (the reference would
        # crash on the empty stack, data.py:443).
        for i_supp in range(n_supp if rows > 1 and cols > 1 else 0):
            x_off = rng.randint(1, x_size)
            y_off = rng.randint(1, y_size)
            tiles = np.stack([
                tile_at(x_off + r * x_size, y_off + c * y_size)
                for r in range(rows - 1) for c in range(cols - 1)])
            outputs = _predict_tiles(model, tiles, batch_size)
            supp = np.copy(concatenated)
            ct = 0
            for r in range(rows - 1):
                for c in range(cols - 1):
                    supp[..., (x_off + r * x_size):(x_off + (r + 1) * x_size),
                         (y_off + c * y_size):(y_off + (c + 1) * y_size)] = \
                        outputs[ct]
                    ct += 1
            concatenated = (concatenated * (i_supp + 1) + supp) / (i_supp + 2)
        total_outputs.append(concatenated)
    total_outputs = np.stack(total_outputs, 0)
    return _finish_whole_map(file_path, inputs, total_outputs, out_file_path)


def _finish_whole_map(file_path, inputs, total_outputs, out_file_path):
    if isinstance(file_path, str):
        import cv2

        if out_file_path is None:
            out_file_path = os.path.splitext(file_path)[0] + "_NNProbabilities"
        np.save(out_file_path, total_outputs)
        cv2.imwrite(os.path.splitext(file_path)[0] + ".png",
                    inputs[0, 0, 0])
        plot_prediction_prob(total_outputs[0],
                             os.path.splitext(file_path)[0] + "_NNpred.png")
        return None
    return total_outputs
