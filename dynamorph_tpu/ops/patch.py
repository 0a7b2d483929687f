"""On-device single-cell patch extraction.

TPU-native redesign of reference SingleCellPatch/extract_patches.py:40-278:
the reference crops windows and builds neighbor masks per cell with Python
loops + scipy convolve2d on host; here the whole frame's cells are processed
in ONE jitted program — windows via lax.dynamic_slice on a padded frame
(vmapped over cells), neighbor masks via batched disk convolutions, masked
median-background filling fused in.

Numerical parity notes: disk kernels replicate the reference's radius
conditions exactly (filter1 r<=5 over 11x11, extract_patches.py:96-101;
filter2 r<10 over 21x21, :104-109); convolutions of 0/1 masks are exact in
f32 (counts < 2^24); scipy convolve2d(mode='same') == XLA SAME-padded conv
for these symmetric kernels.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Label-map padding marker for out-of-image regions. The reference marks
# out-of-bounds via -1 padding of the segmentation window
# (extract_patches.py:241, :150); our label map uses -1 for DBSCAN noise, so
# out-of-bounds gets its own code.
OUT_OF_BOUNDS = -2


def disk_filter(size: int, strict: bool = False) -> np.ndarray:
    """Binary disk kernel. strict=False: r <= size//2 (reference filter1);
    strict=True: r < size//2 (reference filter2)."""
    c = size // 2
    yy, xx = np.mgrid[:size, :size]
    r = np.sqrt((yy - c) ** 2 + (xx - c) ** 2)
    return ((r < c) if strict else (r <= c)).astype(np.float32)


_FILTER1 = disk_filter(11, strict=False)  # masking of surrounding cells
_FILTER2 = disk_filter(21, strict=True)   # (un-)masking of center cell


def _conv_same(x: jax.Array, kernel: np.ndarray) -> jax.Array:
    """Batched single-channel 2-D convolution, zero-padded 'same'.
    x: (N, H, W) -> (N, H, W)."""
    k = jnp.asarray(kernel)[:, :, None, None]
    y = jax.lax.conv_general_dilated(
        x[..., None], k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y[..., 0]


def labels_to_map(shape: Tuple[int, int], positions: np.ndarray,
                  positions_labels: np.ndarray) -> np.ndarray:
    """Scatter DBSCAN (pixel, label) lists into a full-frame int32 label map.
    Unlisted (background) pixels get -1 — same code as DBSCAN noise, since
    both mean 'no cell here' (the reference lists only foreground pixels in
    positions/positions_labels, instance_clustering.py:89-96)."""
    lab = np.full(shape, -1, dtype=np.int32)
    if len(positions):
        lab[positions[:, 0], positions[:, 1]] = positions_labels
    return lab


@functools.partial(jax.jit, static_argnames=("window_size",))
def extract_cell_patches(raw: jax.Array, labels: jax.Array,
                         centers: jax.Array, cell_ids: jax.Array,
                         bg_fill: jax.Array, window_size: int = 256):
    """All cells of one frame -> patches + masks, one fused program.

    Args:
        raw: (C, H, W) float32 frame (z squeezed).
        labels: (H, W) int32 instance label map (-1 = no cell).
        centers: (N, 2) int32 cell centers (may include padded slots).
        cell_ids: (N,) int32 cell ids for each slot.
        bg_fill: (C,) per-channel median background fill values.
        window_size: static patch size.

    Returns dict of:
        mat:        (N, C, window, window) raw windows (0-padded at borders)
        masked_mat: (N, C, window, window) neighbor-masked windows
        tm:         (N, window, window) target-cell mask
        tm2:        (N, window, window) enlarged target mask
    """
    c = raw.shape[0]
    half = window_size // 2
    raw_p = jnp.pad(raw, ((0, 0), (half, half), (half, half)))
    lab_p = jnp.pad(labels, half, constant_values=OUT_OF_BOUNDS)

    def crop(center):
        y, x = center[0], center[1]
        lab_w = jax.lax.dynamic_slice(lab_p, (y, x), (window_size, window_size))
        raw_w = jax.lax.dynamic_slice(raw_p, (0, y, x),
                                      (c, window_size, window_size))
        return raw_w, lab_w

    raw_w, lab_w = jax.vmap(crop)(centers)                     # (N,C,W,W), (N,W,W)
    cid = cell_ids[:, None, None]
    other = ((lab_w != cid) & (lab_w >= 0)).astype(jnp.float32)
    target = (lab_w == cid).astype(jnp.float32)

    remove = jnp.sign(_conv_same(other, _FILTER1))
    tm2 = jnp.sign(_conv_same(target, _FILTER2))
    # target mask overrides remove mask (extract_patches.py:148)
    remove = ((remove - tm2) > 0).astype(jnp.float32)
    # out-of-image border is always masked (extract_patches.py:150)
    remove = jnp.where(lab_w == OUT_OF_BOUNDS, 1.0, remove)

    rm = remove[:, None]                                       # (N,1,W,W)
    masked = raw_w * (1.0 - rm) + bg_fill[None, :, None, None] * rm
    # masks as uint8: 4x less device->host traffic, values are exactly 0/1
    return {"mat": raw_w, "masked_mat": masked,
            "tm": target.astype(jnp.uint8), "tm2": tm2.astype(jnp.uint8)}


@jax.jit
def pack_mask_bits(mask: jax.Array) -> jax.Array:
    """Pack a (H, W) boolean mask into (H, W//8) uint8, little-endian bit
    order (np.unpackbits(..., bitorder='little') inverts it on host).

    Used by the fused seg->patch path to ship the foreground mask to host
    for DBSCAN at 1 bit/pixel — 512 KB instead of 16 MB of f32 probability
    map per 2048^2 frame."""
    h, w = mask.shape
    bits = mask.reshape(h, w // 8, 8).astype(jnp.uint8)
    weights = (jnp.uint8(1) << jnp.arange(8, dtype=jnp.uint8))
    return jnp.sum(bits * weights, axis=-1, dtype=jnp.uint8)


@functools.partial(jax.jit, static_argnames=("shape",))
def scatter_label_map(coords: jax.Array, labels: jax.Array,
                      shape: Tuple[int, int]) -> jax.Array:
    """Scatter (pixel, label) lists into a full-frame int32 label map ON
    DEVICE (the device-side dual of ``labels_to_map``): background stays
    -1, padded slots must carry POSITIVE out-of-bounds coords (>= shape) so
    mode="drop" discards them — negative indices WRAP in jax scatter.

    coords: (N, 2) int32 (pad slots = shape); labels: (N,) int32."""
    lab = jnp.full(shape, -1, jnp.int32)
    return lab.at[coords[:, 0], coords[:, 1]].set(labels, mode="drop")


@jax.jit
def median_background(raw: jax.Array, bg_prob: jax.Array,
                      thr: float = 0.9) -> jax.Array:
    """Per-channel median of pixels with background prob > thr
    (reference extract_patches.py:224-226), computed on device.
    raw: (C, H, W); bg_prob: (H, W). Returns (C,)."""
    mask = bg_prob > thr
    vals = jnp.where(mask[None], raw, jnp.nan)
    return jnp.nanmedian(vals.reshape(raw.shape[0], -1), axis=1)
