"""Array conventions and global constants.

The on-disk contract follows the reference pipeline (see SURVEY.md §L0):
raw 5-D stacks are ``(T, C, Z, Y, X)`` float32 npy arrays; single-cell patch
tensors are ``(N, C, H, W)`` (channel-first at the API boundary, matching
reference HiddenStateExtractor/vae.py usage). Internally all compute runs
NHWC, the TPU-native layout.

Reference anchors: CHANNEL_MAX — NNsegmentation/data.py:14,
HiddenStateExtractor/vae.py:8; CHANNEL_VAR — HiddenStateExtractor/vae.py:7.
"""
import numpy as np

# Microscopy images are uint16; all intensities are scaled by this.
CHANNEL_MAX = 65535.0

# Per-channel SD used to balance reconstruction loss across channels.
CHANNEL_VAR = np.array([1.0, 1.0])

EPS = 1e-9
