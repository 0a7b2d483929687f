"""Trajectory visualisation: bounding-box GIFs.

Behavioral spec: reference SingleCellPatch/generate_trajectories.py:326-369 —
the full field of view resized to 512x512 with a red 32x32 box tracking the
target cell, saved as an animated GIF (the reference used imageio; we use
PIL, available in this environment).
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def save_traj_bbox(trajectory: Dict[int, int],
                   trajectory_positions: Dict[int, np.ndarray],
                   image_stack: np.ndarray, path: str) -> None:
    """Render one trajectory as a GIF.

    Args:
        trajectory: {t_point: cell_id}.
        trajectory_positions: {t_point: (x, y) center in full-frame coords}.
        image_stack: (T, X, Y, C-last) raw stack (reference indexes
            ``image_stack[k, :, :, 0]``).
        path: output .gif path.
    """
    import cv2

    full_x, full_y = image_stack.shape[1], image_stack.shape[2]
    t_keys = sorted(trajectory.keys())
    frames = np.zeros((len(t_keys), 512, 512))
    for i, k in enumerate(t_keys):
        frames[i] = cv2.resize(image_stack[k, :, :, 0], (512, 512))
    frames = np.stack([frames] * 3, 3) / 65535.0

    red = np.array([1.0, 0.0, 0.0]).reshape((1, 1, 3))
    # per-axis scales so boxes land correctly on non-square frames
    # (the reference hardcodes a square 2048, generate_trajectories.py:340)
    scale = np.array([full_x / 512, full_y / 512])
    for i, k in enumerate(t_keys):
        c = np.asarray(trajectory_positions[k]) / scale
        br = [(max(c[0] - 16.0, 0), min(c[0] + 16.0, 512)),
              (max(c[1] - 16.0, 0), min(c[1] + 16.0, 512))]
        for x in (br[0][0], br[0][1]):
            x_ = (int(max(x - 1.0, 0)), int(min(x + 1.0, 512)))
            frames[i, x_[0]:x_[1], int(br[1][0]):int(br[1][1])] = red
        for y in (br[1][0], br[1][1]):
            y_ = (int(max(y - 1.0, 0)), int(min(y + 1.0, 512)))
            frames[i, int(br[0][0]):int(br[0][1]), y_[0]:y_[1]] = red

    from PIL import Image

    pages = [Image.fromarray((f * 255).astype("uint8")) for f in frames]
    pages[0].save(path, save_all=True, append_images=pages[1:],
                  duration=200, loop=0)
