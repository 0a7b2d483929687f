"""Classical morphology features for single-cell patches.

Behavioral spec: reference HiddenStateExtractor/cv2_feature.py — KAZE
descriptors (:20-51), cell size/contour area (:61-75), intensity percentiles
(:78-112), PCA long-axis angle + aspect ratio (:171-197, :200-217). Host-side
cv2/numpy; updated for cv2>=4 findContours signature (the reference targets
cv2 3.x).
"""
from __future__ import annotations

import cmath
from typing import List, Optional, Tuple

import numpy as np

from ..core.constants import CHANNEL_MAX


def _find_contours(mask):
    import cv2

    out = cv2.findContours(mask.astype("uint8"), 1, 2)
    return out[0] if len(out) == 2 else out[1]  # cv2 4.x vs 3.x


def extract_features(x: np.ndarray, vector_size: int = 32) -> Optional[np.ndarray]:
    """KAZE descriptors per channel slice, top-response keypoints, flattened
    and zero-padded to vector_size*64 (reference cv2_feature.py:20-51)."""
    import cv2

    x = x.astype("uint8")
    try:
        dscs = []
        alg = cv2.KAZE_create()
        for x_slice in x:
            kps = alg.detect(x_slice)
            kps = sorted(kps, key=lambda k: -k.response)[:vector_size]
            kps, dsc = alg.compute(x_slice, kps)
            if dsc is None:
                dsc = np.zeros((0,))
            dsc = dsc.flatten()
            needed = vector_size * 64
            if dsc.size < needed:
                dsc = np.concatenate([dsc, np.zeros(needed - dsc.size)])
            dscs.append(dsc)
        return np.stack(dscs, 0)
    except Exception as e:
        print("Error: " + str(e))
        return None


def get_size(mask: np.ndarray) -> Tuple[float, float]:
    """(pixel count, largest contour area) (reference cv2_feature.py:61-75)."""
    import cv2

    contours = _find_contours(mask)
    areas = [cv2.contourArea(cnt) for cnt in contours]
    return mask.sum(), np.max(areas)


def get_intensity_profile(dat, mask=None) -> List[Tuple[float, ...]]:
    """Per-channel (peak, 95th percentile, mean of top 200, sum) intensities
    within the mask (reference cv2_feature.py:78-112)."""
    if mask is None:
        # whole-patch profile; the reference's mask=None default crashes
        # on None arithmetic (cv2_feature.py:104-106) — an all-ones mask
        # is the working meaning of "no mask"
        mask = np.ones(np.asarray(dat[0]).shape, bool)
    output = []
    for channel_slice in dat:
        channel_slice = channel_slice / CHANNEL_MAX
        bg = 0.0
        peak_int = ((channel_slice - bg) * mask).max()
        sum_int = ((channel_slice - bg) * mask).sum()
        intensities = (channel_slice - bg)[np.where(mask)]
        quantile_int = np.percentile(intensities, 95)
        top200_int = np.mean(sorted(intensities)[-200:])
        output.append((peak_int, quantile_int, top200_int, sum_int))
    return output


def rotate_bound(image: np.ndarray, angle: float) -> np.ndarray:
    """Rotate with expanded bounds (reference cv2_feature.py:146-170)."""
    import cv2

    h, w = image.shape[:2]
    cx, cy = w / 2, h / 2
    M = cv2.getRotationMatrix2D((cx, cy), angle, 1.0)
    cos, sin = np.abs(M[0, 0]), np.abs(M[0, 1])
    nW = int((h * sin) + (w * cos))
    nH = int((h * cos) + (w * sin))
    M[0, 2] += (nW / 2) - cx
    M[1, 2] += (nH / 2) - cy
    return cv2.warpAffine(image, M, (nW, nH))


def get_angle_apr(mask: np.ndarray) -> Tuple[float, float, float]:
    """Long-axis angle via PCA of mask coords + bounding box of the rotated
    mask (reference cv2_feature.py:171-197). Returns (width, height, angle)."""
    import cv2

    y, x = np.nonzero(mask)
    x = x - np.mean(x)
    y = y - np.mean(y)
    cov = np.cov(np.stack([x, y], 0))
    evals, evecs = np.linalg.eig(cov)
    main_axis = evecs[:, np.argmax(evals)]
    angle = cmath.polar(complex(*main_axis))[1]
    rotated = rotate_bound(mask, -angle / np.pi * 180)
    contours = _find_contours(rotated)
    areas = [cv2.contourArea(cnt) for cnt in contours]
    rect = cv2.boundingRect(contours[int(np.argmax(areas))])
    return rect[2], rect[3], angle


def get_aspect_ratio_no_rotation(mask: np.ndarray) -> Tuple[float, float]:
    """Bounding-box width/height of the unrotated mask
    (reference cv2_feature.py:200-217)."""
    import cv2

    contours = _find_contours(mask)
    areas = [cv2.contourArea(cnt) for cnt in contours]
    rect = cv2.boundingRect(contours[int(np.argmax(areas))])
    return rect[2], rect[3]
