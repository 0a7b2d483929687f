"""Image IO and display conversion (reference pipeline/preprocess.py:10-26,
SingleCellPatch/extract_patches.py:314-334)."""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def read_image(file_path: str) -> np.ndarray:
    """2-D grayscale image of any bit depth; npy or cv2-readable formats."""
    if file_path.endswith("npy"):
        return np.load(file_path)
    import cv2

    im = cv2.imread(file_path, cv2.IMREAD_ANYDEPTH)
    if im is None:
        raise IOError(f'Image "{file_path}" cannot be found.')
    return im


def read_multipage_tiff(file_path: str) -> np.ndarray:
    """All pages of a RAW MICROSCOPY multipage TIFF as (T, Y, X) grayscale
    (preprocess input path). For RGB composites written by
    io.tiff.write_multipage_tiff use io.tiff.read_multipage_tiff_pages,
    which preserves depth AND corrects cv2's channel order."""
    import cv2

    ok, pages = cv2.imreadmulti(file_path, flags=cv2.IMREAD_ANYDEPTH)
    if not ok:
        raise IOError(f'Multipage TIFF "{file_path}" cannot be read.')
    return np.array(pages)


def im_bit_convert(im: np.ndarray, bit: int = 16, norm: bool = False,
                   limit: Optional[Sequence[float]] = None) -> np.ndarray:
    im = im.astype(np.float32, copy=False)
    if norm:
        # None/empty -> min-max (reference im_bit_convert's falsy check,
        # extract_patches.py:314-325); explicit len() so ndarray limits
        # (np.percentile output) work without tolist()
        if limit is None or len(limit) == 0:
            limit = [np.nanmin(im[:]), np.nanmax(im[:])]
        denom = (limit[1] - limit[0]) or 1.0
        im = (im - limit[0]) / denom * (2 ** bit - 1)
    im = np.clip(im, 0, 2 ** bit - 1)
    return im.astype(np.uint8 if bit == 8 else np.uint16, copy=False)


def im_adjust(img: np.ndarray, tol: float = 1, bit: int = 8) -> np.ndarray:
    """Percentile contrast stretch for display."""
    limit = np.percentile(img, [tol, 100 - tol])
    return im_bit_convert(img, bit=bit, norm=True, limit=limit.tolist())
