"""Minimal TIFF writer for multipage uint16 grayscale/RGB stacks.

The reference writes validation overlays as uint16 multipage TIFF via
skimage/tifffile (reference pipeline/segmentation_validation.py:164-166);
neither is available here, and PIL cannot encode uint16 RGB — so this module
implements the small subset of baseline TIFF needed: uncompressed, one strip
per page, little-endian.
"""
from __future__ import annotations

import struct
from typing import List

import numpy as np

_TAG_FORMATS = {"H": 3, "I": 4}  # SHORT, LONG


def _entry(tag: int, type_: int, count: int, value: int) -> bytes:
    return struct.pack("<HHII", tag, type_, count, value)


def write_multipage_tiff(path: str, stack: np.ndarray) -> None:
    """Write (T, H, W) or (T, H, W, 3) uint8/uint16 stack as multipage TIFF."""
    stack = np.asarray(stack)
    if stack.ndim == 3:
        stack = stack[..., None]
    assert stack.ndim == 4, "expect (T, H, W) or (T, H, W, C)"
    t, h, w, c = stack.shape
    assert c in (1, 3), "grayscale or RGB only"
    assert stack.dtype in (np.uint8, np.uint16)
    bits = 16 if stack.dtype == np.uint16 else 8
    photometric = 2 if c == 3 else 1

    with open(path, "wb") as f:
        f.write(b"II*\x00")
        ifd_offset_pos = f.tell()
        f.write(struct.pack("<I", 0))  # patched later

        prev_next_ptr = ifd_offset_pos
        for page in range(t):
            data = stack[page].tobytes()
            data_offset = f.tell()
            f.write(data)
            if f.tell() % 2:        # TIFF requires word-aligned offsets
                f.write(b"\x00")

            # BitsPerSample: inline for 1 sample, offset array for 3
            if c == 3:
                bps_array = struct.pack("<3H", bits, bits, bits)
                # layout: [data][bps_array][IFD]
                bps_offset = f.tell()
                f.write(bps_array)
                bps_value = bps_offset
                bps_count = 3
            else:
                bps_value = bits
                bps_count = 1

            ifd_offset = f.tell()
            entries = [
                _entry(256, 4, 1, w),                 # ImageWidth
                _entry(257, 4, 1, h),                 # ImageLength
                _entry(258, 3, bps_count, bps_value), # BitsPerSample
                _entry(259, 3, 1, 1),                 # Compression: none
                _entry(262, 3, 1, photometric),       # Photometric
                _entry(273, 4, 1, data_offset),       # StripOffsets
                _entry(277, 3, 1, c),                 # SamplesPerPixel
                _entry(278, 4, 1, h),                 # RowsPerStrip
                _entry(279, 4, 1, len(data)),         # StripByteCounts
                _entry(284, 3, 1, 1),                 # PlanarConfig: chunky
            ]
            # patch previous IFD's next-pointer to this IFD
            here = f.tell()
            f.seek(prev_next_ptr)
            f.write(struct.pack("<I", ifd_offset))
            f.seek(here)

            f.write(struct.pack("<H", len(entries)))
            for e in entries:
                f.write(e)
            prev_next_ptr = f.tell()
            f.write(struct.pack("<I", 0))  # next IFD (patched or terminal)


def read_multipage_tiff_pages(path: str) -> List[np.ndarray]:
    """Read pages back (cv2 handles most TIFFs; this exists mainly to verify
    our own writer round-trips)."""
    import cv2

    ok, pages = cv2.imreadmulti(path, flags=cv2.IMREAD_UNCHANGED)
    if not ok:
        raise IOError(f"cannot read {path}")
    # cv2 returns color pages channel-REVERSED (BGR); the writer stores
    # RGB per the TIFF spec — undo so the roundtrip is the identity
    return [p[..., ::-1] if p.ndim == 3 and p.shape[-1] == 3 else p
            for p in pages]
