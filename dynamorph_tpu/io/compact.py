"""Compact (float32 .npz) artifact storage — the opt-in fast path around the
reference pickle contract.

The reference pipeline serialises every intermediate as a float64 pickle
(``stacks_<t>.pkl`` dicts at extract_patches.py:270-272,
``<well>_static_patches.pkl`` arrays and ``*_latent_space{,_after}.pkl`` at
pipeline/patch_VAE.py:166, :454-462). Those stay the default here for
byte-compatibility, but they are ~2x larger than the information content
(every value in them originates as float32 or uint16) and pickle
deserialization of float64 blobs is the measured bottleneck of the
production end-to-end encode path (BASELINE.md "End-to-end encode
throughput"). ``storage: compact`` in the ``patch`` / ``latent_encoding``
config sections switches the bulk artifacts to uncompressed float32 ``.npz``
sidecars (zip-stored members -> near-memcpy reads via numpy, no pickle
bytecode walk), halving bytes on disk and in flight.

Losslessness: patch pixel values are produced on-device as float32 and masks
are {0, 1}, so ``float64(pickle) == float64(float32(compact))`` EXACTLY for
stacks (pinned by tests/test_compact_storage.py). Assembled
``static_patches`` arrays pass through a float64 cv2 resize in the pickle
path, so their compact form rounds to float32 (relative ~1e-8); latents are
float32 natively in both formats.

Two container layouts, distinguished by member names:

- stack: ``keys`` (N unicode patch names), ``mat`` + ``masked_mat``
  (N, C, Z, H, W) float32 — the ``stacks_<t>.pkl`` dict flattened.
- array: ``data`` — a single ndarray (static patches, latents, PCA vectors).

``load_*_any`` helpers accept either extension and prefer whichever file
exists (``.npz`` wins when both do and ``prefer="npz"``), so every
downstream reader works with mixed trees; ``convert_storage`` (also a CLI,
cli/convert_storage.py) rewrites artifacts between the two formats in both
directions.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

from .pickles import load_pickle, save_pickle

STACK_MEMBERS = ("keys", "mat", "masked_mat")

# resolve_any mtime tie window (seconds): differences at or below this are
# treated as "same age" — copied/extracted trees often land both siblings
# within the same second (or identical) even when their contents differ.
_MTIME_TIE_S = 2.0


def npz_path(path: str) -> str:
    """`foo.pkl` / `foo` -> `foo.npz`."""
    base, ext = os.path.splitext(path)
    return (base if ext in (".pkl", ".npz") else path) + ".npz"


def pkl_path(path: str) -> str:
    base, ext = os.path.splitext(path)
    return (base if ext in (".pkl", ".npz") else path) + ".pkl"


def storage_path(path: str, storage: str) -> str:
    """Rewrite an artifact path's extension for the selected storage."""
    if storage == "compact":
        return npz_path(path)
    if storage == "pickle":
        return pkl_path(path)
    raise ValueError(f"unknown storage {storage!r} "
                     "(expected 'pickle' or 'compact')")


def resolve_any(path: str, prefer: str = "existing") -> str:
    """Return the on-disk sibling of ``path`` (.pkl or .npz).

    prefer="existing": whichever extension exists; when BOTH exist the most
    recently modified wins (with a warning) — a re-run under a different
    ``storage`` setting rewrites only its own extension, so freshness, not
    the caller's habitual extension, decides which artifact is current.
    mtimes are unreliable across copied/extracted/synced trees (``cp``
    without ``-p``, archive unpack flatten them to the copy time), so when
    the two mtimes are within ``_MTIME_TIE_S`` of each other the explicitly
    requested extension wins instead — a copied tree degrades to the
    caller's choice rather than an arbitrary one.
    prefer="npz"/"pkl": that extension when it exists.
    """
    cands = [path, npz_path(path) if not path.endswith(".npz")
             else pkl_path(path)]
    if prefer == "npz":
        cands.sort(key=lambda p: not p.endswith(".npz"))
    elif prefer == "pkl":
        cands.sort(key=lambda p: not p.endswith(".pkl"))
    elif all(os.path.exists(c) for c in cands):
        mtimes = [os.path.getmtime(c) for c in cands]
        if abs(mtimes[0] - mtimes[1]) <= _MTIME_TIE_S:
            return cands[0]  # tie (copied/synced tree): requested ext wins
        newest = cands[int(mtimes[1] > mtimes[0])]
        if newest != cands[0]:
            import logging

            logging.getLogger(__name__).warning(
                "%s is older than its sibling %s — loading the newer file "
                "(mixed-storage tree; delete the stale artifact or convert "
                "with cli.convert_storage to silence this)",
                cands[0], newest)
        return newest
    for c in cands:
        if os.path.exists(c):
            return c
    return path


# ---------------------------------------------------------------- stacks


def save_stack_compact(site_data: Dict[str, dict], path: str) -> None:
    """Write a ``stacks_<t>`` dict as a float32 .npz (uncompressed).

    All patches in one frame share a shape by construction
    (pipeline/patch.py::assemble_site_data); enforced here so the container
    stays a dense stack.
    """
    path = npz_path(path)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    keys = sorted(site_data.keys())
    if keys:
        mat = np.stack([np.asarray(site_data[k]["mat"]) for k in keys]
                       ).astype(np.float32)
        masked = np.stack(
            [np.asarray(site_data[k]["masked_mat"]) for k in keys]
        ).astype(np.float32)
    else:
        mat = np.zeros((0,), np.float32)
        masked = np.zeros((0,), np.float32)
    np.savez(path, keys=np.asarray(keys, dtype=np.str_), mat=mat,
             masked_mat=masked)


def load_stack_compact(path: str) -> Dict[str, dict]:
    """Read a compact stack back into the reference dict layout.

    Arrays come back float32; cast to float64 is exact for patch data (see
    module docstring) and is left to the caller that needs it.
    """
    with np.load(path, allow_pickle=False) as z:
        keys = [str(k) for k in z["keys"]]
        mat, masked = z["mat"], z["masked_mat"]
    return {k: {"mat": mat[i], "masked_mat": masked[i]}
            for i, k in enumerate(keys)}


def save_stack(site_data: Dict[str, dict], path: str,
               storage: str = "pickle") -> None:
    if storage == "compact":
        save_stack_compact(site_data, path)
    else:
        save_pickle(site_data, pkl_path(path))


def load_stack_any(path: str) -> Dict[str, dict]:
    path = resolve_any(path)
    if path.endswith(".npz"):
        return load_stack_compact(path)
    return load_pickle(path)


# ---------------------------------------------------------------- arrays


def save_array_compact(arr: np.ndarray, path: str,
                       dtype=np.float32) -> None:
    """Write one ndarray as an uncompressed .npz (member ``data``)."""
    path = npz_path(path)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arr = np.asarray(arr)
    if dtype is not None and arr.dtype.kind == "f":
        arr = arr.astype(dtype, copy=False)
    np.savez(path, data=arr)


def load_array_compact(path: str) -> np.ndarray:
    with np.load(path, allow_pickle=False) as z:
        return z["data"]


def save_array(arr: np.ndarray, path: str, storage: str = "pickle") -> None:
    if storage == "compact":
        save_array_compact(arr, path)
    else:
        save_pickle(arr, pkl_path(path))


def load_array_any(path: str, prefer: str = "existing") -> np.ndarray:
    """Load an ndarray artifact named by either extension."""
    path = resolve_any(path, prefer=prefer)
    if path.endswith(".npz"):
        return load_array_compact(path)
    return load_pickle(path)


# ------------------------------------------------------------- converter


def _is_stack_dict(obj: Any) -> bool:
    return isinstance(obj, dict) and all(
        isinstance(v, dict) and "mat" in v and "masked_mat" in v
        for v in obj.values())


def convert_storage(src: str, to: str,
                    out: Optional[str] = None) -> str:
    """Convert one artifact between pickle and compact storage.

    ``to``: "compact" or "pickle". Detects the stack-dict vs plain-array
    layout from the content. Returns the output path.
    """
    if to == "compact":
        if not src.endswith(".pkl"):
            raise ValueError(f"expected a .pkl source, got {src}")
        obj = load_pickle(src)
        dst = out or npz_path(src)
        if _is_stack_dict(obj):
            save_stack_compact(obj, dst)
        elif isinstance(obj, np.ndarray):
            # record the pickle dtype so --to pickle restores the DTYPE
            # contract (float64 static_patches, float32 latents). Values
            # round through float32: exact for f32-origin data (on-device
            # patches, latents), LOSSY for genuine float64 content (e.g.
            # static_patches after cv2's float64 resize) — warn so users
            # converting real f64 artifacts know the round trip truncates.
            dstp = npz_path(dst)
            os.makedirs(os.path.dirname(os.path.abspath(dstp)),
                        exist_ok=True)
            if obj.dtype.kind == "f":
                arr = obj.astype(np.float32, copy=False)
                # equal_nan: NaN entries round-trip exactly through f32 —
                # without it any NaN would raise the warning on a lossless
                # conversion
                if obj.dtype.itemsize > 4 and not np.array_equal(
                        arr.astype(obj.dtype), obj, equal_nan=True):
                    import logging

                    logging.getLogger(__name__).warning(
                        "%s: float%d values are not exactly representable "
                        "as float32 — the compact form (and any pickle "
                        "converted back from it) rounds them",
                        src, obj.dtype.itemsize * 8)
            else:
                arr = np.asarray(obj)
            np.savez(dstp, data=arr,
                     pkl_dtype=np.asarray(str(obj.dtype)))
            dst = dstp
        else:
            raise ValueError(
                f"{src}: unsupported pickle content {type(obj).__name__} — "
                "only stack dicts and ndarrays have a compact form")
        return dst
    if to == "pickle":
        if not src.endswith(".npz"):
            raise ValueError(f"expected a .npz source, got {src}")
        dst = out or pkl_path(src)
        with np.load(src, allow_pickle=False) as z:
            members = set(z.files)
        if members == set(STACK_MEMBERS):
            data = load_stack_compact(src)
            # reference stacks are float64 (extract_patches.py:262-264);
            # exact for f32-origin patch values
            data = {k: {kk: np.asarray(vv, dtype=np.float64)
                        for kk, vv in v.items()}
                    for k, v in data.items()}
            save_pickle(data, dst)
        elif members in ({"data"}, {"data", "pkl_dtype"}):
            with np.load(src, allow_pickle=False) as z:
                arr = np.asarray(z["data"])
                if "pkl_dtype" in members:
                    # converter-written: restore the recorded pickle dtype
                    arr = arr.astype(np.dtype(str(z["pkl_dtype"])))
                elif (arr.dtype.kind == "f"
                      and "static_patches" in os.path.basename(src)
                      and "mask" not in os.path.basename(src)):
                    # pipeline-written compact static_patches: the reference
                    # pickle contract is float64 (pipeline/patch_VAE.py:166);
                    # latents and masks stay their native dtype
                    arr = arr.astype(np.float64)
            save_pickle(arr, dst)
        else:
            raise ValueError(f"{src}: unrecognized npz members {members}")
        return dst
    raise ValueError(f"unknown target storage {to!r}")
