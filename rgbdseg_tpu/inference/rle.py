"""COCO run-length encoding, pycocotools-compatible.

The reference depends on pycocotools' C RLE codec for prediction/GT JSON export
and comparison visualization (reference: predictor.py:376-457 encode,
:974-1065 decode). This module implements the same format:
- binary mask -> Fortran-order alternating run counts starting with zeros
- compressed string form using pycocotools' base-32 delta varint charset

A C fast path (rgbdseg_tpu.native.rle) is used when built; the numpy fallback
is always available.
"""

from __future__ import annotations

import numpy as np

try:  # optional native accelerator
    from ..native import rle_native as _native
except Exception:  # pragma: no cover
    _native = None


def mask_to_counts(mask: np.ndarray) -> np.ndarray:
    """(H, W) bool/0-1 -> run counts (Fortran order, starting with 0-run)."""
    flat = np.asfortranarray(mask.astype(np.uint8)).reshape(-1, order="F")
    if flat.size == 0:
        return np.zeros((0,), np.int64)
    change = np.nonzero(np.diff(flat))[0] + 1
    boundaries = np.concatenate([[0], change, [flat.size]])
    counts = np.diff(boundaries).astype(np.int64)
    if flat[0] == 1:  # must start with a zero-run
        counts = np.concatenate([[0], counts])
    return counts


def counts_to_mask(counts, size_hw) -> np.ndarray:
    h, w = size_hw
    counts = np.asarray(counts, np.int64)
    vals = np.zeros(len(counts), np.uint8)
    vals[1::2] = 1
    flat = np.repeat(vals, counts)
    if flat.size != h * w:
        raise ValueError(f"RLE size mismatch: {flat.size} != {h * w}")
    return flat.reshape((h, w), order="F")


def encode_counts_string(counts: np.ndarray) -> str:
    """pycocotools rleToString parity (signed base-32 varint with delta)."""
    if _native is not None:
        return _native.encode(np.asarray(counts, np.int64))
    out = []
    cnts = [int(c) for c in counts]
    for i, x in enumerate(cnts):
        if i > 2:
            x -= cnts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            out.append(chr(c + 48))
    return "".join(out)


def decode_counts_string(s: str) -> np.ndarray:
    if _native is not None:
        return _native.decode(s)
    cnts: list[int] = []
    i = 0
    n = len(s)
    while i < n:
        x = 0
        k = 0
        more = True
        while more:
            c = ord(s[i]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(cnts) > 2:
            x += cnts[-2]
        cnts.append(x)
    return np.asarray(cnts, np.int64)


def encode(mask: np.ndarray) -> dict:
    """binary (H, W) -> {"size": [H, W], "counts": str} (compressed RLE)."""
    h, w = mask.shape
    return {"size": [int(h), int(w)], "counts": encode_counts_string(mask_to_counts(mask))}


def decode(rle: dict) -> np.ndarray:
    counts = rle["counts"]
    if isinstance(counts, str):
        counts = decode_counts_string(counts)
    elif isinstance(counts, bytes):
        counts = decode_counts_string(counts.decode("utf-8"))
    return counts_to_mask(counts, rle["size"])


def area(rle: dict) -> int:
    counts = rle["counts"]
    if isinstance(counts, (str, bytes)):
        counts = decode_counts_string(counts if isinstance(counts, str) else counts.decode())
    return int(np.sum(counts[1::2]))


def mask_iou(a: dict, b: dict) -> float:
    ma, mb = decode(a).astype(bool), decode(b).astype(bool)
    inter = np.logical_and(ma, mb).sum()
    union = np.logical_or(ma, mb).sum()
    return float(inter) / float(union) if union else 0.0
