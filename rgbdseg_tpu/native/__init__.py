"""Native (C) accelerators, loaded via ctypes.

Build is lazy and cached: the first import compiles rle.c with cc -O2 into the
package directory; failures degrade silently to the numpy fallbacks in
rgbdseg_tpu.inference.rle.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "_rle_native.so")
_SRC = os.path.join(_HERE, "rle.c")


def _build() -> str | None:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cc = os.environ.get("CC", "cc")
    try:
        subprocess.run(
            [cc, "-O2", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _SO
    except Exception:
        return None


class _RleNative:
    def __init__(self, lib):
        self.lib = lib
        lib.rle_from_mask.restype = ctypes.c_long
        lib.rle_to_mask.restype = ctypes.c_int
        lib.rle_encode_string.restype = ctypes.c_long
        lib.rle_decode_string.restype = ctypes.c_long
        lib.rle_iou.restype = ctypes.c_double

    def counts_from_mask(self, mask_fortran_flat: np.ndarray) -> np.ndarray:
        m = np.ascontiguousarray(mask_fortran_flat, np.uint8)
        counts = np.empty(m.size + 1, np.int64)
        nc = self.lib.rle_from_mask(
            m.ctypes.data_as(ctypes.c_void_p),
            ctypes.c_long(m.size),
            counts.ctypes.data_as(ctypes.c_void_p),
        )
        return counts[:nc].copy()

    def encode(self, counts: np.ndarray) -> str:
        counts = np.ascontiguousarray(counts, np.int64)
        out = ctypes.create_string_buffer(7 * max(len(counts), 1) + 1)
        n = self.lib.rle_encode_string(
            counts.ctypes.data_as(ctypes.c_void_p), ctypes.c_long(len(counts)), out
        )
        return out.raw[:n].decode("ascii")

    def decode(self, s: str) -> np.ndarray:
        raw = s.encode("ascii")
        counts = np.empty(max(len(raw), 1), np.int64)
        nc = self.lib.rle_decode_string(
            ctypes.c_char_p(raw), ctypes.c_long(len(raw)), counts.ctypes.data_as(ctypes.c_void_p)
        )
        return counts[:nc].copy()

    def iou_counts(self, ca: np.ndarray, cb: np.ndarray) -> float:
        ca = np.ascontiguousarray(ca, np.int64)
        cb = np.ascontiguousarray(cb, np.int64)
        return float(
            self.lib.rle_iou(
                ca.ctypes.data_as(ctypes.c_void_p),
                ctypes.c_long(len(ca)),
                cb.ctypes.data_as(ctypes.c_void_p),
                ctypes.c_long(len(cb)),
            )
        )


rle_native = None
_path = _build()
if _path:
    try:
        rle_native = _RleNative(ctypes.CDLL(_path))
    except OSError:
        rle_native = None
