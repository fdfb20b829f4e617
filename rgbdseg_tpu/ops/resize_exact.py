"""Bit-exact device twins of the host resizers (PIL BILINEAR, cv2 INTER_LINEAR).

The host channel builders (data/registry.py) resize with two different
libraries — `process_image` uses PIL BILINEAR (HF image-processor parity),
the gray-depth/gradient-mask paths use cv2 INTER_LINEAR (reference
dataloader.py quirk) — and both operate on uint8 in FIXED-POINT integer
arithmetic. Reproducing them exactly on device is what lets the raw-uint8
upload path (data/device_preprocess.py) accept frames at ARBITRARY camera
sizes instead of only target-sized inputs: ship 3-9 B/px of raw frames, do
grayscale → resize → Sobel on device in the reference's exact order, get
pixel-identical channels (VERDICT r4 #8; reference surface predictor.py:19-69).

Both twins compute per-output-pixel integer tap coefficients ON THE HOST in
numpy (shapes are static at trace time) and run the passes on device as int32
contractions — bit-exact because every intermediate fits int32:

- PIL BILINEAR (Pillow Resample.c, 8bpc): triangle filter whose support
  scales with the downscale factor (antialiased), coefficients
  round(w * 2^22) after normalization, horizontal pass FIRST with the
  intermediate CLIPPED TO uint8, then vertical; each pass rounds with
  (+2^21) >> 22. Max |acc| = 255 * 2^22 ≈ 2^30 < int32.
- cv2 INTER_LINEAR (OpenCV resize.cpp classic fixed-point uint8 path): 2-tap,
  fxx evaluated in FLOAT32 (not double — measured: the f64 formulation is
  off by one at ~0.1% of pixels), coefficients rint(fx * 2048) half-even,
  fractions NOT zeroed at borders (the duplicated clamped tap absorbs them),
  horizontal pass kept as raw int, vertical pass with OpenCV's staged uint8
  cast ((b*(v>>4))>>16 per tap, +2, >>2). Exactness over 36 size pairs
  (up/down/identity/extreme) is pinned in tests/test_resize_exact.py.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

_PIL_PREC = 22  # Pillow PRECISION_BITS = 32 - 8 - 2
_CV_BITS = 11  # OpenCV INTER_RESIZE_COEF_BITS


@lru_cache(maxsize=256)
def _pil_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) int32 coefficient matrix per Pillow precompute_coeffs +
    normalize_coeffs_8bpc (triangle filter, support scaled by the ratio)."""
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = filterscale  # bilinear filter support = 1.0
    K = np.zeros((out_size, in_size), np.int32)
    for xx in range(out_size):
        center = (xx + 0.5) * scale
        ss = 1.0 / filterscale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        k = np.array(
            [max(1.0 - abs((x - center + 0.5) * ss), 0.0) for x in range(xmin, xmax)]
        )
        s = k.sum()
        if s != 0:
            k /= s
        for i, v in enumerate(k):
            K[xx, xmin + i] = int(v * (1 << _PIL_PREC) + (0.5 if v >= 0 else -0.5))
    return K


def _pil_pass(x: jnp.ndarray, K: np.ndarray, axis: int) -> jnp.ndarray:
    """One Pillow resample pass along `axis`; x int32 in [0,255], returns
    int32 in [0,255] (the 8bpc path clips each pass back to uint8 range)."""
    t = jnp.moveaxis(x, axis, 0)
    flat = t.reshape(t.shape[0], -1)
    acc = jnp.asarray(K, jnp.int32) @ flat
    acc = (acc + (1 << (_PIL_PREC - 1))) >> _PIL_PREC
    acc = jnp.clip(acc, 0, 255)
    return jnp.moveaxis(acc.reshape((K.shape[0],) + t.shape[1:]), 0, axis)


def _spatial_axes(img: jnp.ndarray, has_channels) -> tuple[int, int]:
    """Locate (H, W) axes in a channels-last uint8 array. `has_channels=None`
    infers: 2-D never has channels; 3-D has them iff the minor dim looks like
    a channel count (<= 4) — AMBIGUOUS for tiny images, so internal callers
    pass the flag explicitly ((B, H, W) grayscale vs (H, W, C)); 4-D+ always
    (B..., H, W, C)."""
    if has_channels is None:
        has_channels = img.ndim >= 4 or (img.ndim == 3 and img.shape[-1] <= 4)
    ax_h = img.ndim - (3 if has_channels else 2)
    return ax_h, ax_h + 1


def pil_resize_u8(
    img_u8: jnp.ndarray, out_hw: tuple[int, int], has_channels: bool | None = None
) -> jnp.ndarray:
    """PIL ``Image.resize(..., BILINEAR)`` parity for uint8 images on device.

    img_u8: channels-last. Pass `has_channels` explicitly for 3-D arrays
    whose layout is ambiguous ((B, H, W) stacks vs (H, W, C) images).
    """
    h, w = out_hw
    ax_h, ax_w = _spatial_axes(img_u8, has_channels)
    x = img_u8.astype(jnp.int32)
    if img_u8.shape[ax_w] != w:  # horizontal first (Pillow order; measured exact)
        x = _pil_pass(x, _pil_matrix(img_u8.shape[ax_w], w), ax_w)
    if img_u8.shape[ax_h] != h:
        x = _pil_pass(x, _pil_matrix(img_u8.shape[ax_h], h), ax_h)
    return x.astype(jnp.uint8)


@lru_cache(maxsize=256)
def _cv_taps(in_size: int, out_size: int):
    """(s0, s1, a, b) int32 arrays per OpenCV's classic uint8 fixed-point
    INTER_LINEAR: fxx in float32, coefficients rint(fx*2048) half-even,
    fractions unzeroed at borders, tap indices replicate-clamped."""
    scale = in_size / out_size
    s0 = np.zeros(out_size, np.int32)
    s1 = np.zeros(out_size, np.int32)
    a = np.zeros(out_size, np.int32)
    b = np.zeros(out_size, np.int32)
    one, sc = np.float32(1.0), np.float32(1 << _CV_BITS)
    for x in range(out_size):
        fxx = np.float32((x + 0.5) * scale - 0.5)
        sx = int(math.floor(fxx))
        fx = np.float32(fxx - np.float32(sx))
        a[x] = int(np.rint(np.float32((one - fx) * sc)))
        b[x] = int(np.rint(np.float32(fx * sc)))
        s0[x] = min(max(sx, 0), in_size - 1)
        s1[x] = min(max(sx + 1, 0), in_size - 1)
    return s0, s1, a, b


def cv2_resize_linear_u8(
    img_u8: jnp.ndarray, out_hw: tuple[int, int], has_channels: bool | None = None
) -> jnp.ndarray:
    """cv2.resize(..., INTER_LINEAR) parity for uint8 on device.

    img_u8: (H, W), (H, W, C), or batched (B, H, W[, C]) channels-last; pass
    `has_channels` explicitly for ambiguous 3-D layouts (see pil_resize_u8).
    """
    h, w = out_hw
    ax_h, ax_w = _spatial_axes(img_u8, has_channels)
    hs0, hs1, ha, hb = _cv_taps(img_u8.shape[ax_w], w)
    vs0, vs1, va, vb = _cv_taps(img_u8.shape[ax_h], h)
    x = img_u8.astype(jnp.int32)

    def take(arr, idx, axis):
        return jnp.take(arr, jnp.asarray(idx), axis=axis)

    csh = [1] * x.ndim
    csh[ax_w] = w
    ha_, hb_ = (jnp.asarray(v, jnp.int32).reshape(csh) for v in (ha, hb))
    t = ha_ * take(x, hs0, ax_w) + hb_ * take(x, hs1, ax_w)  # raw int, exact
    rsh = [1] * x.ndim
    rsh[ax_h] = h
    va_, vb_ = (jnp.asarray(v, jnp.int32).reshape(rsh) for v in (va, vb))
    # OpenCV's uint8 vertical cast: per-tap (b * (v >> 4)) >> 16, then +2 >> 2
    out = ((va_ * (take(t, vs0, ax_h) >> 4)) >> 16) + (
        (vb_ * (take(t, vs1, ax_h) >> 4)) >> 16
    )
    return jnp.clip((out + 2) >> 2, 0, 255).astype(jnp.uint8)
