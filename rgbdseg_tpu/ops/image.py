"""Small image ops: grayscale conversion and min-max normalization.

Parity targets:
- Rec.601 grayscale with the reference's exact weights 0.299/0.587/0.114
  (reference: custom_model.py:392-502 and data_process.py:1019-1129). The
  reference applies this to both raw images and ImageNet-normalized depth
  tensors, so the op must be linear and dtype-preserving.
"""

from __future__ import annotations

import jax.numpy as jnp

REC601 = (0.299, 0.587, 0.114)


def to_grayscale(x: jnp.ndarray) -> jnp.ndarray:
    """Convert channels-last RGB (..., H, W, 3) or grayscale (..., H, W, 1)
    to single-channel (..., H, W)."""
    if x.shape[-1] == 1:
        return x[..., 0]
    if x.shape[-1] != 3:
        raise ValueError(f"expected 1 or 3 channels, got {x.shape[-1]}")
    w = jnp.asarray(REC601, dtype=x.dtype)
    return x @ w


def minmax_normalize(x: jnp.ndarray, lo: float = 0.0, hi: float = 255.0) -> jnp.ndarray:
    """cv2.normalize(NORM_MINMAX) parity: scale the array range to [lo, hi]."""
    mn = jnp.min(x)
    mx = jnp.max(x)
    scale = (hi - lo) / jnp.maximum(mx - mn, 1e-12)
    return (x - mn) * scale + lo
