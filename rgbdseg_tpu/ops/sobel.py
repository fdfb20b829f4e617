"""Depth gradient features (Sobel), batched and XLA-friendly.

Parity targets (reference: mask2former/utils/data_process.py):
- ``compute_depth_gradient`` (:1132-1169): Sobel ksize=3 Gx/Gy -> magnitude.
- ``calculate_gradient_features`` (:1247-1305): invalid-depth masking, validity
  mask (magnitude > 0), min-max normalization over valid magnitudes.

cv2.Sobel uses BORDER_REFLECT_101 boundary handling, which equals jnp.pad
mode='reflect'. The separable kernels for ksize=3 are smooth=[1,2,1] and
diff=[-1,0,1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _conv1d(x: jnp.ndarray, k, axis: int) -> jnp.ndarray:
    """Correlate (..., H, W) along `axis` (-1 or -2) with a 3-tap kernel,
    reflect-101 border."""
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 1)
    xp = jnp.pad(x, pad, mode="reflect")
    n = x.shape[axis]

    def take(off):
        return jax.lax.slice_in_dim(xp, off, off + n, axis=axis)

    return k[0] * take(0) + k[1] * take(1) + k[2] * take(2)


def sobel_xy(depth: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sobel Gx, Gy of (..., H, W) depth, cv2 ksize=3 parity."""
    depth = depth.astype(jnp.float32)
    smooth = jnp.asarray([1.0, 2.0, 1.0])
    diff = jnp.asarray([-1.0, 0.0, 1.0])
    gx = _conv1d(_conv1d(depth, smooth, axis=-2), diff, axis=-1)
    gy = _conv1d(_conv1d(depth, diff, axis=-2), smooth, axis=-1)
    return gx, gy


def depth_gradient_magnitude(depth: jnp.ndarray) -> jnp.ndarray:
    """``compute_depth_gradient`` parity: raw (unnormalized) Sobel magnitude."""
    gx, gy = sobel_xy(depth)
    return jnp.sqrt(gx**2 + gy**2)


def gradient_features(
    depth: jnp.ndarray, invalid_depth_value: float = 0.0
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """``calculate_gradient_features`` parity, batched over leading dims.

    Returns (normalized_magnitude, grad_x, grad_y, valid_gradient_mask), all
    shaped like `depth` (float32). The normalization rescales magnitude by
    (mag - min_valid) / (max_all - min_valid), computed per image over the
    trailing two axes, matching data_process.py:1285-1296.
    """
    depth = depth.astype(jnp.float32)
    valid = (depth != invalid_depth_value) & (~jnp.isnan(depth))
    gx, gy = sobel_xy(depth)
    mag = jnp.sqrt(gx**2 + gy**2)
    gx = jnp.where(valid, gx, 0.0)
    gy = jnp.where(valid, gy, 0.0)
    mag = jnp.where(valid, mag, 0.0)
    grad_valid = mag > 0

    axes = (-2, -1)
    has_valid = jnp.any(grad_valid, axis=axes, keepdims=True)
    min_val = jnp.min(jnp.where(grad_valid, mag, jnp.inf), axis=axes, keepdims=True)
    min_val = jnp.where(has_valid, min_val, 0.0)
    max_val = jnp.max(mag, axis=axes, keepdims=True)
    denom = max_val - min_val
    normalized = jnp.where(
        has_valid & (denom > 0), (mag - min_val) / jnp.maximum(denom, 1e-30), 0.0
    )
    return normalized, gx, gy, grad_valid.astype(jnp.float32)
