"""Surface normals from depth, batched JAX.

Parity target: ``calculate_surface_normals`` (reference: data_process.py:1308-1414)
with both methods:
- gradient approximation (no intrinsics): normals ∝ (-Gx, -Gy, 1), Sobel ksize=3;
- intrinsics method: back-project to 3-D points, np.gradient along u/v, cross
  product, normalize. np.gradient uses central differences in the interior and
  one-sided differences at the borders.

The reference computes normals per-sample on CPU inside the model forward for
version 0.0.7 (custom_model.py:165-197); here both paths are pure tensor ops so
they run on-device and vmap over the batch.
"""

from __future__ import annotations

import jax.numpy as jnp

from .sobel import sobel_xy


def _normalize(normals: jnp.ndarray, valid: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    mag = jnp.linalg.norm(normals, axis=-1, keepdims=True)
    mag = jnp.where(mag == 0, 1e-6, mag)
    unit = normals / mag
    invalid = ~valid | jnp.any(jnp.isnan(unit), axis=-1)
    unit = jnp.where(invalid[..., None], 0.0, unit)
    valid_mask = (jnp.linalg.norm(unit, axis=-1) > 1e-5).astype(jnp.float32)
    return unit, valid_mask


def surface_normals_gradient(
    depth: jnp.ndarray, invalid_depth_value: float = 0.0
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gradient-approximation normals. depth: (..., H, W) -> ((..., H, W, 3), (..., H, W))."""
    depth = depth.astype(jnp.float32)
    valid = (depth != invalid_depth_value) & (~jnp.isnan(depth))
    gx, gy = sobel_xy(depth)
    gx = jnp.where(valid, gx, 0.0)
    gy = jnp.where(valid, gy, 0.0)
    normals = jnp.stack([-gx, -gy, jnp.ones_like(gx)], axis=-1)
    return _normalize(normals, valid)


def _np_gradient(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """np.gradient parity: central differences, one-sided at borders."""
    x = jnp.moveaxis(x, axis, 0)
    interior = (x[2:] - x[:-2]) / 2.0
    first = (x[1] - x[0])[None]
    last = (x[-1] - x[-2])[None]
    out = jnp.concatenate([first, interior, last], axis=0)
    return jnp.moveaxis(out, 0, axis)


def surface_normals_intrinsics(
    depth: jnp.ndarray,
    fx: jnp.ndarray,
    fy: jnp.ndarray,
    cx: jnp.ndarray,
    cy: jnp.ndarray,
    invalid_depth_value: float = 0.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Intrinsics-based normals for a single (H, W) depth map (vmap for batches).

    fx/fy/cx/cy are scalars (possibly traced, e.g. from IntrinsicsPredictor).
    """
    depth = depth.astype(jnp.float32)
    h, w = depth.shape
    valid = (depth != invalid_depth_value) & (~jnp.isnan(depth))
    z = jnp.where(valid, depth, jnp.nan)
    v, u = jnp.mgrid[0:h, 0:w]
    x = (u - cx) * z / fx
    y = (v - cy) * z / fy
    points = jnp.stack([x, y, z], axis=-1)
    dp_du = _np_gradient(points, axis=1)
    dp_dv = _np_gradient(points, axis=0)
    normals = jnp.cross(dp_du, dp_dv)
    norm = jnp.linalg.norm(normals, axis=-1, keepdims=True)
    norm = jnp.where((norm == 0) | jnp.isnan(norm), 1e-6, norm)
    unit = normals / norm
    invalid = ~valid | jnp.any(jnp.isnan(unit), axis=-1)
    unit = jnp.where(invalid[..., None], 0.0, unit)
    valid_mask = (jnp.linalg.norm(unit, axis=-1) > 1e-5).astype(jnp.float32)
    return unit, valid_mask
