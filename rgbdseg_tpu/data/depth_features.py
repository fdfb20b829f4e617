"""Host-side depth feature extraction (cv2/numpy), used by the input pipeline.

These mirror the reference's dataset.map-time functions exactly (same cv2 calls):
- compute_depth_gradient          (reference: data_process.py:1132-1169)
- calculate_gradient_features     (reference: data_process.py:1247-1305)
- calculate_surface_normals       (reference: data_process.py:1308-1414, both
  the intrinsics and the gradient-approximation paths)
- to_grayscale                    (reference: data_process.py:1019-1129)

The on-device (JAX) equivalents live in rgbdseg_tpu.ops.{sobel,normals,image};
these host versions exist because the input pipeline runs on CPU alongside
decode, exactly where the reference runs them.
"""

from __future__ import annotations

import cv2
import numpy as np


def to_grayscale(image: np.ndarray) -> np.ndarray:
    """(H, W, 3) or (H, W) -> (H, W), Rec.601 weights 0.299/0.587/0.114."""
    if image.ndim == 2:
        return image
    if image.shape[-1] == 1:
        return image[..., 0]
    return (0.299 * image[..., 0] + 0.587 * image[..., 1] + 0.114 * image[..., 2]).astype(image.dtype)


def compute_depth_gradient(depth: np.ndarray) -> np.ndarray:
    """Raw Sobel ksize=3 gradient magnitude (float64)."""
    d = depth.astype(np.float32)
    gx = cv2.Sobel(d, cv2.CV_64F, 1, 0, ksize=3)
    gy = cv2.Sobel(d, cv2.CV_64F, 0, 1, ksize=3)
    return np.sqrt(gx**2 + gy**2)


def calculate_gradient_features(depth: np.ndarray, invalid_depth_value: float = 0.0):
    """(normalized_magnitude, grad_x, grad_y, valid_gradient_mask), float32."""
    d = depth.astype(np.float32)
    valid = (d != invalid_depth_value) & (~np.isnan(d))
    gx = cv2.Sobel(d, cv2.CV_32F, 1, 0, ksize=3)
    gy = cv2.Sobel(d, cv2.CV_32F, 0, 1, ksize=3)
    mag = np.sqrt(gx**2 + gy**2)
    gx[~valid] = 0
    gy[~valid] = 0
    mag[~valid] = 0
    gmask = (mag > 0).astype(np.float32)
    vm = mag[gmask > 0]
    if vm.size > 0:
        mn, mx = np.min(vm), np.max(mag)
        norm = (mag - mn) / (mx - mn) if mx > mn else np.zeros_like(mag)
    else:
        norm = np.zeros_like(mag)
    return norm.astype(np.float32), gx, gy, gmask


def calculate_surface_normals(
    depth: np.ndarray, camera_intrinsics: dict | None = None, invalid_depth_value: float = 0.0
):
    """(unit_normals (H, W, 3) float32 in [-1, 1], valid_mask (H, W) float32)."""
    d = depth.astype(np.float32)
    h, w = d.shape
    valid = (d != invalid_depth_value) & (~np.isnan(d))

    if camera_intrinsics is not None:
        fx, fy = camera_intrinsics["fx"], camera_intrinsics["fy"]
        cx, cy = camera_intrinsics["cx"], camera_intrinsics["cy"]
        v, u = np.indices((h, w))
        z = d.copy()
        z[~valid] = np.nan
        x = (u - cx) * z / fx
        y = (v - cy) * z / fy
        pts = np.stack([x, y, z], axis=-1)
        dp_du = np.gradient(pts, axis=1)
        dp_dv = np.gradient(pts, axis=0)
        normals = np.cross(dp_du.reshape(-1, 3), dp_dv.reshape(-1, 3)).reshape(h, w, 3)
    else:
        gx = cv2.Sobel(d, cv2.CV_32F, 1, 0, ksize=3)
        gy = cv2.Sobel(d, cv2.CV_32F, 0, 1, ksize=3)
        gx[~valid] = 0
        gy[~valid] = 0
        normals = np.stack([-gx, -gy, np.ones_like(gx)], axis=-1)

    norm = np.linalg.norm(normals, axis=-1, keepdims=True)
    norm[norm == 0] = 1e-6
    norm[np.isnan(norm)] = 1e-6
    unit = normals / norm
    invalid = ~valid | np.isnan(unit).any(axis=-1)
    unit[invalid] = 0
    valid_mask = (np.linalg.norm(unit, axis=-1) > 1e-5).astype(np.float32)
    return unit.astype(np.float32), valid_mask
