"""Resize / sampling primitives with documented parity to the reference stack.

The reference relies on three different resampling semantics:
- torch ``F.interpolate(mode='bilinear', align_corners=False)`` (half-pixel
  centers, no antialias) — used inside DGGM and mask prediction
  (reference: custom_model.py:1070-1075, HF mask predictor).
- torch ``F.interpolate(mode='nearest')`` (asymmetric: src = floor(dst*scale)) —
  used for validity masks (reference: custom_model.py:1148-1153).
- torch ``F.grid_sample(align_corners=False, padding_mode='zeros')`` — used for
  point sampling in the losses and for deformable attention (HF
  modeling_mask2former.py:246-275, 799-838).
- torch ``adaptive_max_pool2d`` — used to downsample DSAM region masks
  (reference: custom_model.py:687).

We implement each explicitly as gather/weighted-sum formulations: static shapes,
fully batched, fused cleanly by XLA. Everything is NHWC.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _source_coords_half_pixel(out_size: int, in_size: int, dtype=jnp.float32):
    """Half-pixel-center source coordinates (torch bilinear align_corners=False)."""
    scale = in_size / out_size
    i = jnp.arange(out_size, dtype=dtype)
    return (i + 0.5) * scale - 0.5


def _linear_weights(out_size: int, in_size: int):
    """Return (lo_idx, hi_idx, hi_weight) for 1-D linear interpolation."""
    src = _source_coords_half_pixel(out_size, in_size)
    src = jnp.clip(src, 0.0, in_size - 1)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    w = src - lo.astype(src.dtype)
    return lo, hi, w


def resize_bilinear(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize, NHWC (or HWC / NHW), torch align_corners=False semantics."""
    out_h, out_w = size
    *lead, in_h, in_w, c = x.shape
    if (in_h, in_w) == (out_h, out_w):
        return x
    lo_y, hi_y, wy = _linear_weights(out_h, in_h)
    lo_x, hi_x, wx = _linear_weights(out_w, in_w)
    x = x.reshape((-1, in_h, in_w, c))
    # Interpolate rows then columns; XLA fuses the gathers.
    top = jnp.take(x, lo_y, axis=1)
    bot = jnp.take(x, hi_y, axis=1)
    wy = wy[None, :, None, None].astype(x.dtype)
    rows = top * (1 - wy) + bot * wy
    left = jnp.take(rows, lo_x, axis=2)
    right = jnp.take(rows, hi_x, axis=2)
    wx = wx[None, None, :, None].astype(x.dtype)
    out = left * (1 - wx) + right * wx
    return out.reshape((*lead, out_h, out_w, c))


def resize_nearest(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Nearest resize with torch ``mode='nearest'`` semantics: src = floor(dst*scale)."""
    out_h, out_w = size
    *lead, in_h, in_w, c = x.shape
    if (in_h, in_w) == (out_h, out_w):
        return x
    idx_y = jnp.minimum((jnp.arange(out_h) * (in_h / out_h)).astype(jnp.int32), in_h - 1)
    idx_x = jnp.minimum((jnp.arange(out_w) * (in_w / out_w)).astype(jnp.int32), in_w - 1)
    x = x.reshape((-1, in_h, in_w, c))
    out = jnp.take(jnp.take(x, idx_y, axis=1), idx_x, axis=2)
    return out.reshape((*lead, out_h, out_w, c))


def grid_sample_bilinear(x: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear point sampling, torch grid_sample(align_corners=False, zeros).

    Args:
      x: (B, H, W, C) feature map.
      coords: (B, P, 2) normalized coordinates in [0, 1] x [0, 1], ordered (x, y)
        like the reference's ``sample_point`` (HF modeling_mask2former.py:246-275,
        which maps them through ``2*p - 1`` into grid_sample).

    Returns:
      (B, P, C) sampled features; out-of-bounds contributions are zero.

    TPU formulation: the four bilinear corners are fetched with ONE
    `lax.gather` of a contiguous (2, 2, C) patch per point from a zero-padded
    map, with slice starts pre-clipped on the host side of the graph. A
    per-scalar `take_along_axis` formulation lowers to H*W*C scalar gathers
    and is ~20x slower on TPU; contiguous patch rows ride the gather fast
    path. The 1-pixel zero ring makes the +/-1-neighbor reads of borderline
    points produce exact zeros; far out-of-bounds corners are clipped into
    range and killed by the validity weights.
    """
    b, h, w, c = x.shape
    gx = coords[..., 0] * w - 0.5  # unnormalized: ((2p-1)+1)*W/2 - 0.5
    gy = coords[..., 1] * h - 0.5
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = (gx - x0).astype(x.dtype)[..., None]
    wy = (gy - y0).astype(x.dtype)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # corner validity BEFORE clipping (zeros-padding semantics)
    vx0 = (x0i >= 0) & (x0i < w)
    vx1 = (x0i + 1 >= 0) & (x0i + 1 < w)
    vy0 = (y0i >= 0) & (y0i < h)
    vy1 = (y0i + 1 >= 0) & (y0i + 1 < h)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # slice starts in the padded map; start+2 must stay within (h+2, w+2)
    ys = jnp.clip(y0i + 1, 0, h)
    xs = jnp.clip(x0i + 1, 0, w)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
    )

    def one(xmap, yi, xi):
        idx = jnp.stack([yi, xi], axis=-1)  # (P, 2)
        return jax.lax.gather(
            xmap,
            idx,
            dnums,
            slice_sizes=(2, 2, c),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )  # (P, 2, 2, C)

    patches = jax.vmap(one)(xp, ys, xs)  # (B, P, 2, 2, C)

    def msk(v):
        return v[..., None].astype(x.dtype)

    v00 = patches[:, :, 0, 0] * msk(vy0 & vx0)
    v01 = patches[:, :, 0, 1] * msk(vy0 & vx1)
    v10 = patches[:, :, 1, 0] * msk(vy1 & vx0)
    v11 = patches[:, :, 1, 1] * msk(vy1 & vx1)
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def _adaptive_ranges(in_size: int, out_size: int) -> tuple[np.ndarray, np.ndarray]:
    """torch adaptive pooling bin edges: start=floor(i*I/O), end=ceil((i+1)*I/O)."""
    i = np.arange(out_size)
    starts = (i * in_size) // out_size
    ends = -((-(i + 1) * in_size) // out_size)  # ceil division
    return starts, ends


def _adaptive_pool(x: jnp.ndarray, size: tuple[int, int], reduce_fn, identity) -> jnp.ndarray:
    """Shared implementation for adaptive max/avg pooling (torch semantics), NHWC."""
    out_h, out_w = size
    *lead, in_h, in_w, c = x.shape
    x = x.reshape((-1, in_h, in_w, c))
    if in_h % out_h == 0 and in_w % out_w == 0:
        kh, kw = in_h // out_h, in_w // out_w
        r = x.reshape(-1, out_h, kh, out_w, kw, c)
        out = reduce_fn(reduce_fn(r, axis=4), axis=2)
    else:
        ys, ye = _adaptive_ranges(in_h, out_h)
        xs, xe = _adaptive_ranges(in_w, out_w)
        max_kh = int((ye - ys).max())
        max_kw = int((xe - xs).max())
        # Build (out, k) index maps with masking; static shapes.
        yi = ys[:, None] + np.arange(max_kh)[None, :]
        ymask = yi < ye[:, None]
        yi = np.minimum(yi, in_h - 1)
        xi = xs[:, None] + np.arange(max_kw)[None, :]
        xmask = xi < xe[:, None]
        xi = np.minimum(xi, in_w - 1)
        rows = jnp.take(x, jnp.asarray(yi.reshape(-1)), axis=1).reshape(-1, out_h, max_kh, in_w, c)
        rows = jnp.where(jnp.asarray(ymask)[None, :, :, None, None], rows, identity)
        rows = reduce_fn(rows, axis=2)  # (B, out_h, in_w, C)
        cols = jnp.take(rows, jnp.asarray(xi.reshape(-1)), axis=2).reshape(-1, out_h, out_w, max_kw, c)
        cols = jnp.where(jnp.asarray(xmask)[None, None, :, :, None], cols, identity)
        out = reduce_fn(cols, axis=3)
        if reduce_fn is jnp.mean:
            # Correct the mean for masked lanes.
            ycount = jnp.asarray(ymask.sum(-1), dtype=x.dtype)
            xcount = jnp.asarray(xmask.sum(-1), dtype=x.dtype)
            out = out * (max_kh * max_kw) / (ycount[None, :, None, None] * xcount[None, None, :, None])
    return out.reshape((*lead, out_h, out_w, c))


def adaptive_max_pool2d(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """torch ``adaptive_max_pool2d`` parity (used for DSAM mask downsampling)."""
    return _adaptive_pool(x, size, jnp.max, -jnp.inf)


def adaptive_avg_pool2d(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """torch ``adaptive_avg_pool2d`` parity (used by ratio/intrinsics predictors)."""
    if size == (1, 1):
        return jnp.mean(x, axis=(-3, -2), keepdims=True)
    return _adaptive_pool(x, size, jnp.mean, 0.0)
