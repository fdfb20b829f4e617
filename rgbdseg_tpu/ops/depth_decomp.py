"""DSAM depth decomposition — vectorized, fixed-shape, on-device.

The reference's DSAModule decomposes each depth map into T+1 region masks via:
  1. 512-bin histogram over [nanmin, nanmax]   (custom_model.py:701-718)
  2. scipy.signal.find_peaks with prominence >= 0.01 * max(hist)   (:720-752)
  3. top-T peaks by (height desc, center desc); windows center ± center*ratio/2
     (:754-772)
  4. boolean region masks + remainder mask   (:774-798)
and runs it per-sample on CPU inside the forward — a device→host→device round
trip per sample per scale. Here the whole decomposition is a batched tensor
program: the histogram is a scatter-add, peak finding + prominences use O(N²)
masked reductions over the 512 bins (trivial on the VPU), and mask generation is
a broadcast compare. No host callbacks; `jax.vmap` over the batch.

Exact-parity notes:
- scipy local maxima handle plateaus by marking the plateau midpoint; we
  replicate via nearest-nonequal-neighbor indices and a scatter-max.
- scipy prominence: for peak p, left base = min(hist[L+1..p]) where L is the
  nearest index left of p with hist[L] > hist[p] (or the border); symmetric on
  the right; prominence = hist[p] - max(left_base, right_base).
- numpy histogram with degenerate range (min == max) expands it to ±0.5.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def depth_histogram(depth: jnp.ndarray, bins: int = 512) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """np.histogram parity over [nanmin, nanmax] for one (H, W) depth map.

    Returns (hist[bins], lo, width) where bin centers are lo + (i + 0.5) * width.
    NaNs are excluded from counts.
    """
    flat = depth.reshape(-1).astype(jnp.float32)
    finite = ~jnp.isnan(flat)
    lo = jnp.min(jnp.where(finite, flat, jnp.inf))
    hi = jnp.max(jnp.where(finite, flat, -jnp.inf))
    degenerate = hi <= lo
    lo = jnp.where(degenerate, lo - 0.5, lo)
    hi = jnp.where(degenerate, hi + 0.5, hi)
    width = (hi - lo) / bins
    idx = jnp.floor((flat - lo) / jnp.maximum(hi - lo, 1e-30) * bins).astype(jnp.int32)
    idx = jnp.clip(idx, 0, bins - 1)
    # NaNs land in bin 0 via the clip; park them one past the last bin so the
    # compare below drops them (cheaper than a second mask of the (N, bins)
    # one-hot).
    idx = jnp.where(finite, idx, bins)
    # Coarse x fine one-hot factorization: hist[c*F + f] counts pixels whose
    # bin splits as (coarse c, fine f), i.e. hist2d = onehot_coarse^T @
    # onehot_fine — a single (C, N) @ (N, F) matmul on the MXU. This replaces
    # N*bins VPU compares (measured 3.8 ms as a fused compare-reduce, 6.2 ms
    # as a scatter-add, for 307K pixels / 512 bins at 640x480) with
    # N*(C + F) compares (~10x fewer) plus a trivially small matmul.
    # One-hots are exact 0/1 in bf16; accumulation in f32 is exact for
    # counts < 2^24. NaNs carry idx == bins, whose coarse index C lies
    # outside [0, C): their onehot_coarse row is all zero, so they drop out.
    fine = 16
    while bins % fine:
        fine //= 2
    coarse = bins // fine
    oh_c = (idx[:, None] // fine == jnp.arange(coarse, dtype=jnp.int32)).astype(jnp.bfloat16)
    oh_f = (idx[:, None] % fine == jnp.arange(fine, dtype=jnp.int32)).astype(jnp.bfloat16)
    hist2d = jax.lax.dot_general(
        oh_c,
        oh_f,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    hist = hist2d.reshape(bins)
    return hist, lo, width


def local_maxima(hist: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """scipy _local_maxima_1d parity. Returns (is_peak[N] bool, left/right info unused).

    A plateau [l, r] with strictly lower non-equal neighbors on both sides marks
    one peak at (l + r) // 2. Border plateaus are not peaks.
    """
    n = hist.shape[0]
    i = jnp.arange(n)
    pair_ne = hist[None, :] != hist[:, None]  # [j, i] -> hist[j] != hist[i]
    jj = i[:, None]  # j index column

    left_mask = pair_ne & (jj < i[None, :])
    l_ne = jnp.max(jnp.where(left_mask, jj, -1), axis=0)  # nearest not-equal left
    right_mask = pair_ne & (jj > i[None, :])
    r_ne = jnp.min(jnp.where(right_mask, jj, n), axis=0)

    l_val = jnp.where(l_ne >= 0, hist[jnp.clip(l_ne, 0, n - 1)], jnp.inf)
    r_val = jnp.where(r_ne <= n - 1, hist[jnp.clip(r_ne, 0, n - 1)], jnp.inf)
    is_plateau_peak = (l_ne >= 0) & (r_ne <= n - 1) & (l_val < hist) & (r_val < hist)

    left_edge = l_ne + 1
    right_edge = r_ne - 1
    midpoint = (left_edge + right_edge) // 2
    is_peak = (
        jnp.zeros((n,), jnp.int32)
        .at[jnp.where(is_plateau_peak, midpoint, 0)]
        .max(is_plateau_peak.astype(jnp.int32))
    )
    return is_peak.astype(bool), midpoint


def peak_prominences(hist: jnp.ndarray, is_peak: jnp.ndarray) -> jnp.ndarray:
    """scipy peak_prominences parity (wlen=None), computed for every index."""
    n = hist.shape[0]
    i = jnp.arange(n)
    jj = i[:, None]
    higher = hist[None, :] < hist[:, None]  # [j, i] -> hist[j] > hist[i]

    l_bound = jnp.max(jnp.where(higher & (jj < i[None, :]), jj, -1), axis=0)
    r_bound = jnp.min(jnp.where(higher & (jj > i[None, :]), jj, n), axis=0)

    in_left = (jj > l_bound[None, :]) & (jj <= i[None, :])
    left_base = jnp.min(jnp.where(in_left, hist[:, None], jnp.inf), axis=0)
    in_right = (jj >= i[None, :]) & (jj < r_bound[None, :])
    right_base = jnp.min(jnp.where(in_right, hist[:, None], jnp.inf), axis=0)

    prom = hist - jnp.maximum(left_base, right_base)
    return jnp.where(is_peak, prom, -jnp.inf)


def select_modes(
    hist: jnp.ndarray,
    lo: jnp.ndarray,
    width: jnp.ndarray,
    num_modes: int = 3,
    prominence_frac: float = 0.01,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-`num_modes` peak centers by (height desc, center desc).

    Returns (centers[num_modes], valid[num_modes] bool). Matches the reference's
    `sorted(zip(peak_heights, peak_centers), reverse=True)[:num_modes]`
    (custom_model.py:743-750); numpy-histogram bin centers are
    edges[:-1] + diff(edges)/2 = lo + (i + 0.5) * width.
    """
    n = hist.shape[0]
    is_peak, _ = local_maxima(hist)
    prom = peak_prominences(hist, is_peak)
    threshold = prominence_frac * jnp.max(hist)
    selected = is_peak & (prom >= threshold)

    centers = lo + (jnp.arange(n, dtype=jnp.float32) + 0.5) * width
    heights = jnp.where(selected, hist, -jnp.inf)
    # Lexicographic (height desc, center desc): stable argsort by center desc,
    # then stable argsort by height desc.
    order1 = jnp.argsort(-centers, stable=True)
    order2 = jnp.argsort(-heights[order1], stable=True)
    order = order1[order2]
    top = order[:num_modes]
    top_valid = jnp.isfinite(heights[top])
    return centers[top], top_valid


def region_masks(
    depth: jnp.ndarray,
    centers: jnp.ndarray,
    valid: jnp.ndarray,
    ratio: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-shape encoding of the reference's *variable-length* mask list.

    The reference builds K window masks (K = number of found peaks, K <= T) plus
    one remainder mask, and DSAModule applies conv_i to mask i for
    i in 0..K (custom_model.py:683-691) — so the remainder is consumed by conv
    index K, and convs K+1..T are skipped entirely. When K == 0 it instead
    short-circuits to T+1 all-zero masks which all pass through their convs
    (bias-only contributions, custom_model.py:676-678).

    Returns (masks[(T+1), H, W] float32, active[(T+1)] float32):
      slot i < K: window mask i  (valid peaks sort first in select_modes)
      slot K:     remainder mask (when K >= 1)
      slot > K:   inactive (active=0) — contributes nothing, not even conv bias
      K == 0:     all slots zero masks, all active.

    Window t: [max(0, c - c*ratio/2), c + c*ratio/2] (custom_model.py:754-772).
    """
    t = centers.shape[0]
    half = centers * ratio / 2.0
    lows = jnp.maximum(0.0, centers - half)
    highs = centers + half
    d = depth[None, :, :]
    win = (d >= lows[:, None, None]) & (d <= highs[:, None, None])
    win = win & valid[:, None, None]
    remainder = ~jnp.any(win, axis=0)

    k = jnp.sum(valid.astype(jnp.int32))
    slots = jnp.arange(t + 1)
    win_full = jnp.concatenate([win, jnp.zeros((1,) + depth.shape, bool)], axis=0)
    masks = jnp.where(
        (slots < k)[:, None, None],
        win_full,
        jnp.where((slots == k)[:, None, None], remainder[None], False),
    )
    active = jnp.where(k == 0, jnp.ones((t + 1,), bool), slots <= k)
    masks = jnp.where(k == 0, jnp.zeros_like(masks), masks)
    return masks.astype(jnp.float32), active.astype(jnp.float32)


def region_masks_pooled(
    depth: jnp.ndarray,
    centers: jnp.ndarray,
    valid: jnp.ndarray,
    ratio: jnp.ndarray,
    out_size: tuple[int, int],
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """`region_masks` fused with its consumer's max-pool (VERDICT r2 #5's
    "fuse the DSAM region-mask compare into the pooled-feature consumer").

    The cascade only ever reads the region masks max-pooled to the feature
    resolutions, so the full-res (T+1, H, W) f32 masks never need to exist:
    the window compare reduces straight to (T+1, th, tw). Exactness vs
    pool(region_masks(...)): per-slot selection commutes with the spatial max
    because the slot conditions (slots < k / == k) are per-sample scalars, and
    the remainder pools as max(NOT any_window) == NOT all(any_window).
    Requires H % th == 0 and W % tw == 0 (callers fall back otherwise).
    """
    t = centers.shape[0]
    th, tw = out_size
    h, w = depth.shape
    fh, fw = h // th, w // tw
    half = centers * ratio / 2.0
    lows = jnp.maximum(0.0, centers - half)
    highs = centers + half
    d = depth[None, :, :]
    win = (d >= lows[:, None, None]) & (d <= highs[:, None, None])
    win = win & valid[:, None, None]
    anywin = jnp.any(win, axis=0)
    winp = jnp.any(win.reshape(t, th, fh, tw, fw), axis=(2, 4))
    remp = ~jnp.all(anywin.reshape(th, fh, tw, fw), axis=(1, 3))

    k = jnp.sum(valid.astype(jnp.int32))
    slots = jnp.arange(t + 1)
    win_full = jnp.concatenate([winp, jnp.zeros((1, th, tw), bool)], axis=0)
    masks = jnp.where(
        (slots < k)[:, None, None],
        win_full,
        jnp.where((slots == k)[:, None, None], remp[None], False),
    )
    active = jnp.where(k == 0, jnp.ones((t + 1,), bool), slots <= k)
    masks = jnp.where(k == 0, jnp.zeros_like(masks), masks)
    return masks.astype(jnp.float32), active.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("out_size", "num_modes", "bins", "prominence_frac"))
def dsam_region_masks_pooled(
    depth: jnp.ndarray,
    ratio: jnp.ndarray,
    out_size: tuple[int, int],
    num_modes: int = 3,
    bins: int = 512,
    prominence_frac: float = 0.01,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched fused decomposition: (B, H, W) depth + (B,) ratio ->
    (masks (B, th, tw, T+1) NHWC float32, active (B, T+1)). Equals
    `adaptive_max_pool2d(dsam_region_masks(...) as NHWC, out_size)` exactly
    (pinned by tests/test_ops_depth.py) without materializing the full-res
    masks."""

    def single(d, r):
        hist, lo, width = depth_histogram(d, bins)
        centers, valid = select_modes(hist, lo, width, num_modes, prominence_frac)
        m, a = region_masks_pooled(d, centers, valid, r, out_size)
        return m.transpose(1, 2, 0), a

    return jax.vmap(single)(depth, ratio)


@functools.partial(jax.jit, static_argnames=("num_modes", "bins", "prominence_frac"))
def dsam_region_masks(
    depth: jnp.ndarray,
    ratio: jnp.ndarray,
    num_modes: int = 3,
    bins: int = 512,
    prominence_frac: float = 0.01,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full decomposition for a batch.

    (B, H, W) depth + (B,) ratio -> (masks (B, T+1, H, W), active (B, T+1)).
    """

    def single(d, r):
        hist, lo, width = depth_histogram(d, bins)
        centers, valid = select_modes(hist, lo, width, num_modes, prominence_frac)
        return region_masks(d, centers, valid, r)

    return jax.vmap(single)(depth, ratio)
