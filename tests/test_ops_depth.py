"""Golden tests for depth feature ops against cv2/scipy/numpy reference semantics."""

import cv2
import numpy as np
import pytest
from scipy.signal import find_peaks

import jax.numpy as jnp

from rgbdseg_tpu.ops import depth_decomp as D
from rgbdseg_tpu.ops import sobel as S
from rgbdseg_tpu.ops import normals as N
from rgbdseg_tpu.ops import csf as C
from rgbdseg_tpu.ops.image import to_grayscale


def test_sobel_matches_cv2():
    rng = np.random.RandomState(0)
    d = rng.uniform(0, 100, size=(37, 53)).astype(np.float32)
    gx_ref = cv2.Sobel(d, cv2.CV_64F, 1, 0, ksize=3)
    gy_ref = cv2.Sobel(d, cv2.CV_64F, 0, 1, ksize=3)
    gx, gy = S.sobel_xy(jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(gx), gx_ref, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gy), gy_ref, rtol=1e-4, atol=1e-3)


def _gradient_features_np(depth_np, invalid=0.0):
    """Direct transcription of the reference semantics (data_process.py:1247-1305)."""
    depth_np = depth_np.astype(np.float32)
    valid = (depth_np != invalid) & (~np.isnan(depth_np))
    gx = cv2.Sobel(depth_np, cv2.CV_32F, 1, 0, ksize=3)
    gy = cv2.Sobel(depth_np, cv2.CV_32F, 0, 1, ksize=3)
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
    return norm, gx, gy, gmask


def test_gradient_features_parity():
    rng = np.random.RandomState(1)
    d = rng.uniform(0, 255, size=(40, 40)).astype(np.float32)
    d[5:10, 5:10] = 0.0  # invalid region
    ref = _gradient_features_np(d)
    out = S.gradient_features(jnp.asarray(d))
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), r, rtol=1e-4, atol=1e-4)


def test_surface_normals_gradient_parity():
    rng = np.random.RandomState(2)
    d = rng.uniform(0, 50, size=(24, 30)).astype(np.float32)
    d[0:4, 0:4] = 0.0
    gx = cv2.Sobel(d, cv2.CV_32F, 1, 0, ksize=3)
    gy = cv2.Sobel(d, cv2.CV_32F, 0, 1, ksize=3)
    valid = d != 0.0
    gx[~valid] = 0
    gy[~valid] = 0
    normals = np.stack([-gx, -gy, np.ones_like(gx)], -1)
    mag = np.linalg.norm(normals, axis=-1, keepdims=True)
    mag[mag == 0] = 1e-6
    unit = normals / mag
    unit[~valid] = 0
    vm_ref = (np.linalg.norm(unit, axis=-1) > 1e-5).astype(np.float32)
    out_n, out_m = N.surface_normals_gradient(jnp.asarray(d))
    np.testing.assert_allclose(np.asarray(out_n), unit, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(out_m), vm_ref)


def test_surface_normals_intrinsics_runs():
    rng = np.random.RandomState(3)
    d = rng.uniform(1, 50, size=(16, 20)).astype(np.float32)
    n, m = N.surface_normals_intrinsics(jnp.asarray(d), 100.0, 100.0, 10.0, 8.0)
    assert n.shape == (16, 20, 3)
    norms = np.linalg.norm(np.asarray(n), axis=-1)
    assert np.all((norms < 1.01) & ((norms > 0.99) | (np.asarray(m) == 0)))


@pytest.mark.parametrize("seed", range(6))
def test_local_maxima_and_prominence_match_scipy(seed):
    rng = np.random.RandomState(seed)
    # Integer-valued histograms (like np.histogram counts) to exercise plateaus.
    hist = rng.poisson(5, size=512).astype(np.float32)
    is_peak, _ = D.local_maxima(jnp.asarray(hist))
    prom = D.peak_prominences(jnp.asarray(hist), is_peak)
    for frac in (0.01, 0.3):
        thresh = frac * hist.max()
        ref_peaks, _ = find_peaks(hist, prominence=thresh)
        got = np.where(np.asarray(is_peak) & (np.asarray(prom) >= thresh))[0]
        np.testing.assert_array_equal(got, ref_peaks)


def _reference_dsam_masks(depth, ratio, num_modes=3):
    """Direct transcription of DSAModule decomposition (custom_model.py:659-798)."""
    vr = (np.nanmin(depth), np.nanmax(depth))
    hist, edges = np.histogram(depth.flatten(), bins=512, range=vr)
    peaks, _ = find_peaks(hist, prominence=0.01 * np.max(hist))
    if not peaks.size:
        return [np.zeros_like(depth, dtype=bool)] * (num_modes + 1)
    heights = hist[peaks]
    centers = edges[:-1][peaks] + np.diff(edges)[peaks] / 2.0
    selected = [c for _, c in sorted(zip(heights, centers), reverse=True)[:num_modes]]
    masks, combined = [], np.zeros_like(depth, dtype=bool)
    for c in selected:
        half = c * ratio / 2.0
        m = (depth >= max(0, c - half)) & (depth <= c + half)
        masks.append(m)
        combined |= m
    masks.append(~combined)
    return masks


def _check_against_reference(d, ratio):
    """Compare slot-encoded fixed-shape masks against the reference's
    variable-length list: reference mask i maps to slot i, slots past the
    reference list length must be inactive."""
    ref = _reference_dsam_masks(d, ratio)
    masks, active = D.dsam_region_masks(jnp.asarray(d)[None], jnp.asarray([ratio]))
    masks = np.asarray(masks)[0]
    active = np.asarray(active)[0]
    assert masks.shape[0] == 4
    for i in range(4):
        if i < len(ref):
            assert active[i] == 1.0, f"slot {i} should be active"
            np.testing.assert_array_equal(masks[i].astype(bool), ref[i], err_msg=f"mask {i}")
        else:
            assert active[i] == 0.0, f"slot {i} should be inactive"
            assert masks[i].sum() == 0.0


@pytest.mark.parametrize("seed", range(4))
def test_dsam_region_masks_parity(seed):
    rng = np.random.RandomState(seed)
    # Multi-modal depth with NaNs, like exp6_dsam.py's synthetic test.
    d = np.concatenate(
        [
            rng.normal(10, 1, size=400),
            rng.normal(30, 2, size=500),
            rng.normal(60, 1.5, size=300),
            rng.uniform(0, 80, size=336),
        ]
    ).astype(np.float32)
    rng.shuffle(d)
    d = d.reshape(32, 48)
    d[0, :5] = np.nan
    _check_against_reference(d, 0.1)


def test_dsam_degenerate_inputs_match_reference():
    # Constant depth: numpy histogram expands the range to ±0.5, producing one
    # spike which IS a peak -> K=1 -> window mask + remainder in slots 0/1,
    # slots 2/3 inactive. Two-valued depth -> K=2.
    _check_against_reference(np.full((8, 8), 5.0, dtype=np.float32), 0.1)
    two = np.full((8, 8), 5.0, dtype=np.float32)
    two[::2] = 40.0
    _check_against_reference(two, 0.1)


def _reference_csf(images):
    """Direct transcription of cosine_similarity_fuse_v3 (data_process.py:817-919)."""
    n = len(images)
    rounds, scores = [], {i: 0 for i in range(n)}
    for k in range(n):
        compared = [i for i in range(n) if i != k]
        sims = []
        for j in compared:
            a = images[k].astype(np.float64)
            b = images[j].astype(np.float64)
            dot = np.sum(a * b, -1)
            na = np.linalg.norm(a, axis=-1)
            nb = np.linalg.norm(b, axis=-1)
            s = np.zeros_like(dot)
            mask = (na * nb) != 0
            s[mask] = dot[mask] / (na[mask] * nb[mask])
            s[(na == 0) & (nb == 0)] = 1.0
            sims.append(s)
        bk = np.zeros_like(images[0], dtype=np.float32)
        counts = {i: 0 for i in compared}
        h, w = images[0].shape[:2]
        for y in range(h):
            for x in range(w):
                best_s, best_i = -np.inf, -1
                for i, s in enumerate(sims):
                    if s[y, x] > best_s:
                        best_s, best_i = s[y, x], compared[i]
                bk[y, x] = images[best_i][y, x]
                counts[best_i] += 1
        rounds.append(bk)
        ci, cc = -1, -1
        for i, c in counts.items():
            if c > cc:
                cc, ci = c, i
        scores[ci] += cc
    total = sum(scores.values())
    weights = [1.0 / n] * n if total == 0 else [scores[i] / total for i in range(n)]
    fused = np.zeros_like(images[0], dtype=np.float32)
    for i in range(n):
        fused += weights[i] * rounds[i]
    return fused.astype(images[0].dtype)


def test_csf_parity():
    rng = np.random.RandomState(0)
    images = [rng.randint(0, 255, size=(9, 11, 3)).astype(np.float32) for _ in range(4)]
    images[0][2:4, 2:4] = 0.0  # zero-vector pixels
    ref = _reference_csf(images)
    out = np.asarray(C.csf_fuse(jnp.asarray(np.stack(images))))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-3)


def test_grayscale():
    rng = np.random.RandomState(0)
    x = rng.rand(5, 7, 3).astype(np.float32)
    ref = 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
    np.testing.assert_allclose(np.asarray(to_grayscale(jnp.asarray(x))), ref, rtol=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_dsam_region_masks_pooled_equals_pool_of_full(seed):
    """The fused compare+pool path (dsam_region_masks_pooled) must equal
    max-pooling the full-res masks — including NaN holes, degenerate
    constant depth (K=0..T corner coverage comes from the random modes)."""
    from rgbdseg_tpu.ops.resize import adaptive_max_pool2d

    rng = np.random.RandomState(seed)
    d = np.concatenate(
        [
            rng.normal(10, 1, size=500),
            rng.normal(40, 2, size=600),
            rng.uniform(0, 80, size=436),
        ]
    ).astype(np.float32)
    rng.shuffle(d)
    d = d.reshape(2, 24, 32)
    d[0, 0, :7] = np.nan
    ratio = jnp.asarray([0.1, 0.35], jnp.float32)
    depth = jnp.asarray(d)

    full, active_full = D.dsam_region_masks(depth, ratio)
    pooled, active_p = D.dsam_region_masks_pooled(depth, ratio, (6, 8))
    expected = adaptive_max_pool2d(jnp.transpose(full, (0, 2, 3, 1)), (6, 8))
    np.testing.assert_array_equal(np.asarray(pooled), np.asarray(expected))
    np.testing.assert_array_equal(np.asarray(active_p), np.asarray(active_full))


def test_dsam_region_masks_pooled_constant_depth():
    depth = jnp.full((1, 16, 16), 5.0, jnp.float32)
    from rgbdseg_tpu.ops.resize import adaptive_max_pool2d

    full, af = D.dsam_region_masks(depth, jnp.asarray([0.2], jnp.float32))
    pooled, ap = D.dsam_region_masks_pooled(depth, jnp.asarray([0.2], jnp.float32), (4, 4))
    expected = adaptive_max_pool2d(jnp.transpose(full, (0, 2, 3, 1)), (4, 4))
    np.testing.assert_array_equal(np.asarray(pooled), np.asarray(expected))
    np.testing.assert_array_equal(np.asarray(ap), np.asarray(af))
