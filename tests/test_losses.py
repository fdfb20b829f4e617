"""Point-sampling custom VJP: forward + gradient exactness.

The criterion's per-mask point sampler (`ops.losses._sample_each_mask`) has a
hand-written backward (tent-matmul on the MXU, see its docstring) replacing
the serial scatter-add XLA emits for the gather VJP. These tests pin it to
the naive formulation: reshape each mask to its own (H, W, 1) map and autodiff
through `grid_sample_bilinear`. Coverage includes out-of-bounds points, whose
corner weights must land in the padding ring and vanish (torch grid_sample
zeros-padding semantics, HF modeling_mask2former.py:246-275).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rgbdseg_tpu.ops.losses import _sample_each_mask
from rgbdseg_tpu.ops.resize import grid_sample_bilinear


def _naive(masks, coords):
    b, n, h, w = masks.shape
    p = coords.shape[2]
    flat = masks.reshape(b * n, h, w, 1)
    out = grid_sample_bilinear(flat, coords.reshape(b * n, p, 2))
    return out.reshape(b, n, p)


def _inputs(seed=0, b=2, n=5, h=13, w=17, p=40, lo=-0.15, hi=1.15):
    rng = np.random.RandomState(seed)
    masks = jnp.asarray(rng.randn(b, n, h, w), jnp.float32)
    coords = jnp.asarray(rng.uniform(lo, hi, (b, n, p, 2)), jnp.float32)
    return masks, coords


@pytest.mark.parametrize("seed", range(3))
def test_forward_matches_naive(seed):
    masks, coords = _inputs(seed)
    got = _sample_each_mask(masks, coords)
    want = _naive(masks, coords)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_forward_in_bounds_only():
    masks, coords = _inputs(7, lo=0.0, hi=1.0)
    np.testing.assert_allclose(
        np.asarray(_sample_each_mask(masks, coords)),
        np.asarray(_naive(masks, coords)),
        atol=1e-5,
    )


@pytest.mark.parametrize("seed", range(3))
def test_mask_gradient_matches_autodiff(seed):
    masks, coords = _inputs(seed, h=9, w=11, p=25)
    cotangent = jnp.asarray(
        np.random.RandomState(seed + 100).randn(*(_naive(masks, coords).shape)),
        jnp.float32,
    )

    def loss_custom(m):
        return jnp.sum(_sample_each_mask(m, coords) * cotangent)

    def loss_naive(m):
        return jnp.sum(_naive(m, coords) * cotangent)

    g_custom = jax.grad(loss_custom)(masks)
    g_naive = jax.grad(loss_naive)(masks)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_naive), atol=1e-5)


def test_edge_points_gradient():
    """Points exactly on the border and just outside: tent weights must match
    the zeros-padding autodiff gradient (padding ring absorbs, then sliced)."""
    masks = jnp.asarray(np.random.RandomState(1).randn(1, 2, 6, 8), jnp.float32)
    edge = np.array(
        [
            [0.0, 0.0],
            [1.0, 1.0],
            [0.0, 1.0],
            [-0.05, 0.5],
            [0.5, 1.05],
            [1.0 / 16, 1.0 / 12],  # first cell center
        ],
        np.float32,
    )
    coords = jnp.asarray(np.tile(edge[None, None], (1, 2, 1, 1)))
    g_custom = jax.grad(lambda m: jnp.sum(_sample_each_mask(m, coords) ** 2))(masks)
    g_naive = jax.grad(lambda m: jnp.sum(_naive(m, coords) ** 2))(masks)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_naive), atol=1e-5)


def test_coords_gradient_is_zero_by_contract():
    """coords are declared non-differentiable (callers stop_gradient them);
    the VJP must return zeros, not garbage."""
    masks, coords = _inputs(3, p=10)
    g = jax.grad(lambda c: jnp.sum(_sample_each_mask(masks, c)))(coords)
    assert np.all(np.asarray(g) == 0.0)
