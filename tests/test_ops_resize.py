"""Golden tests for resize/sampling ops against torch semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from rgbdseg_tpu.ops import resize as R


def _rand(*shape):
    rng = np.random.RandomState(0)
    return rng.randn(*shape).astype(np.float32)


@pytest.mark.parametrize("in_hw,out_hw", [((16, 16), (7, 9)), ((8, 8), (32, 32)), ((15, 11), (15, 11)), ((9, 13), (4, 4))])
def test_resize_bilinear_matches_torch(in_hw, out_hw):
    x = _rand(2, *in_hw, 3)
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw, mode="bilinear", align_corners=False)
    ref = ref.permute(0, 2, 3, 1).numpy()
    out = np.asarray(R.resize_bilinear(jnp.asarray(x), out_hw))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((16, 16), (7, 9)), ((8, 8), (32, 32)), ((9, 13), (4, 4))])
def test_resize_nearest_matches_torch(in_hw, out_hw):
    x = _rand(2, *in_hw, 1)
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw, mode="nearest")
    ref = ref.permute(0, 2, 3, 1).numpy()
    out = np.asarray(R.resize_nearest(jnp.asarray(x), out_hw))
    np.testing.assert_array_equal(out, ref)


def test_grid_sample_matches_torch():
    x = _rand(3, 12, 10, 4)
    rng = np.random.RandomState(1)
    coords = rng.uniform(-0.2, 1.2, size=(3, 77, 2)).astype(np.float32)  # incl. out of bounds
    ref = F.grid_sample(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        2.0 * torch.from_numpy(coords).unsqueeze(2) - 1.0,
        mode="bilinear",
        padding_mode="zeros",
        align_corners=False,
    ).squeeze(3).permute(0, 2, 1).numpy()
    out = np.asarray(R.grid_sample_bilinear(jnp.asarray(x), jnp.asarray(coords)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((64, 64), (16, 16)), ((17, 23), (5, 7)), ((9, 9), (4, 4))])
def test_adaptive_max_pool(in_hw, out_hw):
    x = _rand(2, *in_hw, 3)
    ref = F.adaptive_max_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), out_hw).permute(0, 2, 3, 1).numpy()
    out = np.asarray(R.adaptive_max_pool2d(jnp.asarray(x), out_hw))
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("in_hw,out_hw", [((64, 64), (1, 1)), ((17, 23), (5, 7)), ((8, 8), (4, 4))])
def test_adaptive_avg_pool(in_hw, out_hw):
    x = _rand(2, *in_hw, 3)
    ref = F.adaptive_avg_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), out_hw).permute(0, 2, 3, 1).numpy()
    out = np.asarray(R.adaptive_avg_pool2d(jnp.asarray(x), out_hw))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
