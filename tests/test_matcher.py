"""Hungarian matcher parity with scipy.optimize.linear_sum_assignment."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

import jax.numpy as jnp

from rgbdseg_tpu.ops.matcher import hungarian, hungarian_batch


@pytest.mark.parametrize("seed", range(10))
@pytest.mark.parametrize("shape", [(5, 5), (7, 20), (1, 9), (20, 100), (13, 13)])
def test_hungarian_matches_scipy_cost(seed, shape):
    rng = np.random.RandomState(seed)
    cost = rng.randn(*shape).astype(np.float32) * 10
    col4row = np.asarray(hungarian(jnp.asarray(cost)))
    # Valid assignment: distinct columns.
    assert len(set(col4row.tolist())) == shape[0]
    got = cost[np.arange(shape[0]), col4row].sum()
    ri, ci = linear_sum_assignment(cost)
    want = cost[ri, ci].sum()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_hungarian_with_uniform_padding_rows():
    rng = np.random.RandomState(0)
    real = rng.randn(4, 10).astype(np.float32)
    # Pad to 8 rows with a uniform constant: real-row assignment cost must match
    # the unpadded problem.
    pad = np.full((4, 10), 7.0, np.float32)
    cost = np.concatenate([real, pad], axis=0)
    col4row = np.asarray(hungarian(jnp.asarray(cost)))
    assert len(set(col4row.tolist())) == 8
    got_real = real[np.arange(4), col4row[:4]].sum()
    ri, ci = linear_sum_assignment(real)
    np.testing.assert_allclose(got_real, real[ri, ci].sum(), rtol=1e-5, atol=1e-4)


def test_hungarian_batch():
    rng = np.random.RandomState(3)
    cost = rng.randn(6, 8, 25).astype(np.float32)
    out = np.asarray(hungarian_batch(jnp.asarray(cost)))
    for b in range(6):
        ri, ci = linear_sum_assignment(cost[b])
        np.testing.assert_allclose(
            cost[b][np.arange(8), out[b]].sum(), cost[b][ri, ci].sum(), rtol=1e-5, atol=1e-4
        )
