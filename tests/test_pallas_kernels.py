"""Golden tests for the Pallas TPU kernels (ops/kernels/*).

Each kernel runs in interpreter mode on CPU and is checked against its jnp
twin — the same function the model uses on non-TPU backends — so the compiled
TPU path and the tested path share one implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from rgbdseg_tpu.ops.kernels import deformable, masked_attention


def _tent_inputs(bh=2, l=300, npts=4, h=17, w=23, hd=32, seed=0):
    rng = np.random.RandomState(seed)
    # pixel-space sampling coords: cover in-bounds, edge, and out-of-bounds
    gx = jnp.asarray(rng.uniform(-2.0, w + 2.0, (bh, l, npts)), jnp.float32)
    gy = jnp.asarray(rng.uniform(-2.0, h + 2.0, (bh, l, npts)), jnp.float32)
    aw = jax.nn.softmax(jnp.asarray(rng.randn(bh, l, npts), jnp.float32), axis=-1)
    v = jnp.asarray(rng.randn(bh, h * w, hd), jnp.float32)
    return gx, gy, aw, v


class TestTentSampleKernel:
    def test_matches_xla_twin(self):
        gx, gy, aw, v = _tent_inputs()
        h, w = 17, 23
        ref = deformable.tent_sample_level_xla(gx, gy, aw, v, h, w)
        out = deformable.tent_sample_level(gx, gy, aw, v, h, w, True)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)

    def test_matches_grid_sample(self):
        """The tent contraction equals true bilinear sampling with zeros padding."""
        from rgbdseg_tpu.ops.resize import grid_sample_bilinear

        bh, l, npts, h, w, hd = 2, 64, 4, 17, 23, 32
        gx, gy, aw, v = _tent_inputs(bh, l, npts, h, w, hd)
        out = deformable.tent_sample_level(gx, gy, aw, v, h, w, True)

        # normalized coords for grid_sample: gx = x * w - 0.5  =>  x = (gx + .5)/w
        coords = jnp.stack([(gx + 0.5) / w, (gy + 0.5) / h], axis=-1)
        sampled = grid_sample_bilinear(
            v.reshape(bh, h, w, hd), coords.reshape(bh, l * npts, 2)
        ).reshape(bh, l, npts, hd)
        ref = jnp.einsum("blp,blpd->bld", aw, sampled)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)

    def test_separable_matches_xla_twin(self):
        """tent_sample_level_xla_separable (the default path) is the same
        contraction as the fused-P twin with x contracted first — identical to
        f32 rounding, including out-of-bounds points."""
        gx, gy, aw, v = _tent_inputs()
        h, w = 17, 23
        ref = deformable.tent_sample_level_xla(gx, gy, aw, v, h, w)
        out = deformable.tent_sample_level_xla_separable(gx, gy, aw, v, h, w)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)

    def test_large_level_padding(self):
        """Non-multiple L and h*w exercise both padding paths."""
        gx, gy, aw, v = _tent_inputs(l=1337, h=30, w=40)
        ref = deformable.tent_sample_level_xla(gx, gy, aw, v, 30, 40)
        out = deformable.tent_sample_level(gx, gy, aw, v, 30, 40, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)

    def test_bf16_values(self):
        gx, gy, aw, v = _tent_inputs()
        h, w = 17, 23
        ref = deformable.tent_sample_level_xla(gx, gy, aw, v.astype(jnp.bfloat16), h, w)
        out = deformable.tent_sample_level(gx, gy, aw, v.astype(jnp.bfloat16), h, w, True)
        assert out.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2, rtol=2e-2)

    def test_gradients_match_twin(self):
        gx, gy, aw, v = _tent_inputs(bh=1, l=40, h=9, w=11)
        h, w = 9, 11

        def loss_kernel(gx, gy, aw, v):
            return jnp.sum(deformable.tent_sample_level(gx, gy, aw, v, h, w, True) ** 2)

        def loss_ref(gx, gy, aw, v):
            return jnp.sum(deformable.tent_sample_level_xla(gx, gy, aw, v, h, w) ** 2)

        g_k = jax.grad(loss_kernel, argnums=(0, 1, 2, 3))(gx, gy, aw, v)
        g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(gx, gy, aw, v)
        for a, b in zip(g_k, g_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def _mca_inputs(b=2, h=4, nq=100, nk=300, hd=32, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(b, h, nq, hd), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, nk, hd), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, nk, hd), jnp.float32)
    m = jnp.asarray(rng.randn(b, nq, nk), jnp.float32)
    # a couple of fully-blocked queries to exercise the all_blocked path
    m = m.at[:, :3].set(-jnp.abs(m[:, :3]) - 0.1)
    ab = jnp.all(m < 0.0, axis=-1)
    return q, k, v, m, ab


class TestMaskedCrossAttentionKernel:
    def test_matches_xla_twin(self):
        q, k, v, m, ab = _mca_inputs()
        assert bool(np.asarray(ab).any())  # all_blocked path is exercised
        ref = masked_attention.masked_cross_attention_xla(q, k, v, m, ab)
        out = masked_attention.masked_cross_attention(q, k, v, m, ab, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)

    def test_k_tiling(self):
        """nk > block via multiple K tiles exercises the online-softmax path."""
        q, k, v, m, ab = _mca_inputs(nk=1500)
        ref = masked_attention.masked_cross_attention_xla(q, k, v, m, ab)
        out = masked_attention._mca_pallas(q, k, v, m, ab, block_k=512, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)

    def test_gradients_match_twin(self):
        q, k, v, m, ab = _mca_inputs(b=1, h=2, nq=16, nk=64)

        def loss_kernel(q, k, v):
            return jnp.sum(masked_attention.masked_cross_attention(q, k, v, m, ab, True) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(masked_attention.masked_cross_attention_xla(q, k, v, m, ab) ** 2)

        g_k = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
        g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g_k, g_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


class TestTentBandKernel:
    def test_matches_xla_twin(self):
        from rgbdseg_tpu.ops.kernels.deformable import tent_sample_level_band

        gx, gy, aw, v = _tent_inputs()
        h, w = 17, 23
        ref = deformable.tent_sample_level_xla(gx, gy, aw, v, h, w)
        out = tent_sample_level_band(gx, gy, aw, v, h, w, True)
        assert out.shape == ref.shape
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)

    def test_matches_xla_twin_model_shape(self):
        """The real 640x480 level-0 geometry (60x80 cells, raster-ordered
        local queries) — the regime the band skip is designed for."""
        from rgbdseg_tpu.ops.kernels.deformable import tent_sample_level_band

        bh, npts, h, w, hd = 2, 4, 60, 80, 32
        l = h * w
        rng = np.random.RandomState(3)
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        base_x = xx.reshape(-1)[None, :, None] + rng.uniform(-3, 3, (bh, l, npts))
        base_y = yy.reshape(-1)[None, :, None] + rng.uniform(-3, 3, (bh, l, npts))
        gx = jnp.asarray(base_x, jnp.float32)
        gy = jnp.asarray(base_y, jnp.float32)
        aw = jax.nn.softmax(jnp.asarray(rng.randn(bh, l, npts), jnp.float32), axis=-1)
        v = jnp.asarray(rng.randn(bh, h * w, hd), jnp.float32)
        ref = deformable.tent_sample_level_xla(gx, gy, aw, v, h, w)
        out = tent_sample_level_band(gx, gy, aw, v, h, w, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)

    def test_gradients_match_twin(self):
        from rgbdseg_tpu.ops.kernels.deformable import tent_sample_level_band

        gx, gy, aw, v = _tent_inputs(l=140, h=9, w=11)
        h, w = 9, 11

        def f_band(gx, gy, aw, v):
            return jnp.sum(tent_sample_level_band(gx, gy, aw, v, h, w, True) ** 2)

        def f_ref(gx, gy, aw, v):
            return jnp.sum(deformable.tent_sample_level_xla(gx, gy, aw, v, h, w) ** 2)

        g_band = jax.grad(f_band, argnums=(0, 1, 2, 3))(gx, gy, aw, v)
        g_ref = jax.grad(f_ref, argnums=(0, 1, 2, 3))(gx, gy, aw, v)
        for a, b in zip(g_band, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)
