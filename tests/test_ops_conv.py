"""Golden tests for ops.conv (im2col formulation of tiny-C_in convs)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from rgbdseg_tpu.ops.conv import conv2d_lowcin, merge_multiscale_kernels


def _ref_conv(x, kernel):
    dn = lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(x, kernel, (1, 1), "SAME", dimension_numbers=dn)


def test_conv2d_lowcin_matches_lax_conv():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 21, 33, 3), jnp.float32)
    for k in (1, 3, 5, 7):
        kernel = jnp.asarray(rng.randn(k, k, 3, 16) * 0.2, jnp.float32)
        np.testing.assert_allclose(
            np.asarray(conv2d_lowcin(x, kernel)),
            np.asarray(_ref_conv(x, kernel)),
            atol=1e-5,
            rtol=1e-5,
        )


def test_merged_multiscale_matches_separate_convs():
    """Zero-padded 3/5/7 kernels in ONE conv == three SAME convs, concatenated."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 17, 19, 3), jnp.float32)
    kernels = [jnp.asarray(rng.randn(k, k, 3, 8) * 0.2, jnp.float32) for k in (3, 5, 7)]
    merged = merge_multiscale_kernels(kernels)
    assert merged.shape == (7, 7, 3, 24)
    out = conv2d_lowcin(x, merged)
    ref = jnp.concatenate([_ref_conv(x, k) for k in kernels], axis=-1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_conv2d_lowcin_gradients():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 9, 11, 3), jnp.float32)
    kernel = jnp.asarray(rng.randn(3, 3, 3, 4) * 0.2, jnp.float32)

    g1 = jax.grad(lambda x, k: jnp.sum(conv2d_lowcin(x, k) ** 2), argnums=(0, 1))(x, kernel)
    g2 = jax.grad(lambda x, k: jnp.sum(_ref_conv(x, k) ** 2), argnums=(0, 1))(x, kernel)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_conv2d_patchify_matches_lax_conv():
    """Patch embed (stride == kernel, VALID) vs lax conv, incl. gradients —
    the formulation behind every Swin patch_embed (ADVICE r2 #2)."""
    from rgbdseg_tpu.ops.conv import conv2d_patchify

    rng = np.random.RandomState(3)
    for cin, patch in [(3, 4), (10, 4), (30, 2), (1, 7)]:
        h, w = 3 * patch, 5 * patch
        x = jnp.asarray(rng.randn(2, h, w, cin), jnp.float32)
        kernel = jnp.asarray(rng.randn(patch, patch, cin, 16) * 0.2, jnp.float32)
        bias = jnp.asarray(rng.randn(16) * 0.1, jnp.float32)

        dn = lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
        ref = lax.conv_general_dilated(
            x, kernel, (patch, patch), "VALID", dimension_numbers=dn
        ) + bias
        np.testing.assert_allclose(
            np.asarray(conv2d_patchify(x, kernel, bias)),
            np.asarray(ref),
            atol=1e-5,
            rtol=1e-5,
            err_msg=f"cin={cin} patch={patch}",
        )

    x = jnp.asarray(rng.randn(1, 8, 12, 3), jnp.float32)
    kernel = jnp.asarray(rng.randn(4, 4, 3, 8) * 0.2, jnp.float32)
    dn = lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
    g1 = jax.grad(lambda x, k: jnp.sum(conv2d_patchify(x, k) ** 2), argnums=(0, 1))(x, kernel)
    g2 = jax.grad(
        lambda x, k: jnp.sum(
            lax.conv_general_dilated(x, k, (4, 4), "VALID", dimension_numbers=dn) ** 2
        ),
        argnums=(0, 1),
    )(x, kernel)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)
