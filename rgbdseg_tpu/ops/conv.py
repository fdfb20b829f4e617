"""Stride-1 SAME convolution for tiny input-channel counts, as im2col matmul.

XLA:TPU lowers a conv whose input has C_in=3 by padding the channel dim to the
native 128-lane tile, so a 7x7 C_in=3 conv does ~43x redundant MXU work —
measured 6.4 ms for the E-DSAM predictor's three multi-scale convs at 640x480
(~1.5 TFLOP/s effective). This formulation never materializes a small-channel
conv: the k*k*C_in patch vector is built from k*k shifted slices of the padded
input (pure data movement that XLA fuses into the consumer), and the whole
conv is one (H*W, k*k*C_in) @ (k*k*C_in, C_out) matmul on the MXU.

Used by EnhancedDepthImageRatioPredictor (reference custom_model.py:1363-1487)
and DepthImageRatioPredictor (:1272-1360) whose conv stacks start from a
3-channel depth image.
"""

from __future__ import annotations

import jax.numpy as jnp


def conv2d_lowcin(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """SAME, stride-1 2-D convolution via shifted-slice im2col + one matmul.

    x: (B, H, W, C_in) with small C_in; kernel: (kh, kw, C_in, C_out) HWIO.
    Returns (B, H, W, C_out) in x.dtype. Exactly equivalent to
    ``lax.conv_general_dilated(x, kernel, (1, 1), 'SAME')`` (zeros padding).
    """
    b, h, w, cin = x.shape
    kh, kw, kcin, cout = kernel.shape
    assert kcin == cin, (kcin, cin)
    ph, pw = kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    # Patch features ordered (dy, dx, c) to match HWIO kernel flattening.
    cols = [
        xp[:, dy : dy + h, dx : dx + w, :]
        for dy in range(kh)
        for dx in range(kw)
    ]
    patches = jnp.concatenate(cols, axis=-1)  # (B, H, W, kh*kw*cin)
    wmat = kernel.reshape(kh * kw * cin, cout).astype(x.dtype)
    return (patches.reshape(b * h * w, -1) @ wmat).reshape(b, h, w, cout)


def merge_multiscale_kernels(kernels: list[jnp.ndarray]) -> jnp.ndarray:
    """Zero-pad per-scale HWIO kernels (e.g. 3x3/5x5/7x7) to the largest size
    and concatenate along C_out, so N parallel SAME convs over the same input
    become ONE conv. SAME padding makes the zero-padded taps exact no-ops."""
    kmax = max(k.shape[0] for k in kernels)
    padded = []
    for k in kernels:
        d = (kmax - k.shape[0]) // 2
        padded.append(jnp.pad(k, ((d, d), (d, d), (0, 0), (0, 0))))
    return jnp.concatenate(padded, axis=-1)
