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


def conv2d_patchify(x: jnp.ndarray, kernel: jnp.ndarray, bias=None) -> jnp.ndarray:
    """Non-overlapping patch conv (stride == kernel size, VALID) as
    space-to-depth + one matmul — the Swin/ViT patch embedding.

    A (ph, pw, C_in, C_out) conv with small C_in (RGB-D stacks: 3-30 channels)
    otherwise lowers with the channel dim padded to the native 128-lane tile
    (measured: the 4x4x10->96 patch embed at 480x640 showed as a 0.94 ms
    convert_reduce_fusion in the frame profile). With stride == kernel there is
    no tap overlap, so im2col is a pure reshape/transpose: (B, H, W, C) ->
    (B, H/ph, W/pw, ph*pw*C) @ (ph*pw*C, C_out). Exactly equivalent to
    ``lax.conv_general_dilated(x, kernel, (ph, pw), 'VALID')``.

    x's spatial dims must already be multiples of (ph, pw) (callers pad first).
    """
    b, h, w, cin = x.shape
    ph, pw, kcin, cout = kernel.shape
    assert kcin == cin and h % ph == 0 and w % pw == 0, (kernel.shape, x.shape)
    hp, wp = h // ph, w // pw
    patches = x.reshape(b, hp, ph, wp, pw, cin).transpose(0, 1, 3, 2, 4, 5)
    patches = patches.reshape(b * hp * wp, ph * pw * cin)
    wmat = kernel.reshape(ph * pw * cin, cout).astype(x.dtype)
    y = patches @ wmat
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.reshape(b, hp, wp, cout)


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
