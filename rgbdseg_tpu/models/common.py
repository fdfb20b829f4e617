"""Shared small building blocks for model modules."""

from __future__ import annotations

import flax.linen as nn


class ConvParams(nn.Module):
    """nn.Conv-compatible (kernel, bias) parameter container — same scope,
    param names, and initializers as nn.Conv — whose kernel is applied by a
    matmul formulation from ops.conv (conv2d_lowcin / conv2d_patchify) instead
    of a conv HLO. Used for convs reading tiny channel counts (RGB-D inputs,
    3-30 channels), which XLA:TPU would pad to the 128-lane tile (~43x wasted
    MXU work for a 7x7 C_in=3 conv; see ops/conv.py).

    The class only declares parameters; the caller picks the formulation.
    Checkpoint layout is identical to nn.Conv, so weights swap freely."""

    features: int
    kernel_size: tuple

    @nn.compact
    def __call__(self, cin: int):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel_size, cin, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias
