"""Core tensor ops (pure JAX/XLA; Pallas kernels live in rgbdseg_tpu.ops.pallas).

All image-shaped ops use NHWC layout.
"""
