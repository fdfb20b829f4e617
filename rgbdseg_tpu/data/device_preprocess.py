"""On-device channel building from raw uint8 frames (TPU-side preprocessing).

The host pipeline (data/registry.py) ships fully-built float32 channel stacks
to the device — 40 bytes/pixel for the 0.4.0 10-channel layout. Over a thin
host→device link that transfer dominates end-to-end latency (measured on this
infra: ~37 MB/s H2D, so a (4, 480, 640, 10) bf16 batch costs ~665 ms of
upload — PERF.md "batch sweep RESTATED"). This module moves the channel
building into the XLA program: the host ships raw uint8 RGB + uint8 depth
(6 bytes/pixel, 6.7x less) and the normalize / grayscale / Sobel-gradient /
validity-mask work runs on device, where it is trivially cheap.

Exact parity with the host builders (same-size inputs; resizing stays on the
host where PIL semantics live):
- ImageNet normalize == data/preprocess.py::normalize_image (f32 math).
- Grayscale == PIL Image.convert("L")'s fixed-point Rec.601:
  (R*19595 + G*38470 + B*7471 + 0x8000) >> 16 — integer-exact.
- Gradient features == ops/sobel.py::gradient_features, itself golden-pinned
  against the reference's cv2 path (tests/test_ops_depth.py).

Supported layouts (versions registry): 3-channel (0.0.0), 6-channel
(0.1.x), and the flagship 10-channel case2 (0.4.0). Callers fall back to the
host builders for the other layouts (gated by `supported(version)`).

Reference provenance: the host twins implement dataloader.py:23-49 (3ch),
:53-84 (6ch), :386-425 (10ch case2) of the reference.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import PreprocessConfig
from ..ops.sobel import gradient_features

_SUPPORTED_MAPS = {"map_3channel", "map_6channel", "map_10channel_case2"}


def supported(map_fn_name: str) -> bool:
    return map_fn_name in _SUPPORTED_MAPS


def pil_grayscale_u8(rgb_u8: jnp.ndarray) -> jnp.ndarray:
    """PIL ``Image.convert("L")`` parity, integer-exact.

    rgb_u8: (..., 3) uint8 -> (...) uint8 via PIL's L24 fixed-point Rec.601
    (libImaging/Convert.c): (R*19595 + G*38470 + B*7471 + 0x8000) >> 16.
    """
    r = rgb_u8[..., 0].astype(jnp.uint32)
    g = rgb_u8[..., 1].astype(jnp.uint32)
    b = rgb_u8[..., 2].astype(jnp.uint32)
    return ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype(jnp.uint8)


def normalize_u8(img_u8: jnp.ndarray, cfg: PreprocessConfig) -> jnp.ndarray:
    """data/preprocess.py::normalize_image parity for uint8 input, on device."""
    x = img_u8.astype(jnp.float32)
    if cfg.do_rescale:
        x = x * jnp.float32(cfg.rescale_factor)
    if cfg.do_normalize:
        mean = jnp.asarray(cfg.image_mean, jnp.float32)
        std = jnp.asarray(cfg.image_std, jnp.float32)
        x = (x - mean) / std
    return x


def build_pixels(
    map_fn_name: str,
    rgb_u8: jnp.ndarray,
    depth_u8: jnp.ndarray | None,
    cfg: PreprocessConfig,
) -> jnp.ndarray:
    """Raw (B, H, W, 3) uint8 frames (already at the target size) -> the
    version's float32 channel stack, identical to the host map function's
    pixel output. Jit-friendly: pure jnp, static shapes.
    """
    color = normalize_u8(rgb_u8, cfg)
    if map_fn_name == "map_3channel":
        return color
    assert depth_u8 is not None, "RGB-D layout needs a depth image"
    depth = normalize_u8(depth_u8, cfg)
    if map_fn_name == "map_6channel":
        return jnp.concatenate([color, depth], axis=-1)
    if map_fn_name == "map_10channel_case2":
        gray = pil_grayscale_u8(depth_u8).astype(jnp.float32)
        norm_mag, _, _, valid = gradient_features(gray)
        grad = jnp.stack([norm_mag] * 3, axis=-1)
        return jnp.concatenate([color, depth, grad, valid[..., None]], axis=-1)
    raise ValueError(f"device preprocess does not support {map_fn_name}")
