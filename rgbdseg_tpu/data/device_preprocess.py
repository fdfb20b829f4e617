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
(0.1.x), the gradient-image 7-channel variants (0.0.2/0.0.3 tmp, 0.0.5 g2,
0.0.6 normals), the 4-channel gray-depth 0.0.7 (s2), the on-disk-gradient
10-channel case1 (0.3.0), and the flagship 10-channel case2 (0.4.0). Callers
fall back to the host builders for the other layouts (gated by
`supported(version)`).

Frames at the TARGET size take the direct path. Frames at any OTHER
(uniform) size are resized ON DEVICE with bit-exact twins of the host
resamplers (ops/resize_exact.py: PIL BILINEAR for process_image parity, cv2
INTER_LINEAR for the gray-depth/mask paths), applied in the host builders'
exact order — grayscale at SOURCE resolution, then cv2-resize, then Sobel
(resize-then-derive does not commute; ADVICE r3) — so raw-uint8 upload now
works for arbitrary camera sizes with pixel-identical channels
(VERDICT r4 #8; parity pinned in tests/test_data.py::TestDevicePreprocess).

The `packed` layout concatenates the required uint8 frames channel-wise into
ONE (B, H, W, C) uint8 array (rgb | depth-or-grad [| grad]) so batch input
staging ships a single buffer; `packed_width` says how many channels a map
function needs, `build_from_packed` splits and builds.

Reference provenance: the host twins implement dataloader.py:23-49 (3ch),
:53-84 (6ch), :132-168 (7ch tmp), :214-238 (7ch g2), :242-266 (7ch s),
:270-297 (4ch s2), :301-336 (10ch case1), :386-425 (10ch case2) of the
reference.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import PreprocessConfig
from ..ops.normals import surface_normals_gradient
from ..ops.sobel import gradient_features

# uint8 frame channels each supported map function needs (rgb always first).
_PACKED_WIDTH = {
    "map_3channel": 3,  # rgb
    "map_6channel": 6,  # rgb | depth
    "map_7channel_tmp": 6,  # rgb | gradient image (on disk)
    "map_7channel_g2": 6,  # rgb | depth (gray + gradient features on device)
    "map_7channel_s": 6,  # rgb | depth (gray + surface normals on device)
    "map_7channel_s2": 6,  # rgb | depth (gray on device)
    "map_10channel_case1": 9,  # rgb | depth | gradient image (on disk)
    "map_10channel_case2": 6,  # rgb | depth (gray+gradients on device)
}


def supported(map_fn_name: str) -> bool:
    return map_fn_name in _PACKED_WIDTH


def packed_width(map_fn_name: str) -> int:
    return _PACKED_WIDTH[map_fn_name]


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
    grad_u8: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Raw (B, H, W, 3) uint8 frames -> the version's float32 channel stack,
    identical to the host map function's pixel output.

    One dispatch tree for both the at-target-size and the arbitrary-source-
    size cases: the two resamplers below are IDENTITY at the target size and
    otherwise the bit-exact device twins of the host resizers
    (ops/resize_exact.py), applied in the host builders' exact order —
    PIL-BILINEAR for the process_image channels; PIL-grayscale at SOURCE
    size then cv2-INTER_LINEAR for the gray-depth derivations; cv2-resize
    >50 thresholds for the validity masks. `depth_u8` is the second on-disk
    frame (depth image for most layouts, the precomputed gradient image for
    map_7channel_tmp); `grad_u8` is case1's third on-disk frame.
    Jit-friendly: pure jnp, static shapes."""
    from .preprocess import output_size

    size = output_size(cfg)
    if tuple(rgb_u8.shape[-3:-1]) == size:
        rs_pil = lambda x: x  # noqa: E731 — identity twins at target size
        rs_cv = lambda x, has_channels=True: x  # noqa: E731
    else:
        from ..ops.resize_exact import cv2_resize_linear_u8, pil_resize_u8

        rs_pil = lambda x: pil_resize_u8(x, size, has_channels=True)  # noqa: E731
        rs_cv = lambda x, has_channels=True: cv2_resize_linear_u8(  # noqa: E731
            x, size, has_channels=has_channels
        )

    color = normalize_u8(rs_pil(rgb_u8), cfg)
    if map_fn_name == "map_3channel":
        return color
    assert depth_u8 is not None, "RGB-D layout needs a second frame"
    if map_fn_name == "map_7channel_tmp":
        # depth_u8 IS the on-disk gradient image here (registry.py
        # map_7channel_tmp); >50-on-any-channel validity mask on the
        # cv2-resized frame (raw frame when already at target size).
        grad = normalize_u8(rs_pil(depth_u8), cfg)
        gmask = jnp.any(rs_cv(depth_u8) > 50, axis=-1).astype(jnp.float32)
        return jnp.concatenate([color, grad, gmask[..., None]], axis=-1)
    if map_fn_name in ("map_7channel_g2", "map_7channel_s", "map_7channel_s2"):
        # host order: PIL convert("L") at SOURCE size -> cv2 resize -> derive
        gray = rs_cv(pil_grayscale_u8(depth_u8), has_channels=False).astype(jnp.float32)
        if map_fn_name == "map_7channel_g2":
            norm_mag, _, _, valid = gradient_features(gray)
            grad = jnp.stack([norm_mag] * 3, axis=-1)
            return jnp.concatenate([color, grad, valid[..., None].astype(jnp.float32)], axis=-1)
        if map_fn_name == "map_7channel_s":
            normals, valid = surface_normals_gradient(gray)
            return jnp.concatenate([color, normals, valid[..., None].astype(jnp.float32)], axis=-1)
        return jnp.concatenate([color, gray[..., None]], axis=-1)
    depth = normalize_u8(rs_pil(depth_u8), cfg)
    if map_fn_name == "map_6channel":
        return jnp.concatenate([color, depth], axis=-1)
    if map_fn_name == "map_10channel_case1":
        assert grad_u8 is not None, "case1 needs the on-disk gradient frame"
        grad = normalize_u8(rs_pil(grad_u8), cfg)
        gmask = jnp.any(rs_cv(grad_u8) > 50, axis=-1).astype(jnp.float32)
        return jnp.concatenate([color, depth, grad, gmask[..., None]], axis=-1)
    if map_fn_name == "map_10channel_case2":
        gray = rs_cv(pil_grayscale_u8(depth_u8), has_channels=False).astype(jnp.float32)
        norm_mag, _, _, valid = gradient_features(gray)
        grad = jnp.stack([norm_mag] * 3, axis=-1)
        return jnp.concatenate([color, depth, grad, valid[..., None]], axis=-1)
    raise ValueError(f"device preprocess does not support {map_fn_name}")


def unpack_masks(packed_u8: jnp.ndarray, hw: tuple[int, int]) -> jnp.ndarray:
    """Bit-packed GT masks (B, T, ceil(H*W/8)) uint8 (np.packbits layout,
    MSB-first) -> (B, T, H, W) float32 0/1, on device.

    The training targets are binary, so shipping them packed cuts their
    host->device bytes 32x (a (1, 16, 480, 640) f32 target block is 19.7 MB
    — more than the packed input frames — and on thin links dominates the
    step's upload). Inverse of SegmentationDataset._packed_masks; exactness
    pinned in tests/test_trainer.py::test_train_packed_targets_match."""
    h, w = hw
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (packed_u8[..., None] >> shifts) & jnp.uint8(1)  # (..., N, 8)
    flat = bits.reshape(packed_u8.shape[:-1] + (-1,))[..., : h * w]
    return flat.reshape(packed_u8.shape[:-1] + (h, w)).astype(jnp.float32)


def build_from_packed(map_fn_name: str, packed_u8: jnp.ndarray, cfg: PreprocessConfig) -> jnp.ndarray:
    """(B, H, W, packed_width) uint8 (rgb | frame2 [| frame3]) -> the float32
    channel stack. The single packed array is what the input-staging path
    ships over the host→device link (Trainer eval/predict; 6-9 bytes/pixel
    instead of the 16-40 of the float stack)."""
    w = _PACKED_WIDTH[map_fn_name]
    assert packed_u8.shape[-1] == w, (packed_u8.shape, w)
    rgb = packed_u8[..., :3]
    frame2 = packed_u8[..., 3:6] if w > 3 else None
    frame3 = packed_u8[..., 6:9] if w > 6 else None
    return build_pixels(map_fn_name, rgb, frame2, cfg, frame3)
