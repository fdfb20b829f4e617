"""Versioned channel-layout builders (the map-function registry).

Mirrors the reference's dataloader map functions (reference: dataloader.py:23-425
and register :431-537): each version's builder reads the example's images +
3-channel annotation mask, runs preprocessing, and assembles the channels-last
pixel_values stack the matching model version expects (see rgbdseg_tpu.versions
for the binding).

Mask file convention (reference: data_process.py:111-117): 3-channel PNG read
with cv2.IMREAD_UNCHANGED; channel 1 holds instance ids, channel 2 semantic ids;
the (instance, semantic) pairs of channels [1:] define instance_id_to_semantic_id.

Raw-channel parity notes (reference quirks preserved):
- Derived channels (gradients, normals, gray depth, validity masks) are appended
  RAW — not ImageNet-normalized (dataloader.py:200-209, 326-332 et al.).
- Gradient validity masks in the *_tmp/_g/case1 variants threshold the
  cv2-resized gradient image at > 50 on any channel (dataloader.py:163, 246, 374).
"""

from __future__ import annotations

import os
from typing import Callable

import cv2
import numpy as np
from PIL import Image

from ..config import PreprocessConfig
from .depth_features import (
    calculate_gradient_features,
    calculate_surface_normals,
    compute_depth_gradient,
    to_grayscale,
)
from .preprocess import output_size, process_image, resize_image, instance_map_to_binary_masks
from ..ops.csf import csf_fuse
import jax.numpy as jnp


def _load_image(path: str) -> Image.Image:
    return Image.open(path)


def _load_mask(path: str) -> np.ndarray:
    mask = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if mask is None:
        raise FileNotFoundError(path)
    return mask


def _mask_and_mapping(mask: np.ndarray):
    semantic_and_instance = mask[..., 1:]
    instance_map = semantic_and_instance[..., 0]
    pairs = np.unique(semantic_and_instance.reshape(-1, 2), axis=0)
    mapping = {int(i): int(s) for i, s in pairs}
    return instance_map, mapping


def _labels(instance_map, mapping, cfg: PreprocessConfig):
    resized = resize_image(instance_map, output_size(cfg), nearest=True)
    return instance_map_to_binary_masks(resized, mapping, cfg)


def _rgb(example_images) -> np.ndarray:
    img = example_images[0] if isinstance(example_images, (list, tuple)) else example_images
    return np.asarray(_load_image(img).convert("RGB")) if isinstance(img, str) else np.asarray(img)


def _depth_rgb(example_images, idx=1) -> np.ndarray:
    return np.asarray(_load_image(example_images[idx]).convert("RGB"))


def _depth_gray(example_images, idx=1) -> np.ndarray:
    return np.asarray(_load_image(example_images[idx]).convert("L"))


def _cv2_resize_linear(img: np.ndarray, size_hw) -> np.ndarray:
    h, w = size_hw
    return cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)


# Augmentation extension point (reference: dataloader.py:19 `no_augment_and_
# transform = A.Compose([A.NoOp()])`, applied jointly to the color image and
# the 3-channel annotation mask in every map fn, e.g. :27, :61, :140). The
# default is a NoOp, exactly like the reference; install an albumentations-
# style callable with set_transform(). Depth/derived channels are built from
# the UNtransformed images on both sides (same reference limitation).
TRANSFORM = None


def set_transform(fn) -> None:
    """fn(image=rgb_uint8, mask=mask3ch) -> {"image": ..., "mask": ...} or
    None to disable (NoOp)."""
    global TRANSFORM
    TRANSFORM = fn


def _color_and_mask(example) -> tuple[np.ndarray, np.ndarray]:
    color = _rgb(example["image"])
    if example.get("annotation") is None:
        # inference path (predict.py single-image CLI): no annotation — an
        # all-zero mask yields empty labels, the pixel channels build the same
        mask = np.zeros(color.shape[:2] + (3,), np.uint8)
    else:
        mask = _load_mask(example["annotation"])
    if TRANSFORM is not None:
        out = TRANSFORM(image=color, mask=mask)
        color, mask = np.asarray(out["image"]), np.asarray(out["mask"])
    return color, mask


def map_3channel(example, cfg: PreprocessConfig):
    color_raw, mask = _color_and_mask(example)
    instance_map, mapping = _mask_and_mapping(mask)
    pix = process_image(color_raw, cfg)
    masks, labels = _labels(instance_map, mapping, cfg)
    return pix, masks, labels


def map_6channel(example, cfg: PreprocessConfig):
    color_raw, mask = _color_and_mask(example)
    instance_map, mapping = _mask_and_mapping(mask)
    color = process_image(color_raw, cfg)
    depth = process_image(_depth_rgb(example["image"]), cfg)
    masks, labels = _labels(instance_map, mapping, cfg)
    return np.concatenate([color, depth], axis=-1), masks, labels


def map_7channel_tmp(example, cfg: PreprocessConfig):
    """RGB + gradient-depth image (already on disk) + >50 validity mask."""
    color_raw, mask = _color_and_mask(example)
    instance_map, mapping = _mask_and_mapping(mask)
    grad_raw = _depth_rgb(example["image"])
    color = process_image(color_raw, cfg)
    grad = process_image(grad_raw, cfg)
    resized = _cv2_resize_linear(grad_raw, output_size(cfg))
    gmask = np.any(resized > 50, axis=-1).astype(np.float32)[..., None]
    masks, labels = _labels(instance_map, mapping, cfg)
    return np.concatenate([color, grad, gmask], axis=-1), masks, labels


def map_7channel_g(example, cfg: PreprocessConfig):
    """RGB + Sobel-magnitude of gray depth (uint8, 3x replicated) + >50 mask."""
    color_raw, mask = _color_and_mask(example)
    instance_map, mapping = _mask_and_mapping(mask)
    color = process_image(color_raw, cfg)
    gray = _depth_gray(example["image"])
    gm = compute_depth_gradient(gray).astype(np.uint8)
    grad3 = np.stack([gm, gm, gm], axis=2)
    grad = process_image(grad3, cfg)
    resized = _cv2_resize_linear(grad3, output_size(cfg))
    gmask = np.any(resized > 50, axis=-1).astype(np.float32)[..., None]
    masks, labels = _labels(instance_map, mapping, cfg)
    return np.concatenate([color, grad, gmask], axis=-1), masks, labels


def map_7channel_g2(example, cfg: PreprocessConfig):
    """RGB + normalized gradient features of the *resized* gray depth (raw)."""
    color_raw, mask = _color_and_mask(example)
    instance_map, mapping = _mask_and_mapping(mask)
    color = process_image(color_raw, cfg)
    gray = _cv2_resize_linear(_depth_gray(example["image"]), output_size(cfg))
    norm_mag, _, _, valid = calculate_gradient_features(gray)
    grad = np.stack([norm_mag] * 3, axis=-1)
    masks, labels = _labels(instance_map, mapping, cfg)
    return np.concatenate([color, grad, valid[..., None]], axis=-1), masks, labels


def map_7channel_s(example, cfg: PreprocessConfig):
    """RGB + surface normals of resized gray depth (raw) + validity mask."""
    color_raw, mask = _color_and_mask(example)
    instance_map, mapping = _mask_and_mapping(mask)
    color = process_image(color_raw, cfg)
    gray = _cv2_resize_linear(_depth_gray(example["image"]), output_size(cfg))
    normals, valid = calculate_surface_normals(gray)
    masks, labels = _labels(instance_map, mapping, cfg)
    return np.concatenate([color, normals, valid[..., None]], axis=-1), masks, labels


def map_7channel_s2(example, cfg: PreprocessConfig):
    """RGB + raw resized gray depth channel (version 0.0.7 input)."""
    color_raw, mask = _color_and_mask(example)
    instance_map, mapping = _mask_and_mapping(mask)
    color = process_image(color_raw, cfg)
    gray = _cv2_resize_linear(_depth_gray(example["image"]), output_size(cfg)).astype(np.float32)
    masks, labels = _labels(instance_map, mapping, cfg)
    return np.concatenate([color, gray[..., None]], axis=-1), masks, labels


def map_10channel_case1(example, cfg: PreprocessConfig):
    """RGB + depth + gradient-depth (all on disk) + >50 validity mask."""
    color_raw, mask = _color_and_mask(example)
    instance_map, mapping = _mask_and_mapping(mask)
    color = process_image(color_raw, cfg)
    depth = process_image(_depth_rgb(example["image"], 1), cfg)
    grad_raw = _depth_rgb(example["image"], 2)
    grad = process_image(grad_raw, cfg)
    resized = _cv2_resize_linear(grad_raw, output_size(cfg))
    gmask = np.any(resized > 50, axis=-1).astype(np.float32)[..., None]
    masks, labels = _labels(instance_map, mapping, cfg)
    return np.concatenate([color, depth, grad, gmask], axis=-1), masks, labels


def map_10channel_case2(example, cfg: PreprocessConfig):
    """Final-model (0.4.0) input: RGB + depth + gradient features of resized
    gray depth + validity mask (reference: dataloader.py:386-425)."""
    color_raw, mask = _color_and_mask(example)
    instance_map, mapping = _mask_and_mapping(mask)
    color = process_image(color_raw, cfg)
    depth = process_image(_depth_rgb(example["image"], 1), cfg)
    gray = _cv2_resize_linear(_depth_gray(example["image"], 1), output_size(cfg))
    norm_mag, _, _, valid = calculate_gradient_features(gray)
    grad = np.stack([norm_mag] * 3, axis=-1)
    masks, labels = _labels(instance_map, mapping, cfg)
    return np.concatenate([color, depth, grad, valid[..., None]], axis=-1), masks, labels


def map_30channel(example, cfg: PreprocessConfig):
    """NYU ultra path: RGB + depth + CSF-fusion of 8 augmentation modalities
    (reference: dataloader.py:88-129 + nyu_ultra_preprocess :743-759)."""
    color_raw, mask = _color_and_mask(example)
    instance_map, mapping = _mask_and_mapping(mask)
    imgs = [np.asarray(_load_image(p).convert("RGB")) for p in example["image"]]
    color = process_image(color_raw, cfg)
    depth = process_image(imgs[1], cfg)
    aug = np.stack(imgs[2:10])  # uint8; CSF returns the input dtype like the
    # reference (data_process.py:919 casts back to the original dtype)
    fused = np.asarray(csf_fuse(jnp.asarray(aug)))
    fused_p = process_image(fused, cfg)
    masks, labels = _labels(instance_map, mapping, cfg)
    # Parity quirk preserved: the reference loader emits [color, fused, depth]
    # (dataloader.py:115-120) while the model's default branch slices channels
    # 3:6 as "depth" and 6:9 as "fused" (custom_model.py:357-360) — so its depth
    # encoder actually sees the CSF-fused image and DSAM sees the raw depth.
    return np.concatenate([color, fused_p, depth], axis=-1), masks, labels


MAP_FUNCTIONS: dict[str, Callable] = {
    "map_3channel": map_3channel,
    "map_6channel": map_6channel,
    "map_7channel_tmp": map_7channel_tmp,
    "map_7channel_g": map_7channel_g,
    "map_7channel_g2": map_7channel_g2,
    "map_7channel_s": map_7channel_s,
    "map_7channel_s2": map_7channel_s2,
    "map_10channel_case1": map_10channel_case1,
    "map_10channel_case2": map_10channel_case2,
    "map_30channel": map_30channel,
}
