"""Single-image predictor (reference: predictor.py:19-69).

Loads a checkpoint, preprocesses one image (optionally with depth for RGB-D
versions), runs the jitted forward, post-processes, and returns/saves a
colored instance overlay.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig, PreprocessConfig
from ..models.mask2former import Mask2FormerRGBD
from ..versions import get as get_version
from ..data.registry import MAP_FUNCTIONS
from .postprocess import post_process_instance_segmentation
from .visualize import overlay_instances, _color_for


class Predictor:
    def __init__(self, cfg: ModelConfig, params, batch_stats=None, preprocess: Optional[PreprocessConfig] = None):
        self.cfg = cfg
        self.model = Mask2FormerRGBD(cfg)
        # device arrays, not numpy: checkpoint restores hand back np.ndarrays,
        # and a np param closure-captured in the jit breaks jax-indexed lookups
        # (np.__getitem__ can't take a traced index) and re-uploads per call
        self.params = jax.tree.map(jnp.asarray, params)
        self.batch_stats = jax.tree.map(jnp.asarray, batch_stats or {})
        self.preprocess = preprocess or PreprocessConfig()
        self._apply = jax.jit(self._forward)
        self._apply_raw = None  # lazily jitted uint8 path (predict_example)

    def _forward(self, pixel_values):
        variables = {"params": self.params}
        if jax.tree_util.tree_leaves(self.batch_stats):
            variables["batch_stats"] = self.batch_stats
        out = self.model.apply(variables, pixel_values, deterministic=True)
        return out.class_queries_logits, out.masks_queries_logits

    def _forward_raw(self, packed_u8):
        """Packed raw uint8 frames -> channels on device -> forward. Ships
        3-9 bytes per pixel to the device instead of the 12-40 of the float
        channel stack — the H2D transfer, not the chip, bounds single-image
        latency on thin links (PERF.md: ~37 MB/s on this infra's tunnel)."""
        from ..data.device_preprocess import build_from_packed

        pix = build_from_packed(get_version(self.cfg.version).map_fn, packed_u8, self.preprocess)
        return self._forward(pix)

    def predict_example(self, example: dict, threshold: float = 0.5) -> dict:
        """example: meta-JSON record {"image": ..., "annotation": optional —
        omitted for pure inference (the channel builder then runs against an
        empty mask)}."""
        from ..data import registry as R
        from ..data import device_preprocess as DP
        from ..data.preprocess import output_size

        spec = get_version(self.cfg.version)
        if DP.supported(spec.map_fn) and R.TRANSFORM is None:
            # Device-side channel building: exact pixel parity with the host
            # builders is pinned in tests/test_data.py::TestDevicePreprocess.
            # Arbitrary-size camera frames are fine — the device builder
            # replicates the host's derive/resize ordering (grayscale at
            # SOURCE size, cv2-resize, then Sobel) with bit-exact integer
            # resampler twins (ops/resize_exact.py), so raw uint8 uploads
            # (3-9 B/px at source size vs 12-40 of the float stack) work for
            # any input. The only gate left: all frames must share one size
            # (mismatched RGB/depth sizes fall back to the host builder).
            size = output_size(self.preprocess)
            frames = [R._rgb(example["image"])]
            width = DP.packed_width(spec.map_fn)
            if width > 3:
                frames.append(R._depth_rgb(example["image"]))
            if width > 6:
                frames.append(R._depth_rgb(example["image"], 2))
            if len({f.shape[:2] for f in frames}) == 1:
                packed = np.concatenate(frames, axis=-1)
                if self._apply_raw is None:
                    self._apply_raw = jax.jit(self._forward_raw)
                cls_logits, mask_logits = self._apply_raw(jnp.asarray(packed)[None])
                return post_process_instance_segmentation(
                    cls_logits, mask_logits, threshold=threshold,
                    target_sizes=[size], return_binary_maps=True,
                )[0]
        map_fn = MAP_FUNCTIONS[spec.map_fn]
        pix, _, _ = map_fn(example, self.preprocess)
        return self.predict_pixels(pix[None], threshold)[0]

    def predict_and_overlay_files(
        self, image_paths: list, threshold: float = 0.5, save: Optional[str] = None
    ):
        """Version-dispatched single-example inference from files on disk:
        `image_paths` is [rgb] or [rgb, depth, ...modalities] exactly as a
        meta-JSON "image" entry for this version (reference predictor.py:19
        surface, extended to the RGB-D versions). Overlays at the RGB's
        original size."""
        from PIL import Image

        example = {"image": image_paths if len(image_paths) > 1 else image_paths[0]}
        res = self.predict_example(example, threshold)
        image_rgb = np.asarray(Image.open(image_paths[0]).convert("RGB"))
        from ..inference.postprocess import _resize_nearest_np

        masks = (
            _resize_nearest_np(res["segmentation"], image_rgb.shape[:2])
            if res["segmentation"].size
            else res["segmentation"]
        )
        vis = overlay_instances(image_rgb, masks)
        if save:
            import cv2

            os.makedirs(os.path.dirname(save) or ".", exist_ok=True)
            cv2.imwrite(save, cv2.cvtColor(vis, cv2.COLOR_RGB2BGR))
        return res, vis

    def predict_pixels(self, pixel_values: np.ndarray, threshold: float = 0.5) -> list[dict]:
        cls_logits, mask_logits = self._apply(pixel_values)
        target_sizes = [pixel_values.shape[1:3]] * pixel_values.shape[0]
        return post_process_instance_segmentation(
            cls_logits, mask_logits, threshold=threshold, target_sizes=target_sizes, return_binary_maps=True
        )

    def predict_and_overlay(self, image_rgb: np.ndarray, threshold: float = 0.5, save: Optional[str] = None):
        """RGB-only convenience path (version 0.0.0)."""
        from ..data.preprocess import process_image

        pix = process_image(image_rgb, self.preprocess)
        res = self.predict_pixels(pix[None].astype(np.float32), threshold)[0]
        from ..inference.postprocess import _resize_nearest_np

        masks = _resize_nearest_np(res["segmentation"], image_rgb.shape[:2]) if res["segmentation"].size else res["segmentation"]
        vis = overlay_instances(image_rgb, masks)
        if save:
            import cv2

            os.makedirs(os.path.dirname(save) or ".", exist_ok=True)
            cv2.imwrite(save, cv2.cvtColor(vis, cv2.COLOR_RGB2BGR))
        return res, vis
