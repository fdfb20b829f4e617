"""Top-level Mask2Former RGB-D model with version-dispatched depth fusion.

Mirrors the capability surface of the reference's
CustomMask2FormerForUniversalSegmentation + CustomMask2FormerPixelLevelModule
(reference: custom_model.py:37-502): a version string (see rgbdseg_tpu.versions)
selects which fusion modules exist and how the forward composes them; the pixel
decoder + transformer decoder are shared.

The whole forward is a single jittable function of (params, pixel_values):
the DSAM per-sample CPU loop of the reference (custom_model.py:216-229,
339-352 — histogram/scipy round trips and `.item()` syncs) is replaced by the
batched on-device decomposition in ops.depth_decomp.

Version 0.4.0 parity note: the reference computes BOTH fusion branches on
`.detach().clone()`-ed backbone features (custom_model.py:332-333), so the Swin
encoder receives no gradient in that version; we replicate with stop_gradient.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..versions import get as get_version
from ..ops.image import to_grayscale
from .. import versions as V
from .fusion import (
    DSAMCascade,
    DepthGradientInjection,
    DepthGradientInjectionResidual,
    DepthGradientInjectionWithMask,
    DepthImageRatioPredictor,
    EnhancedDepthImageRatioPredictor,
    FeatureFuser,
    IntrinsicsPredictor,
    RatioPredictor,
)
from .pixel_decoder import PixelDecoder
from .swin import SwinBackbone
from .transformer_decoder import TransformerModule
from ..ops.normals import surface_normals_intrinsics


class ModelOutputs(NamedTuple):
    class_queries_logits: jnp.ndarray  # (B, Q, num_labels + 1), final layer
    masks_queries_logits: jnp.ndarray  # (B, Q, H/4, W/4), final layer
    aux_class_logits: tuple  # per intermediate layer (excluding final)
    aux_mask_logits: tuple


def _ch(x: jnp.ndarray, spec: V.ChannelSpec, name: str) -> jnp.ndarray:
    return x[..., spec.slice(name)]


class PixelLevelModule(nn.Module):
    """Backbone(s) + fusion + pixel decoder, version-dispatched."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray, deterministic: bool = True):
        cfg = self.cfg
        entry = get_version(cfg.version)
        spec, fusion = entry.channels, entry.fusion
        if pixel_values.shape[-1] != spec.total:
            raise ValueError(
                f"version {cfg.version} expects {spec.total} channels, got {pixel_values.shape[-1]}"
            )

        rgb = _ch(pixel_values, spec, "rgb")
        encoder = SwinBackbone(cfg.backbone, name="encoder")
        color_maps = list(encoder(rgb, deterministic=deterministic))

        depth_maps = None
        if fusion.dual_backbone:
            depth = _ch(pixel_values, spec, "depth")
            depth_encoder = SwinBackbone(cfg.backbone, name="depth_encoder")
            depth_maps = list(depth_encoder(depth, deterministic=deterministic))

        # --- ratio for DSAM ---
        ratio = None
        if fusion.dsam:
            if fusion.ratio == "fixed":
                b = pixel_values.shape[0]
                ratio = jnp.full((b,), cfg.dsam_default_ratio, jnp.float32)
            elif fusion.ratio == "backbone":
                ratio = RatioPredictor(name="ratio_predictor")(depth_maps)[:, 0]
            elif fusion.ratio == "enhanced":
                depth = _ch(pixel_values, spec, "depth")
                ratio = EnhancedDepthImageRatioPredictor(name="ratio_predictor")(
                    depth, deterministic=deterministic
                )[:, 0]
            else:
                raise ValueError(fusion.ratio)

        def run_dsam(maps):
            src = "fused_depth" if fusion.dsam_source == "fused_depth" else "depth"
            depth_img = _ch(pixel_values, spec, src)
            cascade = DSAMCascade(
                channels=cfg.backbone.feature_channels,
                num_regions=cfg.dsam_num_regions,
                hist_bins=cfg.dsam_hist_bins,
                prominence=cfg.dsam_prominence,
                name="dsam_cascade",
            )
            return cascade(maps, depth_img, ratio)

        def run_dggm(maps):
            if fusion.dggm_source == "normals":
                gray = _ch(pixel_values, spec, "gray_depth")  # (B, H, W, 1)
                fx, fy, cx, cy = IntrinsicsPredictor(name="intrinsics_predictor")(gray)
                normals, valid = jax.vmap(surface_normals_intrinsics)(gray[..., 0], fx, fy, cx, cy)
                # The reference computes normals in host numpy from the
                # predicted intrinsics (custom_model.py:169-196, via
                # `.cpu().numpy()`), so the normals — and therefore the
                # intrinsics predictor — are DETACHED from the autodiff
                # graph. Match that boundary: without it the normals' NaN
                # intermediates (invalid-depth handling in
                # surface_normals_intrinsics) leak NaN into the intrinsics
                # parameters' gradients through the where-trap, which then
                # NaNs the global-norm clip and the whole training step.
                normals = jax.lax.stop_gradient(normals)
                valid = jax.lax.stop_gradient(valid)
                grad, mask = normals, valid[..., None]
            else:
                grad = _ch(pixel_values, spec, "gradient")
                mask = (
                    _ch(pixel_values, spec, "gradient_mask")
                    if spec.gradient_mask is not None
                    else None
                )
            if fusion.dggm == "inject":
                return DepthGradientInjection(name="dggm")(maps, grad)
            if fusion.dggm == "inject_mask":
                return DepthGradientInjectionWithMask(name="dggm")(maps, grad, mask)
            if fusion.dggm == "residual":
                return DepthGradientInjectionResidual(name="dggm")(maps, grad, mask)
            raise ValueError(fusion.dggm)

        if fusion.two_branch_sum:
            # version 0.4.0: both branches on detached copies, summed.
            detached = [jax.lax.stop_gradient(m) for m in color_maps]
            branch1 = run_dsam(list(detached))
            branch2 = run_dggm(list(detached))
            fused_maps = [a + b for a, b in zip(branch1, branch2)]
        else:
            maps = color_maps
            if fusion.dsam:
                maps = run_dsam(maps)
            if fusion.dggm is not None:
                maps = run_dggm(maps)
            if fusion.feature_fuser:
                maps = FeatureFuser(name="feature_fuser")(maps, depth_maps)
            fused_maps = maps

        # Keep the pixel decoder in the backbone compute dtype: DSAM's region
        # masks are f32 by design (ops/depth_decomp.py upcasts for exact
        # histogram/peak numerics), which silently promoted the fused maps —
        # and with them ALL 6 deformable encoder layers, the FPN, and the
        # transformer decoder — to f32 even under bf16 mixed precision.
        # Measured on chip (640x480 v0.4.0 bf16): train 6.9 -> 8.8+ img/s.
        fused_maps = [m.astype(color_maps[0].dtype) for m in fused_maps]
        mask_features, multi_scale = PixelDecoder(cfg, name="pixel_decoder")(fused_maps)
        return mask_features, multi_scale


class Mask2FormerRGBD(nn.Module):
    """Full model: pixel-level module + transformer module + class head."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray, deterministic: bool = True) -> ModelOutputs:
        mask_features, multi_scale = PixelLevelModule(self.cfg, name="pixel_level_module")(
            pixel_values, deterministic=deterministic
        )
        class_logits, mask_logits = TransformerModule(self.cfg, name="transformer_module")(
            multi_scale, mask_features, deterministic=deterministic
        )
        return ModelOutputs(
            class_queries_logits=class_logits[-1],
            masks_queries_logits=mask_logits[-1],
            aux_class_logits=tuple(class_logits[:-1]),
            aux_mask_logits=tuple(mask_logits[:-1]),
        )
