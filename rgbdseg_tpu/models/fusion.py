"""Depth-fusion modules: DGGM (3 variants), DSAM, E-DSAM predictors, fusers.

Parity targets in the reference's custom_model.py:
- FeatureFuser (:505-540), SpatialAttention / FeatureFuserWithSpatialAttention
  (:543-619)
- DSAModule (:622-820) — here fully batched: the per-sample Python loop +
  CPU histogram round-trip become `ops.depth_decomp.dsam_region_masks`
- RatioPredictor (:823-897), DepthImageRatioPredictor (:1272-1360),
  EnhancedDepthImageRatioPredictor (:1363-1487)
- IntrinsicsPredictorFromDepthImage (:900-1006)
- DepthGradientInjection (:1009-1089), ...WithMask (:1092-1166),
  ...Residual (:1169-1269)

All modules are NHWC. BatchNorm keeps running statistics in the `batch_stats`
collection (torch BatchNorm2d parity, momentum 0.1 / eps 1e-5).
"""

from __future__ import annotations

import os
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.conv import conv2d_lowcin, merge_multiscale_kernels
from .common import ConvParams
from ..ops.depth_decomp import dsam_region_masks, dsam_region_masks_pooled
from ..ops.image import to_grayscale
from ..ops.resize import (
    adaptive_avg_pool2d,
    adaptive_max_pool2d,
    resize_bilinear,
    resize_nearest,
)


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch-exact running-stat semantics.

    flax `nn.BatchNorm` stores the BIASED batch variance in its running
    average; `torch.nn.BatchNorm2d` (what the reference's DSAM / E-DSAM /
    fuser layers use, custom_model.py:622-897) normalizes with the biased
    variance but stores the UNBIASED one (*n/(n-1)) in running_var. The
    difference only surfaces at eval time, but it is systematic, and the
    end-to-end training differential (tests/test_train_differential.py)
    compares final batch_stats against the torch trainer — so match it.
    Variable names/shapes are flax-compatible (batch_stats/{mean,var}), so
    checkpoints, hf_convert, and the BN-folding fast path are unaffected.
    Stats/normalization are computed in f32; the output is cast to the same
    promoted dtype flax would produce (x, scale, bias, running stats)."""

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))
        if self.use_running_average:
            mean = ra_mean.value.astype(jnp.float32)
            var = ra_var.value.astype(jnp.float32)
        else:
            axes = tuple(range(x.ndim - 1))
            x32 = x.astype(jnp.float32)
            mean = x32.mean(axes)
            var = (x32 * x32).mean(axes) - mean * mean
            if not self.is_initializing():
                n = x.size / c
                m = self.momentum
                ra_mean.value = (m * ra_mean.value.astype(jnp.float32) + (1 - m) * mean).astype(ra_mean.value.dtype)
                ra_var.value = (
                    m * ra_var.value.astype(jnp.float32)
                    + (1 - m) * var * (n / max(n - 1.0, 1.0))
                ).astype(ra_var.value.dtype)
        out_dtype = jnp.result_type(
            x.dtype, scale.dtype, bias.dtype, ra_mean.value.dtype, ra_var.value.dtype
        )
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(out_dtype)


def _bn(name: str, deterministic: bool):
    return TorchBatchNorm(
        use_running_average=deterministic, momentum=0.9, epsilon=1e-5, name=name
    )


def _fold_bn() -> bool:
    """TRACE-TIME flag (ADVICE r3): RGBDSEG_FOLD_BN — like RGBDSEG_EDSAM_CONV
    and RGBDSEG_EDSAM_FLAT below — is read while the module traces, so its
    value is BAKED into any cached jit executable (e.g. Predictor._apply,
    the Trainer step fns, the bench forwards). Changing the env var after a
    function compiled silently has no effect; set these before the first
    call (they exist for back-to-back A/B benchmarking, where each setting
    runs in a fresh process). The three variants are pinned against the
    default path by tests/test_model.py::test_bn_fold_and_conv_twin_match_default."""
    return os.environ.get("RGBDSEG_FOLD_BN", "1") != "0"


def _bn_affine(mod: nn.Module, bn_name: str, eps: float = 1e-5):
    """Eval-mode BatchNorm is a per-channel affine y = a*x + c; read (a, c)
    straight from the module's variable tree (params scale/bias + batch_stats
    mean/var) so the affine can be folded into the preceding conv's weights.
    Only valid when the variables already exist (i.e. not during init)."""
    p = mod.variables["params"][bn_name]
    s = mod.variables["batch_stats"][bn_name]
    a = p["scale"].astype(jnp.float32) * jax.lax.rsqrt(s["var"].astype(jnp.float32) + eps)
    c = p["bias"].astype(jnp.float32) - s["mean"].astype(jnp.float32) * a
    return a, c


def _conv_bn_relu(
    mod: nn.Module,
    x,
    features: int,
    ksize: tuple,
    conv_name: str,
    bn_name: str,
    deterministic: bool,
    strides=(1, 1),
    padding="SAME",
):
    """conv -> BatchNorm -> ReLU with the BN folded into the conv weights in
    eval mode (y = conv(x, K*a) + (b*a + c)), exact up to one float
    reassociation per tap. Motivation (frame profile 2026-08-20): the eval BN
    ran as a separate full-resolution pass with layout copies on both sides —
    0.4 ms ReLU pass + 0.44 ms layout copy around E-DSAM's fusion_conv alone.
    Train mode uses the stock nn.Conv + nn.BatchNorm modules (running-stats
    update and all); the parameter tree is IDENTICAL in both modes.
    RGBDSEG_FOLD_BN=0 restores the unfolded eval path for A/B."""
    if deterministic and not mod.is_initializing() and _fold_bn():
        k, b = ConvParams(features, ksize, name=conv_name)(x.shape[-1])
        a, c = _bn_affine(mod, bn_name)
        ct = jnp.result_type(x.dtype, k.dtype)
        kf = (k.astype(jnp.float32) * a).astype(ct)
        bf = (b.astype(jnp.float32) * a + c).astype(ct)
        if isinstance(padding, int):
            pad = ((padding, padding), (padding, padding))
        elif isinstance(padding, str):
            pad = padding
        else:
            pad = tuple(padding)
        y = jax.lax.conv_general_dilated(
            x.astype(ct),
            kf,
            window_strides=tuple(strides),
            padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return nn.relu(y + bf)
    y = nn.Conv(features, ksize, strides=strides, padding=padding, name=conv_name)(x)
    return nn.relu(_bn(bn_name, deterministic)(y))


class FeatureFuser(nn.Module):
    """Per-scale concat(color, depth) -> 1x1 conv -> ReLU back to color channels."""

    @nn.compact
    def __call__(self, color_maps, depth_maps):
        assert len(color_maps) == len(depth_maps)
        out = []
        for i, (c, d) in enumerate(zip(color_maps, depth_maps)):
            m = jnp.concatenate([c, d], axis=-1)
            m = nn.Conv(c.shape[-1], (1, 1), name=f"fuse{i}")(m)
            out.append(nn.relu(m))
        return out


class SpatialAttention(nn.Module):
    """CBAM-style spatial attention (mean+max pool over channels -> 1x1 conv -> sigmoid)."""

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        a = nn.Conv(1, (1, 1), name="conv")(jnp.concatenate([avg, mx], axis=-1))
        return jax.nn.sigmoid(a)


class FeatureFuserWithSpatialAttention(nn.Module):
    """Attention-weighted FeatureFuser variant (defined in the reference, not
    wired into any version — kept for capability parity)."""

    @nn.compact
    def __call__(self, color_maps, depth_maps):
        out = []
        for i, (c, d) in enumerate(zip(color_maps, depth_maps)):
            merged = jnp.concatenate([c, d], axis=-1)
            attn = SpatialAttention(name=f"spatial_attention{i}")(merged)
            re = jnp.concatenate([c * attn, d * attn], axis=-1)
            re = nn.Conv(c.shape[-1], (1, 1), name=f"fuse{i}")(re)
            out.append(nn.relu(re))
        return out


class DSAModule(nn.Module):
    """Depth-Sensitive Attention Module, batched.

    Consumes precomputed region masks + active flags (see
    ops.depth_decomp.region_masks for the exact variable-length semantics being
    encoded). With in != out channels the T+1 region convs are 3x3 stride-2
    (spatial halves) and the residual projection is a bias-free 3x3 stride-2;
    otherwise all convs are 1x1 and the residual is the identity.
    """

    in_channels: int
    out_channels: int
    num_regions: int = 3

    @nn.compact
    def __call__(self, features, masks, active):
        # features: (B, H, W, Cin); masks: (B, H, W, T+1) ALREADY max-pooled to
        # the feature resolution (the cascade chain-pools them once per stage);
        # active: (B, T+1). Masks/active are 0/1 — cast to the compute dtype so
        # the f32 decomposition doesn't promote the region convs to f32 under
        # bf16 mixed precision (0/1 is exact in bf16).
        b, h, w, _ = features.shape
        strided = self.in_channels != self.out_channels
        enhanced = None
        for i in range(self.num_regions + 1):
            m = masks[..., i : i + 1].astype(features.dtype)
            masked = features * m
            if strided:
                y = nn.Conv(
                    self.out_channels, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), name=f"conv{i}"
                )(masked)
            else:
                y = nn.Conv(self.out_channels, (1, 1), name=f"conv{i}")(masked)
            y = y * active[:, i][:, None, None, None].astype(y.dtype)
            enhanced = y if enhanced is None else enhanced + y
        if strided:
            proj = nn.Conv(
                self.out_channels,
                (3, 3),
                strides=(2, 2),
                padding=((1, 1), (1, 1)),
                use_bias=False,
                name="rgb_projection",
            )(features)
        else:
            proj = features
        return enhanced + proj


class DSAMCascade(nn.Module):
    """The 3-stage DSAM cascade shared by versions 0.1.1-0.4.0
    (reference forward: custom_model.py:216-229 et al.): dsam_k maps scale k
    features (C_k) to C_{k+1} at half resolution and adds into scale k+1."""

    channels: Sequence[int] = (96, 192, 384, 768)
    num_regions: int = 3
    hist_bins: int = 512
    prominence: float = 0.01

    @nn.compact
    def __call__(self, color_maps, depth_3ch, ratio):
        # color_maps: list of 4 NHWC maps; depth_3ch: (B, H, W, 3) normalized
        # depth image; ratio: (B,) window-size ratio.
        gray = to_grayscale(depth_3ch)  # (B, H, W)
        maps = list(color_maps)
        # Chain-pool the region masks down the pyramid: stage k needs them at
        # maps[k]'s resolution, and max-pooling the previous stage's pooled
        # masks is exact when the sizes divide (uniform windows compose).
        # When the input divides stage 0's resolution, the window compare is
        # FUSED with the first max-pool (dsam_region_masks_pooled) so the
        # full-res (B, H, W, T+1) f32 masks are never materialized at all;
        # otherwise fall back to full-res masks + adaptive pooling.
        th0, tw0 = maps[0].shape[1:3]
        sizes = [m.shape[1:3] for m in maps[:3]]
        chain_ok = (
            gray.shape[1] % th0 == 0
            and gray.shape[2] % tw0 == 0
            # later stages chain-pool from stage k-1; the fused path has no
            # true full-res fallback, so every link must divide exactly
            and all(
                sizes[k][0] % sizes[k + 1][0] == 0 and sizes[k][1] % sizes[k + 1][1] == 0
                for k in range(2)
            )
        )
        if chain_ok:
            mk, active = dsam_region_masks_pooled(
                gray,
                ratio,
                (th0, tw0),
                num_modes=self.num_regions,
                bins=self.hist_bins,
                prominence_frac=self.prominence,
            )
            mk_full = mk  # stage-0-resolution masks are the fallback source
        else:
            masks, active = dsam_region_masks(
                gray, ratio, num_modes=self.num_regions, bins=self.hist_bins, prominence_frac=self.prominence
            )
            mk_full = masks.transpose(0, 2, 3, 1)  # (B, H, W, T+1)
            mk = mk_full
        for k in range(3):
            th, tw = maps[k].shape[1:3]
            if mk.shape[1:3] != (th, tw):
                src = mk if (mk.shape[1] % th == 0 and mk.shape[2] % tw == 0) else mk_full
                mk = adaptive_max_pool2d(src, (th, tw))
            dsam = DSAModule(
                in_channels=self.channels[k],
                out_channels=self.channels[k + 1],
                num_regions=self.num_regions,
                name=f"dsam{k}",
            )
            maps[k + 1] = maps[k + 1] + dsam(maps[k], mk, active)
        return maps


class RatioPredictor(nn.Module):
    """GAP over 4 depth-pyramid scales -> MLP -> sigmoid scaled to [0.01, 0.5]."""

    out_min: float = 0.01
    out_max: float = 0.5

    @nn.compact
    def __call__(self, depth_maps):
        pooled = [jnp.mean(f, axis=(1, 2)) for f in depth_maps]
        x = jnp.concatenate(pooled, axis=-1)
        x = nn.relu(nn.Dense(64, name="fc0")(x))
        x = nn.relu(nn.Dense(32, name="fc1")(x))
        raw = nn.Dense(1, name="fc2")(x)
        return self.out_min + (self.out_max - self.out_min) * jax.nn.sigmoid(raw)


class DepthImageRatioPredictor(nn.Module):
    """Conv net on the 3-channel depth image -> ratio (reference :1272-1360)."""

    out_min: float = 0.01
    out_max: float = 0.5

    @nn.compact
    def __call__(self, depth, deterministic: bool = True):
        x = depth
        fold = deterministic and not self.is_initializing() and _fold_bn()
        for i, ch in enumerate((32, 64, 128)):
            if i == 0:
                # full-res conv from 3 channels: im2col matmul (ops/conv.py)
                k, b = ConvParams(ch, (3, 3), name=f"conv{i}")(x.shape[-1])
                if fold:
                    a, c = _bn_affine(self, f"bn{i}")
                    k = (k.astype(jnp.float32) * a).astype(x.dtype)
                    x = conv2d_lowcin(x, k)
                    x = nn.relu(x + (b.astype(jnp.float32) * a + c).astype(x.dtype))
                else:
                    x = conv2d_lowcin(x, k) + b
                    x = nn.relu(_bn(f"bn{i}", deterministic)(x))
            else:
                x = _conv_bn_relu(
                    self, x, ch, (3, 3), f"conv{i}", f"bn{i}", deterministic, padding=1
                )
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = _conv_bn_relu(self, x, 256, (3, 3), "conv3", "bn3", deterministic, padding=1)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.relu(nn.Dense(64, name="fc0")(x))
        x = nn.Dropout(0.2, deterministic=deterministic)(x)
        x = nn.relu(nn.Dense(32, name="fc1")(x))
        x = nn.Dropout(0.2, deterministic=deterministic)(x)
        raw = nn.Dense(1, name="fc2")(x)
        return self.out_min + (self.out_max - self.out_min) * jax.nn.sigmoid(raw)


class EnhancedDepthImageRatioPredictor(nn.Module):
    """E-DSAM ratio predictor used by version 0.4.0 (reference :1363-1487):
    3/5/7 multi-scale convs + channel attention + conv/pool tower + MLP."""

    out_min: float = 0.01
    out_max: float = 0.5

    @nn.compact
    def __call__(self, depth, deterministic: bool = True):
        # The three multi-scale convs read a 3-channel image; run them as ONE
        # merged im2col matmul (zero-padded kernels, ops/conv.py) — the naive
        # conv lowering pads C_in 3->128 and wastes ~43x MXU work (6.4 ms ->
        # sub-ms at 640x480). Params are nn.Conv-identical per branch.
        cin = depth.shape[-1]
        kernels, biases = zip(
            *(
                ConvParams(64, (k, k), name=f"scale{i}_conv")(cin)
                for i, k in enumerate((3, 5, 7))
            )
        )
        merged = merge_multiscale_kernels(list(kernels))
        bias = jnp.concatenate(biases)
        # One 192-channel BN instead of three per-branch 64-channel BNs:
        # BatchNorm statistics are per-channel over (B, H, W), so normalizing
        # the concatenated branches jointly is bit-identical math in both
        # train and eval — but the slice -> bn -> relu -> re-concat chain cost
        # ~0.9 ms of full-res layout copies per 640x480 frame (HLO profile
        # 2026-08-20: copy.3834 + pad_maximum_fusion on bf16[1,480,640,192]).
        # In eval the BN affine folds into the merged kernel (see _conv_bn_relu).
        fold = deterministic and not self.is_initializing() and _fold_bn()
        if fold:
            a, c = _bn_affine(self, "scales_bn")
            merged = (merged.astype(jnp.float32) * a).astype(depth.dtype)
            bias = (bias.astype(jnp.float32) * a + c).astype(depth.dtype)
        if os.environ.get("RGBDSEG_EDSAM_CONV") == "conv":
            # A/B twin: XLA's native conv lowering of the merged 7x7 C_in=3
            # conv (vs the default shifted-slice im2col matmul).
            y = jax.lax.conv_general_dilated(
                depth,
                merged.astype(depth.dtype),
                (1, 1),
                "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bias.astype(depth.dtype)
        else:
            y = conv2d_lowcin(depth, merged) + bias.astype(depth.dtype)
        if fold:
            x = nn.relu(y)
        else:
            x = nn.relu(_bn("scales_bn", deterministic)(y))
        if fold and os.environ.get("RGBDSEG_EDSAM_FLAT") == "1":
            # A/B variant: run the 1x1 fusion/attention chain as flat channel
            # matmuls on (B*H*W, C) — one layout world from the im2col dot to
            # extract_conv0, avoiding the dot<->conv layout copies the profile
            # attributes to this chain (0.44 + 0.40 ms at 640x480).
            bsz, hh, ww, _ = x.shape
            z = x.reshape(-1, x.shape[-1])
            kf, bf = ConvParams(128, (1, 1), name="fusion_conv")(z.shape[-1])
            a2, c2 = _bn_affine(self, "fusion_bn")
            km = (kf.reshape(-1, 128).astype(jnp.float32) * a2).astype(z.dtype)
            z = nn.relu(z @ km + (bf.astype(jnp.float32) * a2 + c2).astype(z.dtype))
            k0, b0 = ConvParams(64, (1, 1), name="attn_conv0")(128)
            att = nn.relu(z @ k0.reshape(-1, 64).astype(z.dtype) + b0.astype(z.dtype))
            k1, b1 = ConvParams(128, (1, 1), name="attn_conv1")(64)
            att = jax.nn.sigmoid(att @ k1.reshape(-1, 128).astype(z.dtype) + b1.astype(z.dtype))
            x = (z * att).reshape(bsz, hh, ww, 128)
        else:
            x = _conv_bn_relu(self, x, 128, (1, 1), "fusion_conv", "fusion_bn", deterministic)

            a = nn.relu(nn.Conv(64, (1, 1), name="attn_conv0")(x))
            a = jax.nn.sigmoid(nn.Conv(128, (1, 1), name="attn_conv1")(a))
            x = x * a

        x = _conv_bn_relu(
            self, x, 256, (3, 3), "extract_conv0", "extract_bn0", deterministic, padding=1
        )
        x = adaptive_avg_pool2d(x, (4, 4))
        x = _conv_bn_relu(
            self, x, 512, (3, 3), "extract_conv1", "extract_bn1", deterministic, padding=1
        )
        x = jnp.mean(x, axis=(1, 2))

        x = nn.relu(nn.Dense(128, name="fc0")(x))
        x = nn.Dropout(0.3, deterministic=deterministic)(x)
        x = nn.relu(nn.Dense(64, name="fc1")(x))
        x = nn.Dropout(0.2, deterministic=deterministic)(x)
        x = nn.relu(nn.Dense(32, name="fc2")(x))
        raw = nn.Dense(1, name="fc3")(x)
        return self.out_min + (self.out_max - self.out_min) * jax.nn.sigmoid(raw)


class IntrinsicsPredictor(nn.Module):
    """Gray depth image -> (fx, fy, cx, cy), each (B,) (reference :900-1006)."""

    @nn.compact
    def __call__(self, gray_depth):
        # gray_depth: (B, H, W, 1)
        h, w = gray_depth.shape[1:3]
        x = gray_depth
        for i, ch in enumerate((32, 64, 128)):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)), name=f"conv{i}")(x)
            x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        x = nn.relu(nn.Dense(64, name="fc0")(x))
        x = nn.relu(nn.Dense(32, name="fc1")(x))
        raw = nn.Dense(4, name="fc2")(x)
        fx = jnp.exp(raw[:, 0])
        fy = jnp.exp(raw[:, 1])
        cx = jax.nn.sigmoid(raw[:, 2]) * w
        cy = jax.nn.sigmoid(raw[:, 3]) * h
        return fx, fy, cx, cy


class DepthGradientInjection(nn.Module):
    """DGGM v1: per-scale bilinear-downsampled gradient concat + 1x1 conv fusion."""

    @nn.compact
    def __call__(self, color_maps, gradient):
        out = []
        for i, c in enumerate(color_maps):
            g = resize_bilinear(gradient, c.shape[1:3])
            m = jnp.concatenate([c, g], axis=-1)
            m = nn.Conv(c.shape[-1], (1, 1), name=f"fusion{i}")(m)
            out.append(nn.relu(m))
        return out


class DepthGradientInjectionWithMask(nn.Module):
    """DGGM v2: + nearest-downsampled binary validity mask channel."""

    @nn.compact
    def __call__(self, color_maps, gradient, mask):
        out = []
        for i, c in enumerate(color_maps):
            g = resize_bilinear(gradient, c.shape[1:3])
            m = resize_nearest(mask, c.shape[1:3])
            merged = jnp.concatenate([c, g, m], axis=-1)
            merged = nn.Conv(c.shape[-1], (1, 1), name=f"fusion{i}")(merged)
            out.append(nn.relu(merged))
        return out


class DepthGradientInjectionResidual(nn.Module):
    """DGGM v3 (final): gated (grad x mask) -> 1x1 conv projection -> additive
    residual fusion per scale."""

    @nn.compact
    def __call__(self, color_maps, gradient, mask):
        out = []
        for i, c in enumerate(color_maps):
            g = resize_bilinear(gradient, c.shape[1:3])
            m = resize_nearest(mask, c.shape[1:3])
            gated = g * m
            enh = nn.Conv(c.shape[-1], (1, 1), name=f"enhance{i}")(gated)
            enh = nn.relu(enh)
            out.append(c + enh)
        return out
