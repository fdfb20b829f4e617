"""Pixel decoder: multi-scale deformable-attention encoder + FPN lateral fusion.

Capability parity with Mask2FormerPixelDecoder (HF modeling_mask2former.py:
1206-1387; I/O contract recorded by the reference in
experiments/architecture/architecture_change.md:49-51): 4 backbone maps ->
(mask_features at stride 4, three 256-d maps at strides 32/16/8).

TPU-native formulation of deformable attention: instead of the reference
stack's CUDA `ms_deform_attn` kernel, sampling is expressed as a batched
bilinear gather (`grid_sample_bilinear`) per level plus an einsum reduction —
XLA fuses the gathers and maps the projections onto the MXU. Levels are
processed with static shapes (the three level resolutions are compile-time
constants).
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig
from ..ops.kernels import use_pallas
from ..ops.kernels.deformable import (
    tent_sample_level,
    tent_sample_level_band,
    tent_sample_level_xla,
    tent_sample_level_xla_separable,
)
from ..ops.resize import grid_sample_bilinear, resize_bilinear
from .position import sine_position_embedding


def _offset_bias_init(num_heads: int, n_levels: int, n_points: int):
    """HF/DeformableDETR sampling-offsets bias init: per-head unit directions
    scaled by point index (modeling_deformable_detr _reset_parameters parity);
    the kernel is zero-initialized so initial sampling follows this grid."""

    def init(key, shape, dtype=jnp.float32):
        thetas = np.arange(num_heads, dtype=np.float64) * (2.0 * np.pi / num_heads)
        grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # (H, 2)
        grid = grid / np.abs(grid).max(-1, keepdims=True)
        grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
        for i in range(n_points):
            grid[:, :, i, :] *= i + 1
        return jnp.asarray(grid.reshape(-1), dtype)

    return init


class DeformableAttention(nn.Module):
    """Multi-scale deformable self-attention (n_levels levels, n_points points)."""

    cfg: ModelConfig
    # levels with hw <= this use the tent-matmul sampling path (see __call__);
    # RGBDSEG_TENT_HW_MAX overrides for A/B measurement.
    _TENT_HW_MAX = int(os.environ.get("RGBDSEG_TENT_HW_MAX", "8192"))

    @nn.compact
    def __call__(self, hidden_states, position_embeddings, reference_points, spatial_shapes):
        cfg = self.cfg
        d = cfg.feature_size
        nh = cfg.num_attention_heads
        nl = len(spatial_shapes)
        npts = cfg.deformable_points
        hd = d // nh
        b, l, _ = hidden_states.shape

        with_pos = hidden_states + position_embeddings
        value = nn.Dense(d, kernel_init=nn.initializers.xavier_uniform(), name="value_proj")(hidden_states)
        value = value.reshape(b, l, nh, hd)

        offsets = nn.Dense(
            nh * nl * npts * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=_offset_bias_init(nh, nl, npts),
            name="sampling_offsets",
        )(with_pos)
        offsets = offsets.reshape(b, l, nh, nl, npts, 2)
        weights = nn.Dense(nh * nl * npts, kernel_init=nn.initializers.zeros, name="attention_weights")(with_pos)
        weights = jax.nn.softmax(weights.reshape(b, l, nh, nl * npts), axis=-1)
        weights = weights.reshape(b, l, nh, nl, npts)

        # offset normalizer is (w, h) per level (HF modeling_mask2former.py:963-972)
        # Location arithmetic stays f32 even when activations are bf16: pixel
        # coordinates reach O(100) where bf16 spacing is ~1px.
        normalizer = jnp.asarray([[w, h] for (h, w) in spatial_shapes], jnp.float32)
        locations = (
            reference_points.astype(jnp.float32)[:, :, None, :, None, :]
            + offsets.astype(jnp.float32) / normalizer[None, None, None, :, None, :]
        )  # (B, L, nh, nl, P, 2) in [0, 1] (x, y)

        # Per level, weighted-sum of bilinear samples. Two strategies:
        # - small levels (hw <= _TENT_HW_MAX): bilinear sampling with zeros
        #   padding is EXACTLY a tent-weight contraction
        #   sum_{y,x} relu(1-|gy-y|) relu(1-|gx-x|) V[y,x], so the whole
        #   (sample + attention-weight) reduction rides the MXU with no
        #   gather at all. DEFAULT formulation: x-first separable contraction
        #   (tent_sample_level_xla_separable) — contract the x-tents against V
        #   as a matmul, then do the attention-weighted y-tent reduce; measured
        #   49.4 vs 36.6 img/s inference and 7.18 vs 6.77 img/s train against
        #   the fused-P variant (PERF.md 2026-08-18). RGBDSEG_TENT_SEPARABLE=0
        #   opts back to the fused P (bh, L, hw) @ V (bh, hw, hd) construction
        #   (tent_sample_level_xla, kept as the golden twin), which is still
        #   faster than gather (3.9x) and than the hand-written Pallas version
        #   of the same tiling (ops/kernels/deformable.py — opt-in via
        #   RGBDSEG_PALLAS, kept for ablation; measurements in
        #   ops/kernels/__init__.py).
        # - large levels: patch gather (ops.resize.grid_sample_bilinear);
        #   TPU gather costs ~4ns/row regardless of formulation, so the tent
        #   matmul wins only while hw stays small.
        # Accumulate per level instead of stacking a 6-D intermediate.
        level_start = np.cumsum([0] + [h * w for h, w in spatial_shapes])
        wt = weights.transpose(0, 2, 1, 3, 4)  # (B, nh, L, nl, P)
        out = jnp.zeros((b, nh, l, hd), hidden_states.dtype)
        for lvl, (h, w) in enumerate(spatial_shapes):
            v = value[:, level_start[lvl] : level_start[lvl + 1]]  # (B, hw, nh, hd)
            coords = locations[:, :, :, lvl]  # (B, L, nh, P, 2), f32
            coords = coords.transpose(0, 2, 1, 3, 4).reshape(b * nh, l, npts, 2)
            aw = wt[:, :, :, lvl].reshape(b * nh, l, npts)  # (bh, L, P)
            if h * w <= self._TENT_HW_MAX:
                vbh = v.transpose(0, 2, 1, 3).reshape(b * nh, h * w, hd)
                gx = coords[..., 0] * w - 0.5  # (bh, L, P) pixel coords
                gy = coords[..., 1] * h - 0.5
                if use_pallas("deform_band"):
                    sampled = tent_sample_level_band(gx, gy, aw, vbh, h, w, False)
                elif use_pallas("deform"):
                    sampled = tent_sample_level(gx, gy, aw, vbh, h, w, False)
                elif os.environ.get("RGBDSEG_TENT_SEPARABLE") == "0":
                    sampled = tent_sample_level_xla(gx, gy, aw, vbh, h, w)
                elif os.environ.get("RGBDSEG_TENT_REMAT", "1") == "1":
                    # Checkpoint JUST the tent sampling: without it the
                    # backward saves the separable formulation's
                    # (BH, L, P, h, hd) stage-1 intermediate (774 MB bf16 at
                    # 640x480 level 0) and re-reads it in 2-3 separate grad
                    # fusions — profiled ~2.5 ms/layer of pure HBM traffic.
                    # Recomputing the tents in the backward lets XLA fuse the
                    # stage-1 operand generation into each grad matmul
                    # instead (same trick as the forward). Measured
                    # 2026-08-21: train 10.06 -> 11.12 img/s (device 90.9 ->
                    # 81.3 ms/step) on top of the no-remat encoder default.
                    sampled = jax.checkpoint(
                        lambda a, b_, c, d: tent_sample_level_xla_separable(a, b_, c, d, h, w)
                    )(gx, gy, aw, vbh)
                else:
                    sampled = tent_sample_level_xla_separable(gx, gy, aw, vbh, h, w)
                out = out + sampled.reshape(b, nh, l, hd).astype(out.dtype)
            else:
                vbh = v.transpose(0, 2, 1, 3).reshape(b * nh, h, w, hd)
                sampled = grid_sample_bilinear(vbh, coords.reshape(b * nh, l * npts, 2))
                sampled = sampled.reshape(b, nh, l, npts, hd)
                out = out + jnp.einsum("bhlp,bhlpd->bhld", wt[:, :, :, lvl], sampled)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, d)
        return nn.Dense(d, kernel_init=nn.initializers.xavier_uniform(), name="output_proj")(out)


class EncoderLayer(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, x, pos, reference_points, spatial_shapes):
        cfg = self.cfg
        y = DeformableAttention(cfg, name="self_attn")(x, pos, reference_points, spatial_shapes)
        x = nn.LayerNorm(name="self_attn_layer_norm")(x + y)
        y = nn.Dense(cfg.encoder_feedforward_dim, name="fc1")(x)
        y = nn.relu(y)
        y = nn.Dense(cfg.feature_size, name="fc2")(y)
        x = nn.LayerNorm(name="final_layer_norm")(x + y)
        return x


def reference_points_for_shapes(spatial_shapes, zero=0.0) -> jnp.ndarray:
    """(L_total, 2) normalized (x, y) half-pixel reference points (valid ratios = 1).

    `zero`: traced scalar so the points are computed in-graph (see position.py).
    """
    pts = []
    for h, w in spatial_shapes:
        ry = (jnp.arange(h, dtype=jnp.float32) + 0.5 + zero) / h
        rx = (jnp.arange(w, dtype=jnp.float32) + 0.5 + zero) / w
        gy, gx = jnp.meshgrid(ry, rx, indexing="ij")
        pts.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
    return jnp.concatenate(pts, axis=0)


class PixelDecoder(nn.Module):
    """features (4 NHWC maps, low->high stride) -> (mask_features, 3 multi-scale maps)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, features):
        cfg = self.cfg
        d = cfg.feature_size
        nl = cfg.num_feature_levels

        # Input projections on the nl smallest maps, highest stride first.
        level_feats = features[::-1][:nl]  # [s32, s16, s8]
        embeds, poses, shapes = [], [], []
        level_embed = self.param("level_embed", nn.initializers.normal(1.0), (nl, d))
        for i, f in enumerate(level_feats):
            x = nn.Conv(d, (1, 1), name=f"input_proj{i}_conv")(f)
            x = nn.GroupNorm(num_groups=32, name=f"input_proj{i}_norm")(x)
            b, h, w, _ = x.shape
            embeds.append(x.reshape(b, h * w, d))
            # traced zero: keeps the (H, W, d) embedding in-graph, not a literal.
            # Cast to the compute dtype: the f32 sine embedding would otherwise
            # promote `hidden + pos` (and the offsets/weights projections fed
            # from it) to f32 under bf16 mixed precision.
            pos = sine_position_embedding(h, w, d // 2, zero=x.ravel()[0] * 0).astype(x.dtype)
            poses.append(pos.reshape(1, h * w, d) + level_embed[i][None, None])
            shapes.append((h, w))

        x = jnp.concatenate(embeds, axis=1)
        pos = jnp.concatenate(poses, axis=1)
        ref = reference_points_for_shapes(shapes, zero=x.ravel()[0] * 0)[None, :, None, :].repeat(nl, 2)

        # Encoder-layer remat policy. DEFAULT: no remat ("0") — measured
        # 2026-08-21 on v5e at 640x480: the pixel-decoder backward was the
        # train step's largest block (39 ms profiled) and ~9 ms of it was
        # recomputing the forward; RGBDSEG_REMAT=0 vs 1 measures 90.9 vs
        # 99.2 ms/step device (10.06 vs 9.36 img/s), and memory fits through
        # B=4 (488.6 ms/step, no OOM; the separable tent path never
        # materializes the (B*heads, L, hw) fused-P matrices that originally
        # motivated remat). RGBDSEG_REMAT=1 restores full per-layer remat
        # (flat memory for larger batches/deeper configs), "dots" keeps
        # matmul outputs only (checkpoint_dots_with_no_batch_dims; measured
        # worse than both, PERF.md train ledger).
        remat_mode = os.environ.get("RGBDSEG_REMAT", "0")
        if remat_mode == "0":
            layer = EncoderLayer
        elif remat_mode == "dots":
            layer = nn.remat(
                EncoderLayer,
                static_argnums=(4,),
                policy=jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims,
            )
        else:
            layer = nn.remat(EncoderLayer, static_argnums=(4,))
        for li in range(cfg.encoder_layers):
            x = layer(cfg, name=f"layer{li}")(x, pos, ref, shapes)

        # Split back into per-level maps.
        outputs = []
        start = 0
        b = x.shape[0]
        for h, w in shapes:
            outputs.append(x[:, start : start + h * w].reshape(b, h, w, d))
            start += h * w

        # FPN levels between min transformer stride and common stride.
        stride = min(cfg.feature_strides[-nl:])
        num_fpn = int(np.log2(stride) - np.log2(cfg.common_stride))
        fpn_feats = list(features[:num_fpn])[::-1]  # highest-of-the-low strides first
        for i, f in enumerate(fpn_feats):
            lateral = nn.Conv(d, (1, 1), use_bias=False, name=f"adapter{i}_conv")(f)
            lateral = nn.GroupNorm(num_groups=32, name=f"adapter{i}_norm")(lateral)
            up = resize_bilinear(outputs[-1], lateral.shape[1:3])
            y = lateral + up
            y = nn.Conv(d, (3, 3), padding=1, use_bias=False, name=f"fpn{i}_conv")(y)
            y = nn.GroupNorm(num_groups=32, name=f"fpn{i}_norm")(y)
            y = nn.relu(y)
            outputs.append(y)

        mask_features = nn.Conv(cfg.mask_feature_size, (1, 1), name="mask_projection")(outputs[-1])
        return mask_features, tuple(outputs[:nl])
