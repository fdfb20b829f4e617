"""Swin Transformer backbone (Swin-T defaults), TPU-native Flax implementation.

Capability parity with the reference's encoder (HF SwinBackbone, consumed via
`load_backbone` in custom_model.py:13; contract documented in
experiments/architecture/architecture_change.md:39-41): input (B, H, W, 3) ->
4 feature maps at strides 4/8/16/32 with channels [C, 2C, 4C, 8C], each taken
*before* the stage's patch-merging downsample and passed through a per-stage
LayerNorm.

Implementation notes (TPU-first):
- NHWC activations throughout; window attention is a batched dense attention
  over (B * num_windows, window², C) — XLA maps the matmuls straight onto the
  MXU. Shifted windows use jnp.roll + a precomputed additive mask.
- `always_partition` semantics of the HF backbone: the window size and shift
  are NOT shrunk for small feature maps; maps are zero-padded up to window
  multiples (matching HF SwinLayer.maybe_pad).
- Stochastic depth (drop_path) is linearly scheduled over all blocks and only
  active when `deterministic=False`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import SwinConfig
from ..ops.conv import conv2d_patchify
from .common import ConvParams


def drop_path(x: jnp.ndarray, rate: float, deterministic: bool, rng) -> jnp.ndarray:
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
    return x / keep * mask


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B * nH * nW, ws*ws, C); H, W must be multiples of ws."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_unpartition(x: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    b = x.shape[0] // ((h // ws) * (w // ws))
    c = x.shape[-1]
    x = x.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    coords = coords.reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)  # (ws², ws²)


def _shift_attn_mask(hp: int, wp: int, ws: int, shift: int, zero) -> jnp.ndarray:
    """Standard Swin shifted-window attention mask: (nW, ws², ws²) additive.

    Region id per axis: [0, n-ws) -> 0, [n-ws, n-shift) -> 1, [n-shift, n) -> 2;
    cell id = 3*row_region + col_region; pairs with differing ids get -100
    (matches the reference stack's slice-assignment construction,
    HF modeling_swin get_attn_mask). `zero` is a traced int32 scalar so the
    (nW, ws², ws²) mask is computed in-graph instead of being embedded as a
    multi-MB literal (the remote-compile tunnel caps request size).
    """
    ph = jnp.arange(hp, dtype=jnp.int32)
    rh = (ph >= hp - ws).astype(jnp.int32) + (ph >= hp - shift).astype(jnp.int32)
    pw = jnp.arange(wp, dtype=jnp.int32)
    rw = (pw >= wp - ws).astype(jnp.int32) + (pw >= wp - shift).astype(jnp.int32)
    img = rh[:, None] * 3 + rw[None, :] + zero
    win = img.reshape(hp // ws, ws, wp // ws, ws).transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    diff = win[:, None, :] - win[:, :, None]
    return jnp.where(diff != 0, -100.0, 0.0).astype(jnp.float32)


class _DenseParams(nn.Module):
    """Declare nn.Dense-compatible (kernel, bias) without applying them, so the
    caller can fuse several projections into one matmul while keeping the
    checkpoint tree identical to separate Dense modules."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,)) if self.use_bias else None
        return kernel, bias


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0

    @nn.compact
    def __call__(self, x, attn_mask, deterministic: bool = True):
        # x: (nB, N, C) with N = ws²; attn_mask: (nW, N, N) or None.
        nb, n, c = x.shape
        hd = c // self.num_heads
        # Fused QKV: one (C, 3C) matmul instead of three (C, C) ones — x is
        # streamed from HBM once and the MXU sees a single wider tile. Params
        # stay split as query/key/value to match the HF checkpoint layout.
        wq, bq = _DenseParams(c, self.qkv_bias, name="query")(c)
        wk, bk = _DenseParams(c, self.qkv_bias, name="key")(c)
        wv, bv = _DenseParams(c, self.qkv_bias, name="value")(c)
        w = jnp.concatenate([wq, wk, wv], axis=1)
        # Match nn.Dense's promote_dtype(x, kernel) semantics.
        ct = jnp.result_type(x.dtype, w.dtype)
        qkv = x.astype(ct) @ w.astype(ct)
        if self.qkv_bias:
            qkv = qkv + jnp.concatenate([bq, bk, bv]).astype(ct)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        # Heads stay in the (nb, n, heads, hd) layout produced by the QKV
        # matmul — the einsums below carry the head axis as a batch dim
        # directly, so no explicit (0, 2, 1, 3) transpose copies are emitted
        # (the frame profile showed 2 x ~0.05 ms of pure head-transpose copies
        # per stage-0 block).
        q = q.reshape(nb, n, self.num_heads, hd)
        k = k.reshape(nb, n, self.num_heads, hd)
        v = v.reshape(nb, n, self.num_heads, hd)
        # Score/bias/softmax numerics are f32 (the shift mask's -100 additive
        # bias and softmax want full range); under bf16 mixed precision the
        # score MATERIALIZATION is bf16 (dtype-keyed, like the tent stage-1 in
        # ops/kernels/deformable.py) — the (nB, heads, 49, 49) f32 score
        # tensors were pure HBM traffic, and bf16 rounding of the logits is
        # within the model's existing bf16 noise. The f32 path is unchanged
        # (HF parity tests run there). Probabilities cast back to the compute
        # dtype for the PV matmul: without that cast, the f32 shift mask
        # silently promoted every shifted block — and everything downstream,
        # i.e. the whole model — to f32 under bf16 mixed precision.
        score_dtype = jnp.bfloat16 if v.dtype == jnp.bfloat16 else jnp.float32
        attn = jnp.einsum(
            "bqhd,bkhd->bhqk", q * (hd**-0.5), k, preferred_element_type=score_dtype
        )

        rpb_table = self.param(
            "relative_position_bias_table",
            nn.initializers.zeros,
            ((2 * self.window_size - 1) ** 2, self.num_heads),
        )
        rpi = jnp.asarray(_relative_position_index(self.window_size).reshape(-1))
        bias = rpb_table[rpi].reshape(n, n, self.num_heads).transpose(2, 0, 1)
        attn = attn.astype(jnp.float32) + bias[None].astype(jnp.float32)

        if attn_mask is not None:
            nw = attn_mask.shape[0]
            attn = attn.reshape(nb // nw, nw, self.num_heads, n, n)
            attn = attn + attn_mask[None, :, None]
            attn = attn.reshape(nb, self.num_heads, n, n)

        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(nb, n, c)
        out = nn.Dense(c, name="proj")(out)
        return out


class SwinBlock(nn.Module):
    cfg: SwinConfig
    dim: int
    num_heads: int
    shift: int
    drop_path_rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # x: (B, H, W, C)
        b, h, w, c = x.shape
        ws = self.cfg.window_size
        shift = self.shift

        shortcut = x
        x = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps, name="norm1")(x)

        pad_h = (ws - h % ws) % ws
        pad_w = (ws - w % ws) % ws
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp = h + pad_h, w + pad_w

        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            attn_mask = _shift_attn_mask(hp, wp, ws, shift, (x.ravel()[0] * 0).astype(jnp.int32))
        else:
            attn_mask = None

        xw = window_partition(x, ws)
        xw = WindowAttention(
            dim=self.dim,
            num_heads=self.num_heads,
            window_size=ws,
            qkv_bias=self.cfg.qkv_bias,
            name="attention",
        )(xw, attn_mask, deterministic=deterministic)
        x = window_unpartition(xw, ws, hp, wp)

        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        if pad_h or pad_w:
            x = x[:, :h, :w]

        if not deterministic and self.drop_path_rate > 0:
            x = drop_path(x, self.drop_path_rate, deterministic, self.make_rng("droppath"))
        x = shortcut + x

        shortcut = x
        y = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.cfg.mlp_ratio), name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="mlp_fc2")(y)
        if not deterministic and self.drop_path_rate > 0:
            y = drop_path(y, self.drop_path_rate, deterministic, self.make_rng("droppath"))
        return shortcut + y


class PatchMerging(nn.Module):
    cfg: SwinConfig
    dim: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps, name="norm")(x)
        x = nn.Dense(2 * self.dim, use_bias=False, name="reduction")(x)
        return x


class SwinBackbone(nn.Module):
    """Returns 4 NHWC feature maps (strides 4/8/16/32), LayerNorm'ed per stage."""

    cfg: SwinConfig

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray, deterministic: bool = True):
        cfg = self.cfg
        x = pixel_values
        b, h, w, _ = x.shape
        ps = cfg.patch_size
        pad_h = (ps - h % ps) % ps
        pad_w = (ps - w % ps) % ps
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        kernel, bias = ConvParams(cfg.embed_dim, (ps, ps), name="patch_embed")(x.shape[-1])
        x = conv2d_patchify(x, kernel, bias)
        if cfg.patch_norm:
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="patch_norm")(x)

        total_blocks = sum(cfg.depths)
        dpr = np.linspace(0, cfg.drop_path_rate, total_blocks)
        features = []
        block_idx = 0
        dim = cfg.embed_dim
        for stage in range(cfg.num_layers):
            for blk in range(cfg.depths[stage]):
                shift = 0 if blk % 2 == 0 else cfg.window_size // 2
                x = SwinBlock(
                    cfg=cfg,
                    dim=dim,
                    num_heads=cfg.num_heads[stage],
                    shift=shift,
                    drop_path_rate=float(dpr[block_idx]),
                    name=f"stage{stage}_block{blk}",
                )(x, deterministic=deterministic)
                block_idx += 1
            feat = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name=f"out_norm{stage}")(x)
            features.append(feat)
            if stage < cfg.num_layers - 1:
                x = PatchMerging(cfg=cfg, dim=dim, name=f"downsample{stage}")(x)
                dim *= 2
        return tuple(features)
