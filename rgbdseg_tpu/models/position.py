"""Sine position embeddings, parity with Mask2FormerSinePositionEmbedding
(HF modeling_mask2former.py:842-885, normalize=True, scale=2π, eps=1e-6).

Returns NHWC (H, W, 2 * num_pos_feats) with [pos_y, pos_x] channel order, no
batch dim (broadcast by callers); the mask-free path (all pixels valid) is the
only one the reference ever exercises (masks are all-zero in the HF pixel
decoder, modeling_mask2former.py:1308-1310).

`zero` should be a traced scalar (e.g. ``f.ravel()[0] * 0`` from a traced
feature map): adding it keeps the whole computation inside the compiled graph
instead of eagerly materializing an (H, W, 2F) literal at trace time. At
640×480 the literals for all levels total ~50 MB, which (a) is built by eager
per-op dispatch — pathologically slow over the remote-TPU tunnel — and (b)
overflows the tunnel's remote-compile request limit (HTTP 413).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def sine_position_embedding(
    h: int,
    w: int,
    num_pos_feats: int = 128,
    temperature: float = 10000.0,
    zero=0.0,
) -> jnp.ndarray:
    eps = 1e-6
    scale = 2 * math.pi
    y = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None].repeat(w, 1) + zero
    x = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :].repeat(h, 0) + zero
    y = y / (h + eps) * scale
    x = x / (w + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)

    pos_x = x[:, :, None] / dim_t
    pos_y = y[:, :, None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[:, :, 0::2]), jnp.cos(pos_x[:, :, 1::2])], axis=3).reshape(h, w, -1)
    pos_y = jnp.stack([jnp.sin(pos_y[:, :, 0::2]), jnp.cos(pos_y[:, :, 1::2])], axis=3).reshape(h, w, -1)
    return jnp.concatenate([pos_y, pos_x], axis=-1)
