"""Masked-attention transformer decoder + prediction heads.

Capability parity with Mask2FormerTransformerModule / MaskedAttentionDecoder /
MaskPredictor (HF modeling_mask2former.py:1769-2095; contract recorded by the
reference in experiments/architecture/architecture_change.md:58-61):
100 learned queries, `decoder_layers` (10) prediction points = 1 initial + 9
blocks of (masked cross-attention at level idx%3, self-attention, FFN),
post-norm, with per-layer mask predictions that also produce the next layer's
attention mask (sigmoid < 0.5, fully-masked queries get their mask disabled).

TPU notes: attention is batched dense attention (Q=100 queries vs at most a few
thousand keys per level) — the mask is an additive bias so the whole decoder is
a single fused XLA program; no dynamic shapes.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..ops.kernels import use_pallas
from ..ops.kernels.masked_attention import (
    masked_cross_attention,
    masked_cross_attention_xla,
)
from ..ops.resize import resize_bilinear
from .position import sine_position_embedding

NEG_INF = -1e9


def _split_heads(t, nh):
    b, l, d = t.shape
    return t.reshape(b, l, nh, d // nh).transpose(0, 2, 1, 3)


def _merge_heads(t):
    b, nh, l, hd = t.shape
    return t.transpose(0, 2, 1, 3).reshape(b, l, nh * hd)


class MultiheadAttention(nn.Module):
    """Dense MHA with additive mask; parity with torch nn.MultiheadAttention
    (single in-proj semantics) as used by the masked cross-attention.

    `attn_mask` is (raw resized mask logits, all-blocked flags); the additive
    bias is built from the logits with a single compare (sigmoid(x) < 0.5 <=>
    x < 0). A fused flash-style Pallas kernel exists for this
    (ops/kernels/masked_attention.py, opt-in via RGBDSEG_PALLAS) but the XLA
    formulation measures faster at Q=100 (see ops/kernels/__init__.py).
    """

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, query, key, value, attn_mask=None):
        nh = self.num_heads
        hd = self.dim // nh
        q = nn.Dense(self.dim, name="q_proj")(query)
        k = nn.Dense(self.dim, name="k_proj")(key)
        v = nn.Dense(self.dim, name="v_proj")(value)
        q, k, v = _split_heads(q, nh), _split_heads(k, nh), _split_heads(v, nh)
        q = q * (hd**-0.5)
        if attn_mask is not None:
            mask_logits, all_blocked = attn_mask
            if use_pallas("mca"):
                out = masked_cross_attention(q, k, v, mask_logits, all_blocked, False)
            else:
                out = masked_cross_attention_xla(q, k, v, mask_logits, all_blocked)
        else:
            # Softmax in f32, probabilities back in the compute dtype (same
            # policy as masked_cross_attention_xla).
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        return nn.Dense(self.dim, name="out_proj")(_merge_heads(out))


class DecoderLayer(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, hidden, query_pos, memory, memory_pos, attn_mask):
        cfg = self.cfg
        d = cfg.hidden_dim
        # Masked cross-attention (post-norm order, HF forward_post :1595-1652).
        y = MultiheadAttention(d, cfg.num_attention_heads, name="cross_attn")(
            hidden + query_pos, memory + memory_pos, memory, attn_mask
        )
        hidden = nn.LayerNorm(name="cross_attn_layer_norm")(hidden + y)
        # Self-attention: q,k get pos embeddings; v is the raw hidden state.
        y = MultiheadAttention(d, cfg.num_attention_heads, name="self_attn")(
            hidden + query_pos, hidden + query_pos, hidden, None
        )
        # NOTE parity detail: HF Mask2FormerAttention adds pos to k via the same
        # tensor as q; v uses the original hidden state (modeling :1490-1499).
        hidden = nn.LayerNorm(name="self_attn_layer_norm")(hidden + y)
        y = nn.Dense(cfg.dim_feedforward, name="fc1")(hidden)
        y = nn.relu(y)
        y = nn.Dense(d, name="fc2")(y)
        hidden = nn.LayerNorm(name="final_layer_norm")(hidden + y)
        return hidden


class MaskPredictor(nn.Module):
    """MLP mask embedder + einsum with pixel embeddings; also emits the
    attention bias for the next decoder layer (HF :1986-2024)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, intermediate, mask_features, target_hw):
        d = self.cfg.hidden_dim
        x = intermediate
        x = nn.relu(nn.Dense(d, name="mask_embedder0")(x))
        x = nn.relu(nn.Dense(d, name="mask_embedder1")(x))
        x = nn.Dense(self.cfg.mask_feature_size, name="mask_embedder2")(x)
        # (B, Q, C) x (B, H, W, C) -> (B, Q, H, W)
        outputs_mask = jnp.einsum("bqc,bhwc->bqhw", x, mask_features)

        th, tw = target_hw
        b, q, h, w = outputs_mask.shape
        am = resize_bilinear(outputs_mask.transpose(0, 2, 3, 1), (th, tw)).transpose(0, 3, 1, 2)
        # Raw resized logits; sigmoid(x) < 0.5 <=> x < 0, so the threshold is
        # applied directly on logits (in-kernel on TPU). True = blocked.
        am = am.reshape(b, q, th * tw)
        # Disable masking for queries whose mask blocks everything (HF :1880-1882).
        all_blocked = jnp.all(am < 0.0, axis=-1)  # (B, Q)
        attn_mask = (jax.lax.stop_gradient(am), all_blocked)
        return outputs_mask, attn_mask


class TransformerModule(nn.Module):
    """multi_scale_features + mask_features -> per-layer (class_logits, mask_logits)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, multi_scale_features, mask_features, deterministic: bool = True):
        cfg = self.cfg
        d = cfg.hidden_dim
        nl = cfg.num_feature_levels
        b = mask_features.shape[0]

        level_embed = self.param("level_embed", nn.initializers.normal(1.0), (nl, d))
        queries_embedder = self.param("queries_embedder", nn.initializers.normal(1.0), (cfg.num_queries, d))
        queries_features = self.param("queries_features", nn.initializers.normal(1.0), (cfg.num_queries, d))

        memories, memory_poses, sizes = [], [], []
        for i in range(nl):
            f = multi_scale_features[i]
            _, h, w, _ = f.shape
            sizes.append((h, w))
            memories.append(f.reshape(b, h * w, d) + level_embed[i][None, None])
            # traced zero: keeps the (H, W, d) embedding in-graph, not a
            # literal; cast so the f32 sine embedding doesn't promote
            # `memory + memory_pos` to f32 under bf16 mixed precision.
            memory_poses.append(
                sine_position_embedding(h, w, d // 2, zero=f.ravel()[0] * 0)
                .astype(f.dtype)
                .reshape(1, h * w, d)
            )

        query_pos = jnp.broadcast_to(queries_embedder[None], (b, cfg.num_queries, d))
        hidden = jnp.broadcast_to(queries_features[None], (b, cfg.num_queries, d))

        final_norm = nn.LayerNorm(name="decoder_layernorm")
        mask_predictor = MaskPredictor(cfg, name="mask_predictor")
        class_predictor = nn.Dense(cfg.num_labels + 1, name="class_predictor")

        class_logits_all, mask_logits_all = [], []
        intermediate = final_norm(hidden)
        class_logits_all.append(class_predictor(intermediate))
        pred_mask, attn_mask = mask_predictor(intermediate, mask_features, sizes[0])
        mask_logits_all.append(pred_mask)

        for idx in range(cfg.decoder_layers - 1):
            lvl = idx % nl
            hidden = DecoderLayer(cfg, name=f"layer{idx}")(
                hidden, query_pos, memories[lvl], memory_poses[lvl], attn_mask
            )
            intermediate = final_norm(hidden)
            class_logits_all.append(class_predictor(intermediate))
            pred_mask, attn_mask = mask_predictor(intermediate, mask_features, sizes[(idx + 1) % nl])
            mask_logits_all.append(pred_mask)

        return class_logits_all, mask_logits_all
