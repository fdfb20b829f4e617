"""Mask2Former criterion: Hungarian matching + point-sampled mask losses + CE.

Parity target: Mask2FormerLoss / Mask2FormerHungarianMatcher (HF
modeling_mask2former.py:278-795) with the reference's weights
(class 2.0 / mask 5.0 / dice 5.0 / no-object 0.1, 12544 points,
oversample 3.0, importance 0.75 — standard/config.json).

TPU-native differences from the reference implementation (semantics preserved):
- Targets are padded to a static `max_instances` with a validity mask instead of
  ragged per-sample lists (reference: dataloader.py:772-780 keeps lists). Padding
  rows enter the assignment with a uniform constant cost, which cannot change
  the optimal assignment of real rows.
- The assignment runs on-device (ops.matcher) instead of scipy-on-host.
- Point sampling uses explicit JAX PRNG keys (deterministic given the key).

All mask logits are (B, Q, H, W); target masks (B, T, H, W) float 0/1.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from .matcher import hungarian_batch
from .resize import grid_sample_bilinear


def _uniform(rng: jax.Array, shape: tuple) -> jnp.ndarray:
    """Point-coordinate draw. Indirection so differential tests can inject the
    exact same coordinates into this criterion and HF's Mask2FormerLoss."""
    return jax.random.uniform(rng, shape)


def _sample_masks_at_points(masks: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """masks (B, N, H, W), coords (B, P, 2) in [0,1] (x,y) -> (B, N, P)."""
    b, n, h, w = masks.shape
    feats = masks.transpose(0, 2, 3, 1)  # (B, H, W, N) — masks as channels
    out = grid_sample_bilinear(feats, coords)  # (B, P, N)
    return out.transpose(0, 2, 1)


def _sample_each_mask_impl(masks: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Separable tent-matmul bilinear sampling (no gather at all).

    out[b,n,p] = ty_p^T M_n tx_p with tent row/col weights over the
    zero-padded (H+2, W+2) grid (exact grid_sample zeros-padding semantics:
    any corner weight falling out of bounds lands on the padding ring, which
    is zero). Stage 1 contracts x as one batched (P, W+2) @ (W+2, H+2) matmul
    per mask on the MXU; stage 2 is a tent-weighted reduce over y on the VPU.
    Replaces the previous all-channels gather: TPU gathers cost ~4 ns/row so
    sampling 600K points was ~10 ms/criterion-layer of pure row fetches, vs
    ~1 ms of (mostly-zero) matmul the MXU absorbs. Measured exact (1e-6) vs
    the gather formulation, including out-of-bounds points.
    """
    b, n, h, w = masks.shape
    dtype = masks.dtype
    gy = coords[..., 1].astype(jnp.float32) * h - 0.5 + 1.0  # padded-grid coords
    gx = coords[..., 0].astype(jnp.float32) * w - 0.5 + 1.0
    ty = jnp.maximum(0.0, 1.0 - jnp.abs(gy[..., None] - jnp.arange(h + 2, dtype=jnp.float32)))
    tx = jnp.maximum(0.0, 1.0 - jnp.abs(gx[..., None] - jnp.arange(w + 2, dtype=jnp.float32)))
    mp = jnp.pad(masks.astype(jnp.float32), ((0, 0), (0, 0), (1, 1), (1, 1)))
    a = jnp.einsum("bnpx,bnyx->bnpy", tx, mp)  # (B, N, P, H+2)
    return jnp.sum(a * ty, axis=-1).astype(dtype)


@jax.custom_vjp
def _sample_each_mask(masks: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """masks (B, N, H, W), coords (B, N, P, 2) -> (B, N, P); per-mask points.

    TPU formulation (history): sampling each mask as its own (H, W, 1) map
    makes the patch gather fetch (2, 2, 1) slices — a 1-float minor dimension
    that XLA lowers to a SERIAL per-point while loop (measured ~2 us/point:
    1.27 s for 16 masks x 37632 points at 480x640, the whole criterion's
    cost). An all-channels gather (+ diagonal keep) rode the vectorized
    gather path, but was still row-fetch-bound (~10 ms/criterion-layer).
    Both directions now use the gather-free tent-matmul formulation — see
    `_sample_each_mask_impl` for the forward.

    TPU formulation (backward): the VJP of a gather is a scatter-add, which
    XLA also lowers serially (measured ~1 s/layer in the criterion). But a
    bilinear sample is separable: out[p] = ty_p^T M tx_p with tent row/col
    weights, so grad_M = sum_p g_p ty_p tx_p^T = (Ty * g)^T @ Tx — one batched
    matmul over the point axis on the MXU, numerically exact. Tents are built
    over the zero-padded (H+2, W+2) grid, which reproduces grid_sample's
    zeros-padding edge semantics (the padding ring rows/cols absorb
    out-of-bounds corner weights and are sliced off). coords are treated as
    non-differentiable (every caller wraps them in stop_gradient).
    """
    return _sample_each_mask_impl(masks, coords)


def _sample_each_mask_fwd(masks, coords):
    proto = jnp.zeros((0,) + masks.shape, masks.dtype)  # shape/dtype carrier, no data
    return _sample_each_mask_impl(masks, coords), (proto, coords)


def _sample_each_mask_bwd(res, g):
    proto, coords = res
    (b, n, h, w), dtype = proto.shape[1:], proto.dtype
    gf = g.astype(jnp.float32)
    # Padded-grid coordinates: map cell centers sit at integer offsets + 1.
    gy = coords[..., 1].astype(jnp.float32) * h - 0.5 + 1.0  # (B, N, P)
    gx = coords[..., 0].astype(jnp.float32) * w - 0.5 + 1.0
    ty = jnp.maximum(0.0, 1.0 - jnp.abs(gy[..., None] - jnp.arange(h + 2, dtype=jnp.float32)))
    tx = jnp.maximum(0.0, 1.0 - jnp.abs(gx[..., None] - jnp.arange(w + 2, dtype=jnp.float32)))
    grad_pad = jnp.einsum("bnpy,bnpx->bnyx", ty * gf[..., None], tx)  # (B, N, H+2, W+2)
    return grad_pad[:, :, 1:-1, 1:-1].astype(dtype), jnp.zeros_like(coords)


_sample_each_mask.defvjp(_sample_each_mask_fwd, _sample_each_mask_bwd)


def _bce_with_logits(logits, labels):
    # log(1 + exp(-|x|)) + max(x, 0) - x * y
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def pairwise_mask_costs(pred_pts: jnp.ndarray, tgt_pts: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """pred_pts (Q, P) logits, tgt_pts (T, P) in [0,1] -> (bce (Q,T), dice (Q,T))."""
    p = pred_pts.shape[-1]
    ce_pos = _bce_with_logits(pred_pts, jnp.ones_like(pred_pts)) / p
    ce_neg = _bce_with_logits(pred_pts, jnp.zeros_like(pred_pts)) / p
    bce = ce_pos @ tgt_pts.T + ce_neg @ (1.0 - tgt_pts).T

    probs = jax.nn.sigmoid(pred_pts)
    numer = 2.0 * (probs @ tgt_pts.T)
    denom = probs.sum(-1)[:, None] + tgt_pts.sum(-1)[None, :]
    dice = 1.0 - (numer + 1.0) / (denom + 1.0)
    return bce, dice


def match(
    cfg: ModelConfig,
    class_logits: jnp.ndarray,  # (B, Q, L+1)
    mask_logits: jnp.ndarray,  # (B, Q, Hm, Wm)
    target_masks: jnp.ndarray,  # (B, T, H, W)
    target_classes: jnp.ndarray,  # (B, T) int
    target_valid: jnp.ndarray,  # (B, T) bool
    rng: jax.Array,
) -> jnp.ndarray:
    """Hungarian assignment. Returns col4row (B, T): query index per target slot."""
    b, q = class_logits.shape[:2]
    t = target_masks.shape[1]
    probs = jax.nn.softmax(class_logits, axis=-1)
    safe_cls = jnp.clip(target_classes, 0, cfg.num_labels)
    cost_class = -jnp.take_along_axis(
        probs, safe_cls[:, None, :].repeat(q, 1), axis=2
    )  # (B, Q, T)

    coords = _uniform(rng, (b, cfg.train_num_points, 2))
    pred_pts = _sample_masks_at_points(mask_logits, coords)  # (B, Q, P)
    tgt_pts = _sample_masks_at_points(target_masks, coords)  # (B, T, P)

    bce, dice = jax.vmap(pairwise_mask_costs)(pred_pts, tgt_pts)
    cost = cfg.mask_weight * bce + cfg.class_weight * cost_class + cfg.dice_weight * dice
    cost = jnp.clip(cost, -1e10, 1e10)
    cost = jnp.nan_to_num(cost, nan=0.0)
    # Padding targets: uniform cost (cannot perturb real-row assignment).
    cost = jnp.where(target_valid[:, None, :], cost, 0.0)
    col4row = hungarian_batch(jnp.transpose(cost, (0, 2, 1)))  # rows = targets
    return jax.lax.stop_gradient(col4row)


def sample_points_with_uncertainty(
    cfg: ModelConfig, pred_masks: jnp.ndarray, rng: jax.Array
) -> jnp.ndarray:
    """Oversample + importance-select point coords per mask (HF :672-725).

    pred_masks: (B, N, H, W) logits -> coords (B, N, P, 2).
    """
    b, n = pred_masks.shape[:2]
    num_points = cfg.train_num_points
    num_sampled = int(num_points * cfg.oversample_ratio)
    num_uncertain = int(cfg.importance_sample_ratio * num_points)
    num_random = num_points - num_uncertain

    r1, r2 = jax.random.split(rng)
    coords = _uniform(r1, (b, n, num_sampled, 2))
    logits = _sample_each_mask(pred_masks, coords)  # (B, N, S)
    # top_k(-|l|, U) + take_along_axis(coords, idx) done as ONE variadic
    # stable sort that carries the coordinates as payload through the
    # sorting network. Exactly the same selection: ascending stable sort on
    # |logits| == descending top_k on -|logits| including tie order, and the
    # first U payload entries are the picked coords. Why: the (S, 2) coords
    # gather has a 2-float minor dim that XLA lowers to near-serial row
    # fetches (PERF.md rule 7; profiled 10.4 ms/step inside the criterion
    # scan — padding the minor dim gets dead-code-eliminated back to 2), and
    # the payload sort replaces BOTH the 6 ms top_k and the 10.4 ms gather
    # with one ~7 ms sort.
    _, cx, cy = jax.lax.sort(
        (jnp.abs(logits), coords[..., 0], coords[..., 1]), dimension=-1, num_keys=1
    )
    picked = jnp.stack([cx[..., :num_uncertain], cy[..., :num_uncertain]], axis=-1)
    if num_random > 0:
        picked = jnp.concatenate(
            [picked, _uniform(r2, (b, n, num_random, 2))], axis=2
        )
    return jax.lax.stop_gradient(picked)


def layer_losses(
    cfg: ModelConfig,
    class_logits: jnp.ndarray,
    mask_logits: jnp.ndarray,
    target_masks: jnp.ndarray,
    target_classes: jnp.ndarray,
    target_valid: jnp.ndarray,
    rng: jax.Array,
    num_masks: jnp.ndarray,
    col4row: Optional[jnp.ndarray] = None,
) -> dict[str, jnp.ndarray]:
    """Losses for one prediction layer (matcher re-run per layer, like the
    reference's per-aux criterion calls). Pass a precomputed `col4row` to skip
    the in-layer match (mask2former_loss batches all layers' matches together
    — see its docstring); the RNG split is identical either way."""
    b, q = class_logits.shape[:2]
    t = target_masks.shape[1]
    r_match, r_pts = jax.random.split(rng)
    if col4row is None:
        col4row = match(cfg, class_logits, mask_logits, target_masks, target_classes, target_valid, r_match)

    # ----- mask losses on matched pairs -----
    pred_m = jnp.take_along_axis(
        mask_logits, col4row[:, :, None, None], axis=1
    )  # (B, T, Hm, Wm)
    coords = sample_points_with_uncertainty(cfg, pred_m, r_pts)
    point_logits = _sample_each_mask(pred_m, coords)  # (B, T, P)
    point_labels = jax.lax.stop_gradient(_sample_each_mask(target_masks, coords))

    validf = target_valid.astype(jnp.float32)
    ce = _bce_with_logits(point_logits, point_labels).mean(-1)  # (B, T)
    loss_mask = jnp.sum(ce * validf) / num_masks

    probs = jax.nn.sigmoid(point_logits)
    numer = 2.0 * jnp.sum(probs * point_labels, -1)
    denom = jnp.sum(probs, -1) + jnp.sum(point_labels, -1)
    dice = 1.0 - (numer + 1.0) / (denom + 1.0)
    loss_dice = jnp.sum(dice * validf) / num_masks

    # ----- classification loss -----
    fill = jnp.full((b, q), cfg.num_labels, jnp.int32)
    write_cls = jnp.where(target_valid, target_classes, cfg.num_labels).astype(jnp.int32)
    batch_idx = jnp.arange(b)[:, None].repeat(t, 1)
    tgt_q = fill.at[batch_idx, col4row].set(write_cls)
    # torch CrossEntropyLoss(weight): sum(w[y] * nll) / sum(w[y])
    logp = jax.nn.log_softmax(class_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, tgt_q[..., None], axis=-1)[..., 0]
    wvec = jnp.concatenate(
        [jnp.ones((cfg.num_labels,)), jnp.asarray([cfg.no_object_weight])]
    )
    wy = wvec[tgt_q]
    loss_ce = jnp.sum(wy * nll) / jnp.sum(wy)

    return {"loss_cross_entropy": loss_ce, "loss_mask": loss_mask, "loss_dice": loss_dice}


def mask2former_loss(
    cfg: ModelConfig,
    outputs,
    target_masks: jnp.ndarray,
    target_classes: jnp.ndarray,
    target_valid: jnp.ndarray,
    rng: jax.Array,
    axis_name: Optional[str] = None,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Full criterion with auxiliary losses and weight_dict application.

    Returns (total_loss, loss_dict); loss_dict values are (num_layers,) arrays
    ordered [aux_0 ... aux_{L-2}, final] and already weight_dict-scaled. The
    per-layer criterion runs under `lax.scan` so the matcher + point losses are
    compiled ONCE regardless of decoder depth (the reference re-runs its
    criterion per aux layer, HF modeling :771-778 — semantics identical, this
    is purely a compile-size optimization). num_masks is averaged across
    devices when `axis_name` is given (reference: HF get_num_masks).
    """
    num_masks = jnp.sum(target_valid.astype(jnp.float32))
    if axis_name is not None:
        num_masks = jax.lax.pmean(num_masks, axis_name)
    num_masks = jnp.maximum(num_masks, 1.0)

    all_cls = list(outputs.aux_class_logits) + [outputs.class_queries_logits]
    all_msk = list(outputs.aux_mask_logits) + [outputs.masks_queries_logits]
    if not cfg.use_auxiliary_loss:
        all_cls, all_msk = all_cls[-1:], all_msk[-1:]
    n_layers = len(all_cls)
    # Criterion numerics stay f32 regardless of the model compute dtype
    # (mixed-precision forwards emit bf16 logits; softmax/BCE/dice and the
    # matcher costs need f32).
    cls_stack = jnp.stack(all_cls).astype(jnp.float32)
    msk_stack = jnp.stack(all_msk).astype(jnp.float32)
    rngs = jax.random.split(rng, n_layers)

    # Match ALL layers in one batched call before the scan. The Hungarian
    # augmenting-path while-loops run as parallel vmap lanes this way; inside
    # the scan they serialize (measured 37 ms/step of serial LAP whiles vs
    # ~12 ms for the same 10 solves batched). Same RNG stream as the in-layer
    # match (split(rngs[i])[0]).
    r_match = jax.vmap(lambda r: jax.random.split(r)[0])(rngs)
    col4rows = jax.vmap(
        lambda cl, ml, r: match(cfg, cl, ml, target_masks, target_classes, target_valid, r)
    )(cls_stack, msk_stack, r_match)  # (n_layers, B, T)

    def body(carry, inp):
        cl, ml, c4r, r = inp
        ld = layer_losses(
            cfg, cl, ml, target_masks, target_classes, target_valid, r, num_masks, col4row=c4r
        )
        weighted = {
            "loss_cross_entropy": ld["loss_cross_entropy"] * cfg.class_weight,
            "loss_mask": ld["loss_mask"] * cfg.mask_weight,
            "loss_dice": ld["loss_dice"] * cfg.dice_weight,
        }
        total = weighted["loss_cross_entropy"] + weighted["loss_mask"] + weighted["loss_dice"]
        return carry + total, weighted

    # Criterion scan unroll: DEFAULT fully unrolled — measured 2026-08-21
    # on v5e 640x480 v0.4.0 (device ms/step): scan 81.3 / unroll=2 81.2 /
    # unroll=5 81.3 / full 76.4 (11.12 -> 11.75 img/s): only the full unroll
    # lets XLA fuse and pipeline across layer boundaries. Semantics are
    # unchanged (same per-layer math and RNG stream); RGBDSEG_CRIT_UNROLL=1
    # restores the rolled loop (smallest compile).
    u = os.environ.get("RGBDSEG_CRIT_UNROLL", "full")
    total, per_layer = jax.lax.scan(
        body,
        jnp.float32(0.0),
        (cls_stack, msk_stack, col4rows, rngs),
        unroll=True if u == "full" else int(u),
    )
    return total, per_layer
