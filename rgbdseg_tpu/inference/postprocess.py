"""Instance-segmentation post-processing.

Parity with Mask2FormerImageProcessor.post_process_instance_segmentation (HF
image_processing_mask2former.py:1069-1199), which the reference evaluator calls
with threshold=0.0 and return_binary_maps=True (reference:
model_essential_part.py:87-92) and the predictor calls with defaults
(predictor.py:19-69):

1. bilinear-resize mask logits to the processor's (384, 384) — a hardcoded
   constant in the reference stack, preserved here for metric parity
2. scores = softmax(class)[:, :-1]; flatten (Q*C) and take top-Q
3. query = index // num_classes; binary mask = logits > 0
4. mask score = mean sigmoid prob inside the binary mask; final score =
   class score * mask score
5. nearest-resize binary masks to target size; keep score >= threshold and
   non-empty masks

TPU notes: steps 1-4 run on-device under jit; the binary maps cross to the
host BIT-PACKED ((B, Q, H*W/8) uint8 — 32x smaller than f32; the axon tunnel
made the raw 59 MB/image transfer the eval bottleneck at 1.5 s/image) and are
unpacked with np.unpackbits only for the kept queries. Binary maps are
returned as uint8 0/1 arrays.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

PROCESSOR_SIZE = (384, 384)

_BIT_WEIGHTS = (128, 64, 32, 16, 8, 4, 2, 1)  # MSB-first = np.unpackbits order


def _topq_binary(class_logits, mask_logits, resize_to=PROCESSOR_SIZE):
    """Shared device scoring: (B, Q, L+1), (B, Q, h, w) -> per-image top-Q
    (final scores, labels, binary bool masks at resize_to)."""
    from ..ops.resize import resize_bilinear

    b, q, _ = class_logits.shape
    num_classes = class_logits.shape[-1] - 1
    masks = resize_bilinear(mask_logits.transpose(0, 2, 3, 1), resize_to).transpose(0, 3, 1, 2)

    scores = jax.nn.softmax(class_logits, axis=-1)[..., :-1]  # (B, Q, C)
    flat = scores.reshape(b, q * num_classes)
    topk_scores, topk_idx = jax.lax.top_k(flat, q)
    labels = topk_idx % num_classes
    query_idx = topk_idx // num_classes
    sel_masks = jnp.take_along_axis(masks, query_idx[:, :, None, None], axis=1)
    binary_bool = sel_masks > 0
    binary = binary_bool.astype(jnp.float32)
    probs = jax.nn.sigmoid(sel_masks)
    mask_scores = jnp.sum(probs * binary, axis=(2, 3)) / (jnp.sum(binary, axis=(2, 3)) + 1e-6)
    return topk_scores * mask_scores, labels, binary_bool


@functools.partial(jax.jit, static_argnames=("resize_to",))
def _score_and_binarize(class_logits, mask_logits, resize_to=PROCESSOR_SIZE):
    """Device part: (B, Q, L+1), (B, Q, h, w) -> per-image top-Q
    (scores, labels, packed binary masks at resize_to, nonempty flags)."""
    final_scores, labels, binary_bool = _topq_binary(class_logits, mask_logits, resize_to)
    b, q = labels.shape
    nonempty = jnp.any(binary_bool, axis=(2, 3))  # (B, Q)
    # Bit-pack for the host transfer (MSB-first, np.unpackbits layout).
    bits = binary_bool.reshape(b, q, -1, 8).astype(jnp.int32)
    packed = jnp.sum(bits * jnp.asarray(_BIT_WEIGHTS, jnp.int32), axis=-1).astype(jnp.uint8)
    return final_scores, labels, packed, nonempty


def _nearest_indices(src_hw, dst_hw):
    """The gather indices of `_resize_nearest_np`, as numpy (trace-time)
    arrays — the device resize below uses EXACTLY the host path's indices."""
    h, w = src_hw
    th, tw = dst_hw
    yi = np.minimum((np.arange(th) * (h / th)).astype(np.int64), h - 1)
    xi = np.minimum((np.arange(tw) * (w / tw)).astype(np.int64), w - 1)
    return yi, xi


def _resize_nearest_jnp(masks, src_hw, dst_hw):
    if tuple(src_hw) == tuple(dst_hw):
        return masks
    yi, xi = _nearest_indices(src_hw, dst_hw)
    masks = jnp.take(masks, jnp.asarray(yi), axis=-2)
    return jnp.take(masks, jnp.asarray(xi), axis=-1)


@functools.partial(jax.jit, static_argnames=("target_hw", "gt_hw", "resize_to"))
def _eval_stats_device(
    class_logits, mask_logits, gt_packed, gt_valid, target_hw, gt_hw, resize_to=PROCESSOR_SIZE
):
    """Device-side instance-eval statistics: everything the mask mAP metric
    needs EXCEPT the masks themselves, so only O(Q*T) scalars cross to the
    host (the masks never leave the device — at NYUv2 sizes the binary maps
    were ~30 MB/image even bit-packed+resized, and host unpack/resize/IoU was
    the eval bottleneck at ~0.6 s/image).

    gt_packed: (B, T, ceil(gh*gw/8)) uint8 np.packbits(axis=-1) of the padded
    GT masks at gt_hw; gt_valid: (B, T) bool. Returns (scores (B,Q) f32,
    labels (B,Q) i32, darea (B,Q) f32, garea (B,T) f32, inter (B,Q,T) f32),
    with det masks binarized at `resize_to` then nearest-resized to
    `target_hw` and GT nearest-resized gt_hw -> target_hw — index-identical
    to the host path (`_resize_nearest_np`). All counts are integers < 2^24:
    the f32 dot/sums are EXACT, so host-side IoU = inter / (darea + garea -
    inter) is bit-identical to the mask-based host path."""
    scores, labels, det = _topq_binary(class_logits, mask_logits, resize_to)
    b, q = labels.shape
    t = gt_valid.shape[1]
    th, tw = target_hw
    det = _resize_nearest_jnp(det, resize_to, target_hw)

    gh, gw = gt_hw
    bits = (gt_packed[..., None].astype(jnp.int32) >> jnp.arange(7, -1, -1, dtype=jnp.int32)) & 1
    gt = bits.reshape(b, t, -1)[..., : gh * gw].reshape(b, t, gh, gw).astype(bool)
    gt = gt & gt_valid[:, :, None, None]
    gt = _resize_nearest_jnp(gt, gt_hw, target_hw)

    # bf16 operands are exact for 0/1 values; f32 accumulation is exact for
    # counts < 2^24 (th*tw <= 16.7M covers any realistic image size).
    d = det.reshape(b, q, th * tw).astype(jnp.bfloat16)
    g = gt.reshape(b, t, th * tw).astype(jnp.bfloat16)
    inter = jnp.einsum("bqp,btp->bqt", d, g, preferred_element_type=jnp.float32)
    darea = jnp.sum(det, axis=(2, 3), dtype=jnp.float32)
    garea = jnp.sum(gt, axis=(2, 3), dtype=jnp.float32)
    return scores, labels, darea, garea, inter


def _resize_nearest_np(mask: np.ndarray, size_hw) -> np.ndarray:
    """torch F.interpolate(mode='nearest') parity on (N, H, W) arrays."""
    th, tw = size_hw
    n, h, w = mask.shape
    yi = np.minimum((np.arange(th) * (h / th)).astype(np.int64), h - 1)
    xi = np.minimum((np.arange(tw) * (w / tw)).astype(np.int64), w - 1)
    # single advanced-index (broadcast yi x xi) — 5.2x faster than chaining
    # two fancy-index passes (no (N, th, w) intermediate)
    return mask[:, yi[:, None], xi[None, :]]


def post_process_instance_segmentation(
    class_logits,
    mask_logits,
    threshold: float = 0.5,
    target_sizes: Optional[list[tuple[int, int]]] = None,
    return_binary_maps: bool = True,
) -> list[dict]:
    """Returns per image: {"segmentation": (N, H, W) uint8 0/1 binary maps (or
    (H, W) float32 id map when return_binary_maps=False), "segments_info": [...]}."""
    outs = _score_and_binarize(jnp.asarray(class_logits), jnp.asarray(mask_logits))
    for x in outs:  # overlap the 4 device->host copies (one tunnel RTT, not 4)
        if hasattr(x, "copy_to_host_async"):
            x.copy_to_host_async()
    scores, labels, packed, nonempty = (np.asarray(x) for x in outs)
    ph, pw = PROCESSOR_SIZE

    results = []
    for i in range(scores.shape[0]):
        # Pre-filter by score and 384²-emptiness (an empty mask stays empty
        # under nearest resize); post-filter below re-checks emptiness at the
        # target size exactly like the reference (downsizing can erase masks).
        cand = np.nonzero((scores[i] >= threshold) & nonempty[i])[0]
        masks_i = np.unpackbits(packed[i][cand], axis=-1).reshape(len(cand), ph, pw)
        h, w = ph, pw
        if target_sizes is not None:
            h, w = target_sizes[i]
            if (h, w) != (ph, pw):
                masks_i = _resize_nearest_np(masks_i, (h, w))
        still = masks_i.reshape(len(cand), h * w).any(axis=1)
        cand, masks_i = cand[still], masks_i[still]
        segments = [
            {
                "id": k,
                "label_id": int(labels[i, j]),
                "was_fused": False,
                "score": round(float(scores[i, j]), 6),
            }
            for k, j in enumerate(cand)
        ]
        if return_binary_maps:
            seg = masks_i
        else:
            seg_map = np.full((h, w), -1.0, np.float32)
            for k in range(masks_i.shape[0]):
                seg_map[masks_i[k] == 1] = k
            seg = seg_map
        results.append({"segmentation": seg, "segments_info": segments})
    return results
