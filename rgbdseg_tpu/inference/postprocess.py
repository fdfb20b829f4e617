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

The heavy part (steps 1-4) runs on-device under jit; the per-image packing
runs on host.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

PROCESSOR_SIZE = (384, 384)


@functools.partial(jax.jit, static_argnames=("resize_to",))
def _score_and_binarize(class_logits, mask_logits, resize_to=PROCESSOR_SIZE):
    """Device part: (B, Q, L+1), (B, Q, h, w) -> per-image top-Q
    (scores, labels, binary_masks at resize_to)."""
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
    binary = (sel_masks > 0).astype(jnp.float32)
    probs = jax.nn.sigmoid(sel_masks)
    mask_scores = jnp.sum(probs * binary, axis=(2, 3)) / (jnp.sum(binary, axis=(2, 3)) + 1e-6)
    return topk_scores * mask_scores, labels, binary


def _resize_nearest_np(mask: np.ndarray, size_hw) -> np.ndarray:
    """torch F.interpolate(mode='nearest') parity on (N, H, W) arrays."""
    th, tw = size_hw
    n, h, w = mask.shape
    yi = np.minimum((np.arange(th) * (h / th)).astype(np.int64), h - 1)
    xi = np.minimum((np.arange(tw) * (w / tw)).astype(np.int64), w - 1)
    return mask[:, yi][:, :, xi]


def post_process_instance_segmentation(
    class_logits,
    mask_logits,
    threshold: float = 0.5,
    target_sizes: Optional[list[tuple[int, int]]] = None,
    return_binary_maps: bool = True,
) -> list[dict]:
    """Returns per image: {"segmentation": (N, H, W) float32 binary maps (or
    (H, W) id map when return_binary_maps=False), "segments_info": [...]}."""
    scores, labels, binary = _score_and_binarize(jnp.asarray(class_logits), jnp.asarray(mask_logits))
    scores = np.asarray(scores)
    labels = np.asarray(labels)
    binary = np.asarray(binary)

    results = []
    for i in range(scores.shape[0]):
        masks_i = binary[i]
        if target_sizes is not None:
            masks_i = _resize_nearest_np(masks_i, target_sizes[i])
        h, w = masks_i.shape[-2:]
        keep = []
        segments = []
        seg_map = np.full((h, w), -1.0, np.float32)
        current = 0
        for j in range(scores.shape[1]):
            if scores[i, j] >= threshold and masks_i[j].any():
                seg_map[masks_i[j] == 1] = current
                segments.append(
                    {"id": current, "label_id": int(labels[i, j]), "was_fused": False, "score": round(float(scores[i, j]), 6)}
                )
                keep.append(j)
                current += 1
        if return_binary_maps:
            seg = np.stack([masks_i[j] for j in keep]) if keep else np.zeros((0, h, w), np.float32)
        else:
            seg = seg_map
        results.append({"segmentation": seg, "segments_info": segments})
    return results
