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


@functools.partial(jax.jit, static_argnames=("resize_to",))
def _score_and_binarize(class_logits, mask_logits, resize_to=PROCESSOR_SIZE):
    """Device part: (B, Q, L+1), (B, Q, h, w) -> per-image top-Q
    (scores, labels, packed binary masks at resize_to, nonempty flags)."""
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
    nonempty = jnp.any(binary_bool, axis=(2, 3))  # (B, Q)
    # Bit-pack for the host transfer (MSB-first, np.unpackbits layout).
    bits = binary_bool.reshape(b, q, -1, 8).astype(jnp.int32)
    packed = jnp.sum(bits * jnp.asarray(_BIT_WEIGHTS, jnp.int32), axis=-1).astype(jnp.uint8)
    return topk_scores * mask_scores, labels, packed, nonempty


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
