"""Cosine-Similarity Fuse (CSF) — vectorized.

Parity target: ``cosine_similarity_fuse_v3`` (reference: data_process.py:817-919)
plus its pixel-wise ``cosine_similarity`` helper (:755-814). The reference runs an
O(N²·H·W) interpreted Python pixel loop; here the whole algorithm is a handful of
batched tensor ops:

round k (standard image k):
  - similarity maps sim[k, j] for all j != k (cosine over the channel axis;
    both-zero pixels get similarity 1.0, one-zero pixels 0.0)
  - per pixel: source = argmax_j sim[k, j] (first max in increasing-j order,
    skipping k — matches the reference's strict `>` scan)
  - round image B_k = images[source]; contribution counts per source image;
    the most-contributing image C gets its count added to its global score
scores -> normalized weights -> fused = Σ_k w_k · B_k  (uniform if all zero).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pixel_cosine_similarity(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pixel-wise cosine similarity of (..., H, W, C) images -> (..., H, W)."""
    a = a.astype(jnp.float64) if a.dtype == jnp.float64 else a.astype(jnp.float32)
    b = b.astype(a.dtype)
    dot = jnp.sum(a * b, axis=-1)
    na = jnp.linalg.norm(a, axis=-1)
    nb = jnp.linalg.norm(b, axis=-1)
    denom = na * nb
    sim = jnp.where(denom != 0, dot / jnp.where(denom == 0, 1.0, denom), 0.0)
    return jnp.where((na == 0) & (nb == 0), 1.0, sim)


def csf_intermediates(images: jnp.ndarray) -> dict:
    """Full CSF with intermediates exposed (for the QA viewer — the reference
    threads a `check=csf_viewer_v2` hook through cosine_similarity_fuse_v3,
    data_process.py:817-919 / 922-1016).

    Returns dict with: sim (N, N, H, W) (diagonal = -inf), best (N, H, W)
    winning source per round, round_images (N, H, W, C), counts (N, N) per
    (round, source) contributing-pixel counts, scores (N,), weights (N,),
    fused (H, W, C) float32.
    """
    n, h, w, c = images.shape
    imgs = images.astype(jnp.float32)

    # Pairwise similarity (N, N, H, W).
    sim = jax.vmap(lambda a: jax.vmap(lambda b: pixel_cosine_similarity(a, b))(imgs))(imgs)
    # Round k compares against all j != k; exclude the diagonal from the argmax.
    eye = jnp.eye(n, dtype=bool)[:, :, None, None]
    sim = jnp.where(eye, -jnp.inf, sim)
    # (N, H, W): for each round, the first-maximal source index (argmax keeps the
    # first of ties in increasing j, matching the reference's `>` scan order).
    best = jnp.argmax(sim, axis=1)

    # Round images B_k: gather winning source pixels via one-hot contraction.
    onehot = jax.nn.one_hot(best, n, dtype=jnp.float32)  # (N, H, W, Nsrc)
    round_images = jnp.einsum("khws,shwc->khwc", onehot, imgs)

    # Contribution counts per (round, source).
    counts = jnp.sum(onehot, axis=(1, 2))  # (N, N)
    # Most-contributing source per round (first max in increasing source order).
    winner = jnp.argmax(counts, axis=1)
    winner_count = jnp.max(counts, axis=1)
    scores = jnp.zeros((n,), jnp.float32).at[winner].add(winner_count)

    total = jnp.sum(scores)
    weights = jnp.where(total == 0, jnp.full((n,), 1.0 / n), scores / jnp.where(total == 0, 1.0, total))
    fused = jnp.einsum("k,khwc->hwc", weights, round_images)
    return {
        "sim": sim,
        "best": best,
        "round_images": round_images,
        "counts": counts,
        "scores": scores,
        "weights": weights,
        "fused": fused,
    }


def csf_fuse(images: jnp.ndarray) -> jnp.ndarray:
    """Fuse N images. images: (N, H, W, C) -> (H, W, C), dtype preserved."""
    if images.shape[0] <= 1:
        return images[0]
    return csf_intermediates(images)["fused"].astype(images.dtype)
