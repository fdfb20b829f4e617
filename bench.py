#!/usr/bin/env python
"""Benchmark: NYUv2-shaped 640x480 RGB-D inference throughput, images/sec/chip.

Runs the flagship model (version 0.4.0: Swin-T + E-DSAM + DGGM + deformable
pixel decoder + masked-attention decoder) on one chip and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "images/sec", "vs_baseline": N}

Baseline: the reference's published 640² eval throughput on its GPU,
test_samples_per_second ≈ 0.61 (BASELINE.md, coco82v2_multi_640).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_THROUGHPUT = 0.61  # images/s, reference 640² eval on 1x GPU


def main():
    from rgbdseg_tpu.config import ModelConfig
    from rgbdseg_tpu.models.mask2former import Mask2FormerRGBD

    # batch 1 is the measured optimum on TPU v5e for this model at 640x480
    # (8.5 img/s vs 7.8 at batch 4, 6.7 at batch 8 — the DSAM full-res region
    # masks and masked-attention bias are HBM-bound and scale super-linearly).
    batch = int(os.environ.get("BENCH_BATCH", "1"))
    h, w = 480, 640  # NYUv2 aspect, both divisible by 32
    cfg = ModelConfig(num_labels=40, version="0.4.0")
    model = Mask2FormerRGBD(cfg)

    # bf16 params + activations: native MXU dtype, halves HBM traffic on the
    # bandwidth-bound paths (deformable gathers, mask resizes). The depth
    # histogram/decomposition internally upcasts to f32 (ops/depth_decomp.py)
    # so DSAM region masks stay exact.
    dtype = jnp.dtype(os.environ.get("BENCH_DTYPE", "bfloat16"))
    rng = np.random.RandomState(0)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, h, w, 10), jnp.float32)
    )
    variables = jax.tree.map(
        lambda a: a.astype(dtype) if a.dtype == jnp.float32 else a, variables
    )

    @jax.jit
    def forward(px):
        out = model.apply(variables, px, deterministic=True)
        return out.class_queries_logits, out.masks_queries_logits

    # DISTINCT input per iteration: the execution layer may memoize repeated
    # identical (executable, args) calls, so timing one reused buffer
    # measures cache hits, not compute.
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    xs = [jnp.asarray(rng.rand(batch, h, w, 10), dtype) for _ in range(iters)]

    # Warmup / compile.
    out = forward(xs[0])
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    outs = [forward(x) for x in xs]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0

    images_per_sec = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "NYUv2 640x480 images/sec/chip (inference, v0.4.0)",
                "value": round(images_per_sec, 3),
                "unit": "images/sec",
                "vs_baseline": round(images_per_sec / REFERENCE_THROUGHPUT, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
