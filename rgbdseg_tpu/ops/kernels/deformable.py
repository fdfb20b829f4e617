"""Fused tent-matmul deformable-attention sampling (Pallas TPU kernel).

Multi-scale deformable attention (the reference stack's CUDA `ms_deform_attn`;
HF modeling_mask2former.py:907-1026) reduces, per level, to

    out[b, q, :] = sum_p aw[b, q, p] * bilinear(V[b], gy[b, q, p], gx[b, q, p])

and bilinear sampling with zeros padding is exactly a "tent" contraction

    out = P @ V,  P[q, y*w + x] = sum_p aw_p * relu(1 - |gy_p - y|) * relu(1 - |gx_p - x|)

(see models/pixel_decoder.py for the derivation). This kernel builds P
tile-by-tile in VMEM and feeds the MXU directly: per (L-tile, K-tile) grid
step it reconstructs the tile's (y, x) cell coordinates from the linearized
column index, evaluates the P<=4 tent products on the VPU, and accumulates
P_tile @ V_tile into a VMEM accumulator, with an exact row-band skip for
tile-pairs no tent lobe can reach.

Measured result (ops/kernels/__init__.py): XLA fuses the jnp twin's tent
construction into the matmul operand generation and wins end-to-end at this
model's shapes (hd=32 underfills the MXU tiles this kernel emits), so the
twin is the default path and this kernel is opt-in (RGBDSEG_PALLAS).

The backward pass reuses the VJP of the jnp twin (`tent_sample_level_xla`) via
`jax.custom_vjp` — numerically identical gradients; the kernel is used for the
(re)forward.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def tent_sample_level_xla(gx, gy, aw, v, h: int, w: int):
    """jnp twin (golden reference / non-TPU fallback).

    gx, gy: (BH, L, P) sampling coords in *pixel* units (already x*w - 0.5 /
    y*h - 0.5); aw: (BH, L, P) attention weights; v: (BH, h*w, hd) values.
    Returns (BH, L, hd) in f32.
    """
    ycell = jnp.arange(h, dtype=jnp.float32)
    xcell = jnp.arange(w, dtype=jnp.float32)
    ty = jnp.maximum(0.0, 1.0 - jnp.abs(gy[..., None] - ycell))  # (BH, L, P, h)
    tx = jnp.maximum(0.0, 1.0 - jnp.abs(gx[..., None] - xcell))  # (BH, L, P, w)
    awty = (aw.astype(jnp.float32)[..., None] * ty)[..., None]
    pmat = jnp.sum(awty * tx[..., None, :], axis=2)  # (BH, L, h, w)
    bh, l = gx.shape[:2]
    pmat = pmat.reshape(bh, l, h * w).astype(v.dtype)
    return jnp.einsum("blk,bkd->bld", pmat, v).astype(jnp.float32)


def tent_sample_level_xla_separable(gx, gy, aw, v, h: int, w: int):
    """Separable tent contraction — the DEFAULT sampling formulation.

    Contracts x first — one (L*P, w) @ (w, h*hd) batched matmul per bh — then
    does the tent-weighted y-reduce on the VPU. Trades the (BH, L, h, w) tent
    VPU construction for P× more MXU FLOPs plus a materialized
    (BH, L, P, h, hd) stage-1 intermediate; same math to f32 rounding.
    Measured vs the fused-P twin (`tent_sample_level_xla`,
    RGBDSEG_TENT_SEPARABLE=0): 49.4 vs 36.6 img/s inference, 7.18 vs 6.77
    img/s train at 640x480 v0.4.0 (PERF.md 2026-08-18).
    """
    bh, l, npts = gx.shape
    hd = v.shape[-1]
    ycell = jnp.arange(h, dtype=jnp.float32)
    xcell = jnp.arange(w, dtype=jnp.float32)
    ty = jnp.maximum(0.0, 1.0 - jnp.abs(gy[..., None] - ycell))  # (BH, L, P, h)
    tx = jnp.maximum(0.0, 1.0 - jnp.abs(gx[..., None] - xcell))  # (BH, L, P, w)
    v4 = v.reshape(bh, h, w, hd)
    # Stage-1 matmul in the VALUE dtype (bf16 in the mixed-precision path,
    # matching the fused-P twin's product dtype) with f32 accumulation — the
    # f32-operand version of this einsum was the single hottest op in the
    # 640x480 frame profile (6 x 1.26 ms; PERF.md 2026-08-18).
    # Stage-1 output dtype: each element is a <=2-term convex combination of v
    # (the x-tent has support <= 2 cells), so emitting bf16 loses no more than
    # bf16-rounding v itself — but halves the HBM traffic of the (BH, L, P, h,
    # hd) intermediate when XLA materializes it (it always does in training,
    # where the intermediate is saved for the backward). Default: follow
    # v.dtype — bf16 stage-1 in the mixed-precision path (A/B on chip, 640x480
    # v0.4.0: train 7.20 -> 8.30 img/s, inference 50.8 -> 51.0), exact f32 in
    # the f32 path. RGBDSEG_TENT_S1_BF16=1/0 forces either for measurement.
    force = os.environ.get("RGBDSEG_TENT_S1_BF16")
    if force is not None:
        s1_dtype = jnp.bfloat16 if force == "1" else jnp.float32
    else:
        s1_dtype = jnp.bfloat16 if v.dtype == jnp.bfloat16 else jnp.float32
    s1 = jnp.einsum(
        "blpx,byxd->blpyd", tx.astype(v.dtype), v4, preferred_element_type=s1_dtype
    )  # (BH, L, P, h, hd) on the MXU
    awty = aw.astype(jnp.float32)[..., None] * ty  # (BH, L, P, h)
    return jnp.einsum("blpy,blpyd->bld", awty, s1, preferred_element_type=jnp.float32)


def _tent_kernel(
    gx_ref, gy_ref, aw_ref, v_ref, out_ref, acc_ref, *, rows: int, lg: int, npts: int
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    gx = gx_ref[0]  # (BL, P) f32
    gy = gy_ref[0]
    aw = aw_ref[0]
    r0 = (k * rows).astype(jnp.float32)

    # Exact row-band skip: the tent along y has support (gy - 1, gy + 1); if no
    # sampling point of this query tile can touch rows [r0, r0 + rows), the
    # whole tile-pair contributes exactly zero. Deformable sampling is local
    # (reference points + small learned offsets), so most pairs skip.
    gymin = jnp.min(gy)
    gymax = jnp.max(gy)
    active = (gymax > r0 - 1.0) & (gymin < r0 + rows)

    @pl.when(active)
    def _():
        xcol = jax.lax.broadcasted_iota(jnp.int32, (1, lg), 1).astype(jnp.float32)
        # x-tents: once per point for the whole row-band (separability).
        txs = [
            jnp.maximum(0.0, 1.0 - jnp.abs(gx[:, p : p + 1] - xcol)) for p in range(npts)
        ]
        for j in range(rows):  # static unroll
            yj = r0 + j
            pj = jnp.zeros((gx.shape[0], lg), jnp.float32)
            for p in range(npts):
                # per-row y-tent is a (BL, 1) column — 2 VPU ops per lane cell
                wy = aw[:, p : p + 1] * jnp.maximum(
                    0.0, 1.0 - jnp.abs(gy[:, p : p + 1] - yj)
                )
                pj += wy * txs[p]
            # Explicit precision: the global jax_default_matmul_precision may
            # be float32, which Mosaic rejects for a bf16 matmul (Bad lhs
            # type); bf16 operands always contract natively on the MXU.
            prec = (
                jax.lax.Precision.DEFAULT
                if v_ref.dtype == jnp.bfloat16
                else jax.lax.Precision.HIGHEST
            )
            acc_ref[...] += jnp.dot(
                pj.astype(v_ref.dtype),
                v_ref[0, j * lg : (j + 1) * lg, :],
                preferred_element_type=jnp.float32,
                precision=prec,
            )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        out_ref[0] = acc_ref[...]


def _tent_sample_level_pallas(
    gx, gy, aw, v, h: int, w: int, *, block_l: int = 512, interpret: bool = False
):
    bh, l, npts = gx.shape
    hd = v.shape[-1]
    block_l = min(block_l, _round_up(l, 128))
    lp = _round_up(l, block_l)

    # Row-aligned value layout: (bh, h, w, hd) -> x padded to the lane group
    # LG (multiple of 128), rows padded to a multiple of the row-band R, then
    # flattened to (bh, hp * LG, hd). Padded cells are zero so out-of-range
    # tent lobes contribute nothing (zeros-padding bilinear semantics).
    lg = _round_up(w, 128)
    rows = max(1, 1024 // lg)
    hp = _round_up(h, rows)
    v = v.reshape(bh, h, w, hd)
    v = jnp.pad(v, ((0, 0), (0, hp - h), (0, lg - w), (0, 0))).reshape(bh, hp * lg, hd)

    pad_l = lp - l
    if pad_l:
        gx = jnp.pad(gx, ((0, 0), (0, pad_l), (0, 0)))
        gy = jnp.pad(gy, ((0, 0), (0, pad_l), (0, 0)))
        aw = jnp.pad(aw, ((0, 0), (0, pad_l), (0, 0)))

    block_k = rows * lg
    grid = (bh, lp // block_l, hp // rows)
    out = pl.pallas_call(
        functools.partial(_tent_kernel, rows=rows, lg=lg, npts=npts),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_l, npts), lambda b, i, k: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, npts), lambda b, i, k: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, npts), lambda b, i, k: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, hd), lambda b, i, k: (b, k, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_l, hd), lambda b, i, k: (b, i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((block_l, hd), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((bh, lp, hd), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * lp * hp * lg * hd + 2 * npts * bh * lp * hp * lg,
            bytes_accessed=4 * bh * (3 * lp * npts + hp * lg * hd + lp * hd),
            transcendentals=0,
        ),
        interpret=interpret,
    )(gx.astype(jnp.float32), gy.astype(jnp.float32), aw.astype(jnp.float32), v)
    return out[:, :l]


def _tent_band_kernel(gx_ref, gy_ref, aw_ref, v_ref, out_ref, acc_ref, *, rows: int, lg: int, npts: int):
    """Band-tiled variant (PERF.md 'band-tiled Pallas MXU kernel', VERDICT r3
    #3): instead of 8 per-row (block_l, lg) @ (lg, hd) matmuls, build the
    whole band's P tile (block_l, rows*lg) in one vectorized pass and issue
    ONE (block_l, rows*lg) @ (rows*lg, hd) matmul — an 8x longer contraction
    dim amortizes the hd=32 lane underfill that killed the per-row kernel.
    The exact row-band skip is unchanged: encoder queries are raster-ordered
    grid cells, so a query tile's tent support touches only a couple of
    bands and inactive tile-pairs cost nothing."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    gx = gx_ref[0]  # (BL, P) f32
    gy = gy_ref[0]
    aw = aw_ref[0]
    r0 = (k * rows).astype(jnp.float32)

    gymin = jnp.min(gy)
    gymax = jnp.max(gy)
    active = (gymax > r0 - 1.0) & (gymin < r0 + rows)

    @pl.when(active)
    def _():
        bl = gx.shape[0]
        bk = rows * lg
        cidx = jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1)
        yco = r0 + (cidx // lg).astype(jnp.float32)  # band row per column
        xco = (cidx % lg).astype(jnp.float32)  # x cell per column
        p_band = jnp.zeros((bl, bk), jnp.float32)
        for p in range(npts):
            ty = jnp.maximum(0.0, 1.0 - jnp.abs(gy[:, p : p + 1] - yco))
            tx = jnp.maximum(0.0, 1.0 - jnp.abs(gx[:, p : p + 1] - xco))
            p_band += aw[:, p : p + 1] * ty * tx
        prec = (
            jax.lax.Precision.DEFAULT
            if v_ref.dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST
        )
        acc_ref[...] += jnp.dot(
            p_band.astype(v_ref.dtype),
            v_ref[0],
            preferred_element_type=jnp.float32,
            precision=prec,
        )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        out_ref[0] = acc_ref[...]


def _tent_sample_level_band(
    gx, gy, aw, v, h: int, w: int, *, block_l: int = 256, rows: int | None = None, interpret: bool = False
):
    bh, l, npts = gx.shape
    hd = v.shape[-1]
    block_l = min(block_l, _round_up(l, 128))
    lp = _round_up(l, block_l)

    lg = _round_up(w, 128)
    if rows is None:
        rows = max(1, 1024 // lg)
    hp = _round_up(h, rows)
    v = v.reshape(bh, h, w, hd)
    v = jnp.pad(v, ((0, 0), (0, hp - h), (0, lg - w), (0, 0))).reshape(bh, hp * lg, hd)

    pad_l = lp - l
    if pad_l:
        gx = jnp.pad(gx, ((0, 0), (0, pad_l), (0, 0)))
        gy = jnp.pad(gy, ((0, 0), (0, pad_l), (0, 0)))
        aw = jnp.pad(aw, ((0, 0), (0, pad_l), (0, 0)))

    block_k = rows * lg
    grid = (bh, lp // block_l, hp // rows)
    out = pl.pallas_call(
        functools.partial(_tent_band_kernel, rows=rows, lg=lg, npts=npts),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_l, npts), lambda b, i, k: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, npts), lambda b, i, k: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, npts), lambda b, i, k: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, hd), lambda b, i, k: (b, k, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_l, hd), lambda b, i, k: (b, i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((block_l, hd), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((bh, lp, hd), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bh * lp * hp * lg * hd + 8 * npts * bh * lp * hp * lg,
            bytes_accessed=4 * bh * (3 * lp * npts + hp * lg * hd + lp * hd),
            transcendentals=0,
        ),
        interpret=interpret,
    )(gx.astype(jnp.float32), gy.astype(jnp.float32), aw.astype(jnp.float32), v)
    return out[:, :l]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def tent_sample_level_band(gx, gy, aw, v, h: int, w: int, interpret: bool = False):
    """Band-tiled fused P@V deformable sampling (one matmul per row band).

    Differentiable: backward uses the jnp twin's VJP (identical numerics).
    """
    return _tent_sample_level_band(gx, gy, aw, v, h, w, interpret=interpret)


def _fwd_band(gx, gy, aw, v, h, w, interpret):
    return tent_sample_level_band(gx, gy, aw, v, h, w, interpret), (gx, gy, aw, v)


def _bwd_band(h, w, interpret, res, g):
    gx, gy, aw, v = res
    _, vjp = jax.vjp(lambda a, b, c, d: tent_sample_level_xla(a, b, c, d, h, w), gx, gy, aw, v)
    return vjp(g)


tent_sample_level_band.defvjp(_fwd_band, _bwd_band)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def tent_sample_level(gx, gy, aw, v, h: int, w: int, interpret: bool = False):
    """Fused P@V deformable sampling for one level. See module docstring.

    Differentiable: backward uses the jnp twin's VJP (identical numerics).
    """
    return _tent_sample_level_pallas(gx, gy, aw, v, h, w, interpret=interpret)


def _fwd(gx, gy, aw, v, h, w, interpret):
    return tent_sample_level(gx, gy, aw, v, h, w, interpret), (gx, gy, aw, v)


def _bwd(h, w, interpret, res, g):
    gx, gy, aw, v = res
    _, vjp = jax.vjp(lambda a, b, c, d: tent_sample_level_xla(a, b, c, d, h, w), gx, gy, aw, v)
    return vjp(g)


tent_sample_level.defvjp(_fwd, _bwd)
