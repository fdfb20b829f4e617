"""Fused masked cross-attention (Pallas TPU kernel).

Mask2Former's masked cross-attention (HF modeling_mask2former.py:1595-1652 +
attention-mask construction :1986-2024; reference contract recorded in
experiments/architecture/architecture_change.md:58-61) blocks query->key pairs
where the previous layer's predicted mask probability is < 0.5, except for
queries whose mask blocks every key (those attend unmasked).

This kernel fuses the whole chain — the threshold test `sigmoid(m) < 0.5 <=>
m < 0` is evaluated on raw mask logits inside the kernel, and softmax runs as
an online (flash-style) recurrence over K tiles — so only q/k/v, the
(B, Q, K) mask logits, and the (B, H, Q, hd) output touch HBM.

Measured result (ops/kernels/__init__.py): at Mask2Former's Q=100 the query
tile underfills the MXU and the XLA twin is mildly faster end-to-end, so the
twin is the default path and this kernel is opt-in (RGBDSEG_PALLAS); at
Q >= 1024 the flash-style recurrence is the right trade.

Backward reuses the jnp twin's VJP (`masked_cross_attention_xla`); the mask
path is threshold-only so it carries no gradient, matching the reference's
`attention_mask` (bool) semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def masked_cross_attention_xla(q, k, v, mask_logits, all_blocked):
    """jnp twin (golden reference / non-TPU fallback).

    q: (B, H, Q, hd) pre-scaled; k, v: (B, H, K, hd); mask_logits: (B, Q, K)
    raw (pre-sigmoid) resized mask logits; all_blocked: (B, Q) bool.
    Returns (B, H, Q, hd) in q.dtype.
    """
    blocked = (mask_logits < 0.0) & ~all_blocked[:, :, None]
    bias = jnp.where(blocked[:, None], NEG_INF, 0.0)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) + bias
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", attn.astype(v.dtype), v)


def _mca_kernel(
    q_ref, k_ref, v_ref, m_ref, out_ref, acc_ref, mrun_ref, lrun_ref,
    *, block_k: int, k_total: int,
):
    kidx = pl.program_id(2)

    @pl.when(kidx == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        mrun_ref[...] = jnp.full_like(mrun_ref, -1e30)
        lrun_ref[...] = jnp.zeros_like(lrun_ref)

    q = q_ref[0, 0]  # (BQ, hd)
    k = k_ref[0, 0]  # (BK, hd)
    v = v_ref[0, 0]
    # Explicit precision: the global jax_default_matmul_precision may be
    # float32, which Mosaic rejects for bf16 matmuls (Bad lhs type).
    prec = (
        jax.lax.Precision.DEFAULT
        if q.dtype == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )
    logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32, precision=prec)  # (BQ, BK)

    # all_blocked was folded into m outside (those rows set positive), so the
    # mask test is a single compare against the raw logits.
    col = kidx * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
    bias = jnp.where((col >= k_total) | (m_ref[0] < 0.0), NEG_INF, 0.0)
    logits = logits + bias

    mnew = jnp.maximum(mrun_ref[...], jnp.max(logits, axis=-1, keepdims=True))
    alpha = jnp.exp(mrun_ref[...] - mnew)
    p = jnp.exp(logits - mnew)
    lrun_ref[...] = lrun_ref[...] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32, precision=prec
    )
    mrun_ref[...] = mnew

    @pl.when(kidx == pl.num_programs(2) - 1)
    def _():
        out_ref[0, 0] = (acc_ref[...] / lrun_ref[...]).astype(out_ref.dtype)


def _mca_pallas(q, k, v, mask_logits, all_blocked, *, block_k: int = 1024, interpret: bool = False):
    b, h, nq, hd = q.shape
    nk = k.shape[2]
    bq = _round_up(nq, 128)
    block_k = min(block_k, _round_up(nk, 128))
    kp = _round_up(nk, block_k)

    # Fold the all-blocked exemption into the logits: those queries attend
    # unmasked, which is exactly "mask logits >= 0 everywhere".
    mask_logits = jnp.where(all_blocked[:, :, None], 1.0, mask_logits.astype(jnp.float32))

    if bq - nq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, bq - nq), (0, 0)))
        mask_logits = jnp.pad(mask_logits, ((0, 0), (0, bq - nq), (0, 0)))
    if kp - nk:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, kp - nk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, kp - nk), (0, 0)))
        mask_logits = jnp.pad(mask_logits, ((0, 0), (0, 0), (0, kp - nk)))

    grid = (b, h, kp // block_k)
    out = pl.pallas_call(
        functools.partial(_mca_kernel, block_k=block_k, k_total=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, hd), lambda b, h, k: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, hd), lambda b, h, k: (b, h, k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, hd), lambda b, h, k: (b, h, k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, block_k), lambda b, h, k: (b, 0, k), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, hd), lambda b, h, k: (b, h, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bq, hd), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((b, h, bq, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * bq * kp * hd,
            bytes_accessed=4 * b * (h * (bq + 2 * kp) * hd + bq * kp),
            transcendentals=b * h * bq * kp,
        ),
        interpret=interpret,
    )(q, k, v, mask_logits)
    return out[:, :, :nq]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def masked_cross_attention(q, k, v, mask_logits, all_blocked, interpret: bool = False):
    """Fused masked cross-attention. See module docstring.

    Differentiable in q/k/v (mask inputs are threshold-only, zero gradient) —
    backward uses the jnp twin's VJP.
    """
    return _mca_pallas(q, k, v, mask_logits, all_blocked, interpret=interpret)


def _fwd(q, k, v, mask_logits, all_blocked, interpret):
    return masked_cross_attention(q, k, v, mask_logits, all_blocked, interpret), (
        q, k, v, mask_logits, all_blocked,
    )


def _bwd(interpret, res, g):
    import numpy as np

    q, k, v, mask_logits, all_blocked = res
    _, vjp = jax.vjp(
        lambda a, b, c: masked_cross_attention_xla(a, b, c, mask_logits, all_blocked), q, k, v
    )
    dq, dk, dv = vjp(g)
    # bool primal -> float0 tangent; mask inputs are threshold-only (no grad)
    d_ab = np.zeros(all_blocked.shape, jax.dtypes.float0)
    return dq, dk, dv, jnp.zeros_like(mask_logits), d_ab


masked_cross_attention.defvjp(_fwd, _bwd)
