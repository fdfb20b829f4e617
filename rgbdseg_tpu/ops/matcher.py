"""On-device Hungarian assignment (Jonker–Volgenant shortest augmenting path).

The reference matcher ships every cost matrix to SciPy on the host
(HF modeling_mask2former.py:474-475, `linear_sum_assignment(cost_matrix.cpu())`)
— a device→host sync per sample per decoder layer. Here the assignment runs
inside jit as `lax` loops and vmaps over the batch, so the whole train step is
one XLA program.

Shape convention: cost is (R, C) with R <= C (rows = padded targets,
cols = queries). Invalid (padding) rows should be given a constant cost across
all columns — any uniform value works: uniform rows cannot change which columns
the real rows optimally receive, only absorb leftover columns.

Algorithm: classic O(R·C²) dual-potential shortest augmenting path (the same
algorithm family SciPy uses), with the inner column scan vectorized.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# plain numpy scalar: a module-level jnp constant would initialize the XLA
# backend at import time, breaking jax.distributed.initialize ordering
INF = np.float32(1e18)


@functools.partial(jax.jit, static_argnames=())
def hungarian(cost: jnp.ndarray) -> jnp.ndarray:
    """Solve min-cost assignment for (R, C) cost, R <= C.

    Returns col4row (R,) int32: the column assigned to each row. The total cost
    matches scipy.optimize.linear_sum_assignment; the argmin itself may differ
    on ties.
    """
    r, c = cost.shape
    cost = cost.astype(jnp.float32)

    # Potentials and matching state. row4col[j] = row matched to column j, -1 if free.
    u0 = jnp.zeros((r,), jnp.float32)
    v0 = jnp.zeros((c,), jnp.float32)
    row4col0 = jnp.full((c,), -1, jnp.int32)
    col4row0 = jnp.full((r,), -1, jnp.int32)

    def assign_row(state, cur_row):
        u, v, row4col, col4row = state

        # Dijkstra over columns.
        minv = jnp.full((c,), INF)
        way = jnp.full((c,), -1, jnp.int32)  # predecessor column on path
        used = jnp.zeros((c,), bool)

        def cond(carry):
            _, _, _, _, _, _, done = carry
            return ~done

        def body(carry):
            minv, way, used, i0, j0, shift, _ = carry
            # Relax edges from row i0 (reached at path distance `shift`).
            cur = shift + cost[i0] - u[i0] - v
            better = (cur < minv) & (~used)
            minv = jnp.where(better, cur, minv)
            way = jnp.where(better, j0, way)
            # Finalize the unused column with minimal path distance.
            masked = jnp.where(used, INF, minv)
            j1 = jnp.argmin(masked)
            used1 = used.at[j1].set(True)
            i1 = row4col[j1]
            done = i1 < 0
            return (minv, way, used1, jnp.where(done, i0, i1), j1, minv[j1], done)

        # First step starts from cur_row at distance 0, no visited columns.
        minv, way, used, _, j_free, _, _ = jax.lax.while_loop(
            cond, body, (minv, way, used, cur_row, jnp.int32(-1), jnp.float32(0.0), False)
        )

        # Update potentials by delta = minv[j_free].
        delta = minv[j_free]
        on_path = used  # columns finalized during the search
        # Rows touched: cur_row plus rows matched to finalized columns.
        u = u.at[cur_row].add(delta)
        row_ids = jnp.where(on_path, row4col, -1)
        add_mask = row_ids >= 0
        u = u.at[jnp.where(add_mask, row_ids, 0)].add(
            jnp.where(add_mask, delta - minv, 0.0)
        )
        v = v + jnp.where(on_path, minv - delta, 0.0)

        # Augment along the alternating path ending at j_free.
        def aug_cond(carry):
            j, _, _, done = carry
            return ~done

        def aug_body(carry):
            j, row4col, col4row, _ = carry
            jprev = way[j]
            # The row to move into column j: either the row previously matched
            # to jprev, or cur_row if jprev == -1 (path start).
            i = jnp.where(jprev < 0, cur_row, row4col[jprev])
            row4col = row4col.at[j].set(i)
            col4row = col4row.at[i].set(j)
            return (jprev, row4col, col4row, jprev < 0)

        _, row4col, col4row, _ = jax.lax.while_loop(
            aug_cond, aug_body, (j_free, row4col, col4row, False)
        )
        return (u, v, row4col, col4row), None

    (u, v, row4col, col4row), _ = jax.lax.scan(
        assign_row, (u0, v0, row4col0, col4row0), jnp.arange(r, dtype=jnp.int32)
    )
    return col4row


def hungarian_batch(cost: jnp.ndarray) -> jnp.ndarray:
    """(B, R, C) -> (B, R) column assignment per row."""
    return jax.vmap(hungarian)(cost)
