"""Tensor-parallel (Megatron-style) parameter sharding rules.

The reference has no tensor parallelism (its only scale-out surface is
torch-DDP, SURVEY.md §2.7); this is the TPU-native extension for scaling past
one chip's HBM/FLOPs: parameters of the transformer blocks are sharded over the
mesh's `model` axis and XLA's SPMD partitioner (GSPMD) inserts the collectives.
No collective appears in user code — the specs below are the whole design.

Layout (standard Megatron pairing, so each block needs one all-reduce in
forward and one in backward, riding ICI):
- column-parallel (kernel (in, out) -> P(None, 'model'), bias P('model')):
  QKV projections, deformable value_proj, first MLP layers — outputs are
  head/hidden-sharded, which propagates through the per-head attention math
  (head counts are divisible by the model axis for all non-tiny configs).
- row-parallel (kernel -> P('model', None), bias replicated): attention output
  projections and second MLP layers — contracting the sharded dim triggers the
  block's single all-reduce.
- everything else (norms, embeddings, convs, heads, fusion modules) replicated.

Correctness does not depend on the rules being exhaustive: GSPMD propagates
any consistent assignment; the rules only decide what is distributed.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Flax module names whose Dense kernels shard column-parallel / row-parallel.
_COL = {"query", "key", "value", "q_proj", "k_proj", "v_proj", "value_proj", "mlp_fc1", "fc1"}
_ROW = {"proj", "out_proj", "output_proj", "mlp_fc2", "fc2"}


def _spec_for(path: tuple, leaf) -> P:
    names = [getattr(p, "key", getattr(p, "name", None)) for p in path]
    module = names[-2] if len(names) >= 2 else None
    kind = names[-1]
    if getattr(leaf, "ndim", 0) == 2 and kind == "kernel":
        if module in _COL:
            return P(None, "model")
        if module in _ROW:
            return P("model", None)
    if getattr(leaf, "ndim", 0) == 1 and kind == "bias" and module in _COL:
        return P("model")
    return P()


def megatron_param_specs(params) -> "jax.tree_util.PyTreeDef":
    """params pytree -> matching pytree of PartitionSpec."""
    return jax.tree_util.tree_map_with_path(_spec_for, params)


def shard_params(params, mesh: Mesh):
    """device_put each param with its megatron spec over `mesh`."""
    specs = megatron_param_specs(params)
    return jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)), params, specs
    )
