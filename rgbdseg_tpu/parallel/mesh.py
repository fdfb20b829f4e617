"""Mesh construction + sharding rules.

The reference's only parallelism is torch-DDP-via-Trainer (SURVEY.md §2.7); the
TPU-native replacement is a `jax.sharding.Mesh` with a `data` axis (batch
sharded over ICI) and a reserved `model` axis kept for tensor-parallel
extensions. Gradient all-reduces are XLA-inserted from the shardings — no
explicit collectives in user code. Multi-host: initialize jax.distributed
before calling make_mesh and the same code paths apply (DCN between slices).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, model_axis: int = 1) -> Mesh:
    """Mesh(('data', 'model')) over the first `num_devices` devices; the model
    axis defaults to 1 (pure DP) but keeps the axis name available."""
    devs = jax.devices()
    n = num_devices or len(devs)
    if n > len(devs):
        # The axon TPU plugin registers even under JAX_PLATFORMS=cpu (PERF.md
        # rule 5), so the default backend can be a single real chip while the
        # virtual 8-device CPU platform holds the requested mesh size.
        cpu = jax.devices("cpu")
        if n <= len(cpu):
            devs = cpu
    if n % model_axis:
        raise ValueError(f"{n} devices not divisible by model_axis={model_axis}")
    grid = np.asarray(devs[:n]).reshape(n // model_axis, model_axis)
    return Mesh(grid, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
