"""Multi-host (multi-process) training: distributed init + per-host data feeding.

The reference's only scale-out surface is single-process torch-DDP-via-Trainer
(SURVEY.md §2.7). The TPU-native multi-host design: every host runs this same
program (`initialize()` → `jax.distributed.initialize`), loads ONLY its rows of
each global batch from its local input pipeline, and the global on-device batch
is assembled with `jax.make_array_from_process_local_data` — no host ever
materializes the full global batch, and cross-host traffic is only the XLA
collectives over DCN that GSPMD inserts from the shardings.

Single-process behavior is identical to a plain `device_put` (the trainer uses
these helpers unconditionally-safe: they degrade to the local path when
`jax.process_count() == 1`).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """`jax.distributed.initialize` passthrough.

    No-op for single-process runs (nothing configured and no cluster env);
    TPU pods auto-detect all three arguments from the environment. Manual
    clusters (e.g. the 2-process localhost CPU run in
    tests/test_multihost_exec.py) configure via JAX_COORDINATOR_ADDRESS +
    JAX_NUM_PROCESSES + JAX_PROCESS_ID env vars — jax itself has no generic
    env-var cluster detector, so parse them here and pass explicitly.
    """
    configured = (
        coordinator_address
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("COORDINATOR_ADDRESS")
    )
    if not configured and num_processes is None and process_id is None:
        return
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=configured,
        num_processes=num_processes,
        process_id=process_id,
    )


def _rows_for_process(proc_of_data_index: list[int], process_id: int, global_batch: int) -> tuple[int, int]:
    """Pure row-range math: data-axis index i owns rows
    [i*B/D, (i+1)*B/D); a process owns the union of its indices' blocks.

    Requires each process's data-axis indices to be contiguous (true for
    standard mesh construction from `jax.devices()`, which orders devices by
    process) and B divisible by D (the trainer pads batches to divisibility).
    """
    d = len(proc_of_data_index)
    if global_batch % d:
        raise ValueError(f"global batch {global_batch} not divisible by data axis {d}")
    rows_per = global_batch // d
    mine = [i for i, p in enumerate(proc_of_data_index) if p == process_id]
    if not mine:
        return (0, 0)
    if mine != list(range(mine[0], mine[-1] + 1)):
        raise ValueError(f"process {process_id} owns non-contiguous data-axis indices {mine}")
    return (mine[0] * rows_per, (mine[-1] + 1) * rows_per)


def host_row_range(global_batch: int, mesh: Mesh) -> tuple[int, int]:
    """Half-open [start, stop) of global-batch rows THIS process must load.

    Batch rows shard over the mesh's 'data' axis; a data-axis index's devices
    (its row of the device grid) live on one process for standard meshes, so
    ownership is decided by the first device of each grid row.
    """
    grid = mesh.devices  # (data, model)
    procs = [int(grid[i].flat[0].process_index) for i in range(grid.shape[0])]
    return _rows_for_process(procs, jax.process_index(), global_batch)


def global_batch_array(
    sharding: NamedSharding, local_rows: np.ndarray, global_batch: int
) -> jax.Array:
    """Per-host rows -> one global jax.Array sharded by `sharding`.

    local_rows must be exactly this process's `host_row_range` block, in order.
    Single-process: equivalent to `jax.device_put(local_rows, sharding)`.
    """
    if jax.process_count() == 1:
        return jax.device_put(local_rows, sharding)
    global_shape = (global_batch,) + tuple(local_rows.shape[1:])
    return jax.make_array_from_process_local_data(sharding, local_rows, global_shape)
