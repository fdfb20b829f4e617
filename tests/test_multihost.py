"""Multi-host feeding helpers (parallel.multihost).

The reference's only scale-out surface is single-process DDP-via-Trainer
(SURVEY.md §2.7); our multi-host path splits each deterministic global batch
into per-process row blocks and reassembles it with
`make_array_from_process_local_data`. Real multi-process runs need a cluster;
these tests pin the pure row math and the single-process degenerate paths the
trainer exercises unconditionally.
"""

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from rgbdseg_tpu.parallel.mesh import make_mesh
from rgbdseg_tpu.parallel.multihost import (
    _rows_for_process,
    global_batch_array,
    host_row_range,
)


def test_rows_for_process_partitions_batch():
    # 4 data-axis indices owned by 2 processes, B=8 -> contiguous 4-row blocks
    procs = [0, 0, 1, 1]
    assert _rows_for_process(procs, 0, 8) == (0, 4)
    assert _rows_for_process(procs, 1, 8) == (4, 8)
    # every row owned exactly once
    spans = [_rows_for_process(procs, p, 8) for p in (0, 1)]
    covered = sorted(r for s, e in spans for r in range(s, e))
    assert covered == list(range(8))


def test_rows_for_process_errors():
    with pytest.raises(ValueError, match="not divisible"):
        _rows_for_process([0, 1], 0, 3)
    with pytest.raises(ValueError, match="non-contiguous"):
        _rows_for_process([0, 1, 0], 0, 6)
    # a process with no data-axis indices loads nothing
    assert _rows_for_process([0, 0], 1, 4) == (0, 0)


def test_host_row_range_single_process_owns_all():
    mesh = make_mesh(num_devices=4)
    assert host_row_range(8, mesh) == (0, 8)


def test_global_batch_array_single_process_is_device_put():
    mesh = make_mesh(num_devices=4)
    sharding = NamedSharding(mesh, P("data"))
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    arr = global_batch_array(sharding, x, 8)
    assert arr.shape == (8, 3)
    np.testing.assert_array_equal(np.asarray(arr), x)
    assert arr.sharding.is_equivalent_to(sharding, ndim=2)


def test_pipeline_local_rows_slices_every_batch(tmp_path):
    """batches(local_rows=(s, e)) yields exactly rows [s, e) of the batches the
    full iteration would produce — byte-identical, including the padded tail."""
    from rgbdseg_tpu.data import synthetic
    from rgbdseg_tpu.data.pipeline import SegmentationDataset, load_meta
    from rgbdseg_tpu.config import PreprocessConfig

    fx = synthetic.generate(str(tmp_path), num_train=5, num_valid=1, size=(32, 40))
    cfg = PreprocessConfig(height=32, width=32)
    ds = SegmentationDataset(load_meta(fx["train"], fx["root"]), "0.0.0", cfg, max_instances=8)
    full = list(ds.batches(4, shuffle=True, seed=7, epoch=1))
    half = list(ds.batches(4, shuffle=True, seed=7, epoch=1, local_rows=(2, 4)))
    assert len(full) == len(half) == 2
    for fb, hb in zip(full, half):
        assert hb.pixel_values.shape[0] == 2
        np.testing.assert_array_equal(hb.pixel_values, fb.pixel_values[2:4])
        np.testing.assert_array_equal(hb.mask_labels, fb.mask_labels[2:4])
        np.testing.assert_array_equal(hb.class_labels, fb.class_labels[2:4])
        np.testing.assert_array_equal(hb.valid, fb.valid[2:4])
