"""Differential test: the evaluator's device-stats fast path must produce the
same mAP as the host mask path (which is itself pinned against the in-repo
COCOeval oracle by test_map_differential.py).

The device path (inference/postprocess._eval_stats_device +
map_metric.update_precomputed) never moves masks to the host: IoU
intersections and areas are f32 integer counts computed on device with
nearest-resize indices identical to the host `_resize_nearest_np`, so the
metric inputs are equal up to jit-fusion ULPs in the (rounded-to-6-decimals)
scores.
"""

import numpy as np
import pytest

from rgbdseg_tpu.data.pipeline import Batch
from rgbdseg_tpu.train.evaluator import Evaluator


def _random_batch(rng, b, t, gh, gw, orig=None, empty_gt_row=False):
    masks = np.zeros((b, t, gh, gw), np.float32)
    valid = np.zeros((b, t), bool)
    for i in range(b):
        nt = 0 if (empty_gt_row and i == 0) else rng.randint(1, t + 1)
        for j in range(nt):
            y0, x0 = rng.randint(0, gh // 2), rng.randint(0, gw // 2)
            hh, ww = rng.randint(4, gh // 2), rng.randint(4, gw // 2)
            masks[i, j, y0 : y0 + hh, x0 : x0 + ww] = 1.0
            valid[i, j] = True
    return Batch(
        pixel_values=np.zeros((b, gh, gw, 3), np.float32),
        mask_labels=masks,
        class_labels=rng.randint(0, 5, (b, t)).astype(np.int32),
        valid=valid,
        orig_sizes=None if orig is None else np.tile([list(orig)], (b, 1)).astype(np.int32),
    )


def _run(monkeypatch, device: bool, batches, logits, threshold, original):
    monkeypatch.setenv("RGBDSEG_EVAL_DEVICE_STATS", "1" if device else "0")
    ev = Evaluator(
        {i: str(i) for i in range(5)}, threshold=threshold, eval_at_original_size=original
    )
    for batch, (cl, ml) in zip(batches, logits):
        ev.update(cl, ml, batch)
    return ev.compute()


@pytest.mark.parametrize(
    "gh,gw,orig,threshold",
    [
        (48, 64, None, 0.0),  # evaluate at the preprocessed size
        (48, 64, (96, 120), 0.0),  # original-size eval: both sides resized
        (45, 67, (45, 67), 0.0),  # gh*gw not a multiple of 8 (packbits pad)
        (48, 64, None, 0.5),  # threshold filtering drops most dets
    ],
)
def test_device_stats_matches_host_path(monkeypatch, gh, gw, orig, threshold):
    rng = np.random.RandomState(0)
    b, t, q = 2, 6, 12
    batches, logits = [], []
    for k in range(3):
        batches.append(_random_batch(rng, b, t, gh, gw, orig=orig, empty_gt_row=(k == 0)))
        cl = rng.randn(b, q, 6).astype(np.float32) * 2
        ml = rng.randn(b, q, gh // 4, gw // 4).astype(np.float32)
        logits.append((cl, ml))
    original = orig is not None
    host = _run(monkeypatch, False, batches, logits, threshold, original)
    dev = _run(monkeypatch, True, batches, logits, threshold, original)
    assert set(host) == set(dev)
    for k in host:
        assert host[k] == pytest.approx(dev[k], rel=1e-6, abs=1e-9), k


def test_update_precomputed_equals_mask_update():
    """Exact-math check: update_precomputed fed integer counts produces
    bit-identical stats to the mask-based update."""
    from rgbdseg_tpu.train.map_metric import MeanAveragePrecision

    rng = np.random.RandomState(1)
    n, m, h, w = 7, 5, 33, 41
    dmasks = rng.rand(n, h, w) > 0.6
    gmasks = rng.rand(m, h, w) > 0.6
    scores = np.round(rng.rand(n), 6)
    labels = rng.randint(0, 3, n)
    glabels = rng.randint(0, 3, m)

    m1 = MeanAveragePrecision(class_metrics=True)
    m1.update(
        [{"scores": scores, "labels": labels, "masks": dmasks}],
        [{"labels": glabels, "masks": gmasks}],
    )
    r1 = m1.compute()

    inter = dmasks.reshape(n, -1).astype(np.float64) @ gmasks.reshape(m, -1).T.astype(np.float64)
    m2 = MeanAveragePrecision(class_metrics=True)
    m2.update_precomputed(
        scores, labels, dmasks.sum((1, 2)), inter, glabels, gmasks.sum((1, 2))
    )
    r2 = m2.compute()
    assert set(r1) == set(r2)
    for k in r1:
        np.testing.assert_array_equal(np.asarray(r1[k]), np.asarray(r2[k]), err_msg=k)


def test_deferred_drain_semantics(monkeypatch):
    """The device-stats path defers metric updates behind a small queue
    (evaluator.py:_update_device_stats) so the tunnel RTT + host metric work
    overlap device compute. Pin the queue's semantics: depth-0 (synchronous)
    and the default deferred mode produce identical metrics; reset() discards
    pending updates (bench.py relies on this to drop its warmup batch); and
    updates stay queued until flush()/compute()."""
    monkeypatch.setenv("RGBDSEG_EVAL_DEVICE_STATS", "1")
    rng = np.random.RandomState(7)
    b, t, q, gh, gw = 2, 4, 8, 32, 40
    batches, logits = [], []
    for _ in range(4):
        batches.append(_random_batch(rng, b, t, gh, gw))
        cl = rng.randn(b, q, 6).astype(np.float32) * 2
        ml = rng.randn(b, q, gh // 4, gw // 4).astype(np.float32)
        logits.append((cl, ml))

    def run(depth_env):
        if depth_env is not None:
            monkeypatch.setenv("RGBDSEG_EVAL_PIPELINE_DEPTH", depth_env)
        else:
            monkeypatch.delenv("RGBDSEG_EVAL_PIPELINE_DEPTH", raising=False)
        ev = Evaluator({i: str(i) for i in range(5)}, threshold=0.0)
        # reset() after a warmup update must leave no trace
        ev.update(*logits[-1], batches[-1])
        ev.reset()
        assert not ev._pending
        for batch, (cl, ml) in zip(batches, logits):
            ev.update(cl, ml, batch)
        return ev

    ev_sync = run("0")
    assert not ev_sync._pending  # drained as it goes
    sync_metrics = ev_sync.compute()

    ev_def = run(None)
    assert len(ev_def._pending) == 2  # 4 updates, default depth 2
    deferred_metrics = ev_def.compute()  # compute() flushes the tail
    assert not ev_def._pending

    assert set(sync_metrics) == set(deferred_metrics)
    for k in sync_metrics:
        assert sync_metrics[k] == pytest.approx(deferred_metrics[k], rel=1e-9, abs=1e-12), k
