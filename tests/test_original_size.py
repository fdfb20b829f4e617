"""Original-size (pre-resize) eval + export wiring.

Round-1 verdict #3: the reference post-processes predictions at each image's
original size and nearest-resizes GT masks to match (reference
predictor.py:692-703, resize_masks_to_original_size :1068-1125); the
in-training evaluator uses preprocessed sizes (model_essential_part.py:77-81).
These tests use a fixture whose raw images (96x128) differ from the
preprocess size (64x64) so any confusion of the two sizes fails loudly.
"""

import json

import numpy as np
import pytest

from rgbdseg_tpu.config import PreprocessConfig
from rgbdseg_tpu.data import synthetic
from rgbdseg_tpu.data.pipeline import SegmentationDataset, load_meta
from rgbdseg_tpu.inference import rle as rle_codec
from rgbdseg_tpu.inference.export import gt_to_json, process_prediction
from rgbdseg_tpu.train.evaluator import Evaluator

ORIG = (96, 128)  # raw fixture image size
PP = PreprocessConfig(height=64, width=64)  # != ORIG on purpose


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("orig_size_set")
    fx = synthetic.generate(str(root), num_train=4, num_valid=2, size=ORIG)
    records = load_meta(fx["train"], fx["root"])
    return SegmentationDataset(records, "0.0.0", PP, max_instances=8)


def test_batch_carries_original_sizes(dataset):
    assert dataset.original_size(0) == ORIG
    batch = next(dataset.batches(batch_size=3))
    assert batch.orig_sizes.shape == (3, 2)
    assert (batch.orig_sizes == np.array(ORIG, np.int32)).all()
    assert batch.pixel_values.shape[1:3] == (64, 64)  # still preprocessed


def _fake_logits(b, q=10, num_labels=3, h=16, w=16, seed=0):
    rng = np.random.RandomState(seed)
    return (
        rng.randn(b, q, num_labels + 1).astype(np.float32),
        rng.randn(b, q, h, w).astype(np.float32),
    )


def test_evaluator_original_size(dataset, monkeypatch):
    # Spy on the mask-path metric.update — force the host path (the device
    # stats path never materializes masks; its equivalence is pinned by
    # tests/test_evaluator_device.py).
    monkeypatch.setenv("RGBDSEG_EVAL_DEVICE_STATS", "0")
    batch = next(dataset.batches(batch_size=3))
    cls_logits, mask_logits = _fake_logits(3)

    def spy(ev):
        """Record the mask shapes flowing into the (streaming) metric."""
        seen = []
        orig = ev.metric.update

        def wrapped(preds, targets):
            for p, t in zip(preds, targets):
                seen.append((np.asarray(p["masks"]).shape, np.asarray(t["masks"]).shape))
            return orig(preds, targets)

        ev.metric.update = wrapped
        return seen

    ev = Evaluator({0: "bg", 1: "a", 2: "b"}, threshold=0.0, eval_at_original_size=True)
    seen = spy(ev)
    ev.update(cls_logits, mask_logits, batch)
    assert seen[0][0][-2:] == ORIG  # predictions post-processed at orig size
    assert seen[0][1][-2:] == ORIG  # GT nearest-resized to orig size
    metrics = ev.compute()
    assert np.isfinite(metrics["map"])

    # default: preprocessed size (reference in-training evaluator semantics)
    ev2 = Evaluator({0: "bg", 1: "a", 2: "b"}, threshold=0.0)
    seen2 = spy(ev2)
    ev2.update(cls_logits, mask_logits, batch)
    assert seen2[0][0][-2:] == (64, 64)


def test_export_at_original_size(dataset, tmp_path):
    n = len(dataset)
    outputs = [_fake_logits(n)]
    pred_path = str(tmp_path / "pred.json")
    gt_path = str(tmp_path / "gt.json")
    results = process_prediction(
        outputs, dataset, {0: "bg", 1: "a", 2: "b"},
        prediction_json_path=pred_path, gt_json_path=gt_path, threshold=0.0,
    )
    for res in results:
        assert res["segmentation"].shape[-2:] == ORIG

    with open(pred_path) as f:
        pred_records = json.load(f)
    with open(gt_path) as f:
        gt_records = json.load(f)
    assert pred_records and gt_records
    for r in pred_records + gt_records:
        mask = rle_codec.decode(r["segmentation"])
        assert mask.shape == ORIG

    # GT resize is nearest: decoded instances stay binary and non-empty
    areas = [rle_codec.decode(r["segmentation"]).sum() for r in gt_records]
    assert min(areas) > 0
