"""RLE codec round-trip + mAP metric sanity tests."""

import numpy as np
import pytest

from rgbdseg_tpu.inference import rle
from rgbdseg_tpu.train.map_metric import MeanAveragePrecision, mask_iou


@pytest.mark.parametrize("seed", range(5))
def test_rle_roundtrip(seed):
    rng = np.random.RandomState(seed)
    mask = rng.rand(37, 53) > 0.6
    enc = rle.encode(mask)
    assert isinstance(enc["counts"], str)
    dec = rle.decode(enc)
    np.testing.assert_array_equal(dec.astype(bool), mask)
    assert rle.area(enc) == mask.sum()


def test_rle_edge_cases():
    for mask in (np.zeros((5, 7), bool), np.ones((5, 7), bool)):
        np.testing.assert_array_equal(rle.decode(rle.encode(mask)).astype(bool), mask)


def test_rle_string_format_known_value():
    # A mask whose counts are [3, 2, 1]: pycocotools encodes small positives
    # directly; verify round-trip through the string codec.
    counts = np.asarray([3, 2, 1, 7, 100, 5000], np.int64)
    s = rle.encode_counts_string(counts)
    np.testing.assert_array_equal(rle.decode_counts_string(s), counts)


def _pred(scores, labels, masks):
    return {"scores": np.asarray(scores), "labels": np.asarray(labels), "masks": np.asarray(masks)}


def _tgt(labels, masks):
    return {"labels": np.asarray(labels), "masks": np.asarray(masks)}


def test_map_perfect_predictions():
    rng = np.random.RandomState(0)
    masks = rng.rand(3, 40, 40) > 0.5
    m = MeanAveragePrecision()
    m.update([_pred([0.9, 0.8, 0.7], [0, 1, 1], masks)], [_tgt([0, 1, 1], masks)])
    out = m.compute()
    assert out["map"] == pytest.approx(1.0)
    assert out["map_50"] == pytest.approx(1.0)
    assert out["mar_100"] == pytest.approx(1.0)


def test_map_miss_and_fp():
    rng = np.random.RandomState(1)
    gt = rng.rand(2, 40, 40) > 0.5
    # one perfect hit, one pure false positive, one GT missed
    fp = rng.rand(40, 40) > 0.97
    m = MeanAveragePrecision()
    m.update(
        [_pred([0.9, 0.8], [0, 0], np.stack([gt[0], fp]))],
        [_tgt([0, 0], gt)],
    )
    out = m.compute()
    # recall = 0.5, precision at that recall = 1.0 -> AP ≈ 0.5 (101-pt interp
    # includes recall=0.5 point). torchmetrics/COCO gives ~0.504.
    assert 0.45 < out["map_50"] < 0.55


def test_map_class_separation():
    rng = np.random.RandomState(2)
    masks = rng.rand(2, 30, 30) > 0.5
    m = MeanAveragePrecision()
    # class 0 predicted perfectly; class 1 predicted with the wrong mask
    wrong = rng.rand(30, 30) > 0.97
    m.update(
        [_pred([0.9, 0.9], [0, 1], np.stack([masks[0], wrong]))],
        [_tgt([0, 1], masks)],
    )
    out = m.compute()
    assert out["map_per_class"][0] == pytest.approx(1.0)
    assert out["map_per_class"][1] == pytest.approx(0.0)


def test_mask_iou():
    a = np.zeros((2, 4, 4), bool)
    a[0, :2] = True
    a[1, 2:] = True
    iou = mask_iou(a, a)
    np.testing.assert_allclose(iou, np.eye(2))


def test_postprocess_no_survivors():
    """Zero candidates (all below threshold) must yield an empty (0, H, W)
    binary map, not a reshape error (regression: caught by the e2e drive)."""
    from rgbdseg_tpu.inference.postprocess import post_process_instance_segmentation

    rng = np.random.RandomState(0)
    cls_logits = rng.randn(2, 5, 4).astype(np.float32)
    mask_logits = rng.randn(2, 5, 16, 16).astype(np.float32)
    res = post_process_instance_segmentation(
        cls_logits, mask_logits, threshold=2.0, target_sizes=[(24, 32), (16, 16)]
    )
    assert res[0]["segmentation"].shape == (0, 24, 32)
    assert res[0]["segments_info"] == []
    assert res[1]["segmentation"].shape == (0, 16, 16)
