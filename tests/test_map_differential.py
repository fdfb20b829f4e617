"""Randomized differential test: production mAP metric vs the independent
loop-based COCOeval oracle (tests/_cocoeval_oracle.py).

Addresses the round-1 verdict: the 234-LoC reimplemented COCOeval protocol in
rgbdseg_tpu/train/map_metric.py was pinned by only 3 hand-built cases; greedy
matching corner rules (ignored-gt break, area-range det ignore, maxDets
truncation) are exactly where reimplementations silently diverge. Here the two
implementations are exercised on 120 random synthetic images covering those
corners and must agree to 1e-9 on every reported scalar.

Reference semantics: torchmetrics MeanAveragePrecision(iou_type="segm")
(model_essential_part.py:56-58), whose backend is pycocotools COCOeval.
"""

import time

import numpy as np
import pytest

from rgbdseg_tpu.train.map_metric import MeanAveragePrecision

from _cocoeval_oracle import evaluate as oracle_evaluate


def _rand_mask(rng, h, w, kind):
    """Rectangle mask sized to land in a specific COCO area range."""
    if kind == "small":  # area < 32^2
        mh, mw = rng.integers(2, 30), rng.integers(2, 30)
    elif kind == "medium":  # 32^2 <= area < 96^2
        mh, mw = rng.integers(34, 90), rng.integers(34, 90)
    else:  # large: area >= 96^2
        mh, mw = rng.integers(98, h), rng.integers(98, w)
    y = rng.integers(0, h - mh + 1)
    x = rng.integers(0, w - mw + 1)
    m = np.zeros((h, w), bool)
    m[y : y + mh, x : x + mw] = True
    return m


def _random_image(rng, h=160, w=160, num_classes=3):
    """One synthetic image: gts + predictions that sometimes overlap gts
    (jittered copies, duplicates for maxDets/greedy corners), sometimes not."""
    kinds = ["small", "medium", "large"]
    ng = int(rng.integers(0, 6))
    g_masks, g_labels = [], []
    for _ in range(ng):
        g_masks.append(_rand_mask(rng, h, w, kinds[rng.integers(3)]))
        g_labels.append(int(rng.integers(num_classes)))

    d_masks, d_labels, d_scores = [], [], []
    for gi in range(ng):
        # 0-3 jittered detections per gt => duplicate-match and tie corners
        for _ in range(int(rng.integers(0, 4))):
            m = np.roll(g_masks[gi], (int(rng.integers(-8, 9)), int(rng.integers(-8, 9))), (0, 1))
            d_masks.append(m)
            d_labels.append(
                g_labels[gi] if rng.random() < 0.8 else int(rng.integers(num_classes))
            )
            d_scores.append(float(rng.random()))
    for _ in range(int(rng.integers(0, 4))):  # pure false positives
        d_masks.append(_rand_mask(rng, h, w, kinds[rng.integers(3)]))
        d_labels.append(int(rng.integers(num_classes)))
        d_scores.append(float(rng.random()))
    # duplicated scores => stable-sort tie-break corner
    if len(d_scores) >= 2 and rng.random() < 0.5:
        d_scores[-1] = d_scores[0]

    stack = lambda ms: np.stack(ms) if ms else np.zeros((0, h, w), bool)
    pred = {
        "scores": np.array(d_scores, np.float64),
        "labels": np.array(d_labels, np.int64),
        "masks": stack(d_masks),
    }
    tgt = {"labels": np.array(g_labels, np.int64), "masks": stack(g_masks)}
    return pred, tgt


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_randomized_differential_vs_oracle(seed):
    rng = np.random.default_rng(seed)
    preds, tgts = [], []
    for _ in range(40):
        p, t = _random_image(rng)
        preds.append(p)
        tgts.append(t)

    metric = MeanAveragePrecision(class_metrics=True)
    metric.update(preds, tgts)
    ours = metric.compute()
    ref = oracle_evaluate(preds, tgts)

    assert ours["classes"] == ref["classes"]
    for k in [
        "map", "map_50", "map_75", "map_small", "map_medium", "map_large",
        "mar_1", "mar_10", "mar_100", "mar_small", "mar_medium", "mar_large",
    ]:
        assert ours[k] == pytest.approx(ref[k], abs=1e-9), k
    np.testing.assert_allclose(ours["map_per_class"], ref["map_per_class"], atol=1e-9)
    np.testing.assert_allclose(
        ours["mar_100_per_class"], ref["mar_100_per_class"], atol=1e-9
    )


def test_maxdets_truncation_differential():
    """>10 detections on one gt: exercises maxDets=1/10 truncation order."""
    rng = np.random.default_rng(7)
    h = w = 96
    gt = {"labels": np.array([0]), "masks": np.ones((1, h, w), bool)[:, 20:70, 20:70]}
    gt_mask = np.zeros((1, h, w), bool)
    gt_mask[0, 20:70, 20:70] = True
    gt["masks"] = gt_mask
    n = 15
    masks = np.stack(
        [np.roll(gt_mask[0], (int(rng.integers(-5, 6)), 0), (0, 1)) for _ in range(n)]
    )
    pred = {
        "scores": rng.random(n),
        "labels": np.zeros(n, np.int64),
        "masks": masks,
    }
    metric = MeanAveragePrecision()
    metric.update([pred], [gt])
    ours = metric.compute()
    ref = oracle_evaluate([pred], [gt])
    for k in ("map", "mar_1", "mar_10", "mar_100"):
        assert ours[k] == pytest.approx(ref[k], abs=1e-9), k


def test_dataset_scale_eval_is_fast():
    """500-image synthetic set must evaluate in seconds (round-1 verdict #2:
    the interpreted triple loop would crawl at NYUv2 scale)."""
    rng = np.random.default_rng(3)
    metric = MeanAveragePrecision(class_metrics=True)
    for _ in range(10):
        preds, tgts = [], []
        for _ in range(50):
            p, t = _random_image(rng, h=120, w=120, num_classes=5)
            preds.append(p)
            tgts.append(t)
        metric.update(preds, tgts)
    t0 = time.monotonic()
    out = metric.compute()
    dt = time.monotonic() - t0
    assert out["map"] >= 0
    assert dt < 30.0, f"500-image eval took {dt:.1f}s"
