"""Hand-traced COCOeval goldens anchored to published pycocotools behavior.

VERDICT r2 #7: the production metric (rgbdseg_tpu/train/map_metric.py) and the
loop-based oracle (tests/_cocoeval_oracle.py) agree to 1e-9 on randomized
inputs, but both were written by the same author — a shared misconception
would survive that differential. pycocotools/torchmetrics are not installable
here, so these cases anchor BOTH implementations to expected values derived
by hand from the published pycocotools algorithm (cocoeval.py), with each rule
cited:

- evaluateImg greedy matching: dets in score order pick the best-IoU gt with
  IoU >= threshold; ignored gts are considered only if no non-ignored gt
  qualifies ("if m > -1 and gtIg[m] == 0 and gtIg[gind] == 1: break").
- dets matched to ignored gts are ignored; UNMATCHED dets whose area lies
  outside the evaluated range are ignored, not counted as FPs.
- maxDets truncates the score-sorted det list BEFORE matching.
- accumulate: 101-point interpolated precision (recThrs 0:.01:1), precision
  envelope from the right, recall = TP/npig at the end of the ranked list.
- summarize: area/class slices with no gts carry precision -1 and are
  EXCLUDED from the mean (they must not drag category means down).

Expected numbers below are exact rationals from those rules (e.g. a single TP
behind one FP gives interpolated precision 0.5 at every recall threshold ->
AP = 0.5; one TP at recall 1/2 gives AP = 51/101: recThrs 0.00..0.50).
All geometry avoids IoU values within 1e-3 of any IoU threshold so f64
boundary behavior cannot flip a match.
"""

import numpy as np
import pytest

from rgbdseg_tpu.train.map_metric import MeanAveragePrecision

from _cocoeval_oracle import evaluate as oracle_evaluate

H = W = 256


def _rect(r0, r1, c0, c1):
    m = np.zeros((H, W), bool)
    m[r0:r1, c0:c1] = True
    return m


def _empty_pred():
    return {
        "scores": np.zeros((0,), np.float64),
        "labels": np.zeros((0,), np.int64),
        "masks": np.zeros((0, H, W), bool),
    }


def _both(preds, tgts):
    metric = MeanAveragePrecision(class_metrics=True)
    metric.update(preds, tgts)
    return metric.compute(), oracle_evaluate(preds, tgts)


def _check(expected, preds, tgts):
    ours, oracle = _both(preds, tgts)
    for k, v in expected.items():
        assert ours[k] == pytest.approx(v, abs=1e-12), f"metric {k}: {ours[k]} != {v}"
        assert oracle[k] == pytest.approx(v, abs=1e-12), f"oracle {k}: {oracle[k]} != {v}"


def test_golden_perfect_single_detection():
    """IoU=1 TP on the only (large) gt: AP=AR=1 everywhere it's defined, -1
    for area ranges with no gt (pycocotools: undefined slices excluded)."""
    gt = _rect(0, 100, 0, 100)  # area 10000 -> large (>= 96^2)
    preds = [{"scores": np.array([0.9]), "labels": np.array([1]), "masks": gt[None]}]
    tgts = [{"labels": np.array([1]), "masks": gt[None]}]
    _check(
        {
            "map": 1.0, "map_50": 1.0, "map_75": 1.0,
            "map_small": -1.0, "map_medium": -1.0, "map_large": 1.0,
            "mar_1": 1.0, "mar_10": 1.0, "mar_100": 1.0,
            "mar_small": -1.0, "mar_medium": -1.0, "mar_large": 1.0,
        },
        preds, tgts,
    )


def test_golden_fp_above_tp_and_area_ignore_and_maxdets():
    """A higher-scored FP above a perfect TP: interpolated precision is 0.5 at
    every recall threshold -> map 0.5 (classic pycocotools case). The FP is
    LARGE (40000 px) while the gt is small: in the small-range eval the
    unmatched out-of-range det is IGNORED (not an FP) -> map_small = 1.0.
    maxDets=1 truncates to just the FP -> mar_1 = 0."""
    gt = _rect(0, 20, 0, 20)  # 400 px -> small
    fp = _rect(40, 240, 40, 240)  # 40000 px -> large, disjoint from gt
    preds = [{
        "scores": np.array([0.95, 0.8]),  # FP first
        "labels": np.array([1, 1]),
        "masks": np.stack([fp, gt]),
    }]
    tgts = [{"labels": np.array([1]), "masks": gt[None]}]
    _check(
        {
            "map": 0.5, "map_50": 0.5, "map_75": 0.5,
            "map_small": 1.0, "map_medium": -1.0, "map_large": -1.0,
            "mar_1": 0.0, "mar_10": 1.0, "mar_100": 1.0,
            "mar_small": 1.0,
        },
        preds, tgts,
    )


def test_golden_localization_threshold_split():
    """One det at IoU 7600/12400 = 0.6129: TP at thresholds .50/.55/.60 only
    -> map = 3/10, map_50 = 1, map_75 = 0, mar_100 = 0.3."""
    gt = _rect(0, 100, 0, 100)
    det = _rect(0, 100, 24, 124)  # inter 7600, union 12400
    preds = [{"scores": np.array([0.9]), "labels": np.array([1]), "masks": det[None]}]
    tgts = [{"labels": np.array([1]), "masks": gt[None]}]
    _check(
        {
            "map": 0.3, "map_50": 1.0, "map_75": 0.0, "map_large": 0.3,
            "mar_1": 0.3, "mar_10": 0.3, "mar_100": 0.3,
        },
        preds, tgts,
    )


def test_golden_ignored_gt_break_rule():
    """The evaluateImg break rule: a det overlapping a non-ignored small gt A
    (IoU 900/1560 = 0.5769) AND an ignored larger gt B (IoU 1560/2340 =
    0.6667 — HIGHER) must match A in the small-range eval whenever A
    qualifies; B is only used at thresholds where A fails, and then the det
    is ignored (matched-to-ignored), never an FP. At .70+ the det is
    unmatched and out of the small range -> ignored as well.

    small:  thr .50/.55 TP on A (AP 1); .60/.65 det->B ignored (AP 0);
            .70+ unmatched+out-of-range (AP 0)      -> map_small = 0.2
    medium: A ignored, B counted; det best-matches B -> TP through .65,
            unmatched FP (det area 1560 IS medium) at .70+ -> map_medium = 0.4
    all:    both gts counted (npig 2); det picks B (best IoU): recall 1/2,
            AP = 51/101 through .65, 0 above          -> map = 4*51/101/10
    """
    a = _rect(0, 30, 0, 30)  # 900 px  -> small
    det = _rect(0, 30, 0, 52)  # 1560 px -> medium
    b = _rect(0, 30, 0, 78)  # 2340 px -> medium
    preds = [{"scores": np.array([0.9]), "labels": np.array([1]), "masks": det[None]}]
    tgts = [{"labels": np.array([1, 1]), "masks": np.stack([a, b])}]
    ap_half = 51.0 / 101.0  # one TP at recall 0.5: recThrs 0.00..0.50 inclusive
    _check(
        {
            "map": 4 * ap_half / 10,
            "map_50": ap_half,
            "map_75": 0.0,
            "map_small": 0.2,
            "map_medium": 0.4,
            "map_large": -1.0,
            "mar_100": 0.2,  # recall 0.5 at 4/10 thresholds, npig 2
            "mar_small": 0.2,
            "mar_medium": 0.4,
        },
        preds, tgts,
    )


def test_golden_multiclass_pooling_excludes_undefined_slices():
    """Class 1 has only a large gt, class 2 only a small gt, both matched
    perfectly. pycocotools summarize excludes -1 slices: map_small must be
    1.0 (class 2 alone), NOT the mean of {-1, 1}. A third image with only an
    unmatched class-3 prediction (no class-3 gts anywhere) contributes no
    class either (categories come from gts)."""
    g1 = _rect(0, 100, 0, 100)  # large
    g2 = _rect(0, 20, 100, 120)  # small
    fp3 = _rect(50, 80, 50, 80)
    preds = [
        {"scores": np.array([0.9]), "labels": np.array([1]), "masks": g1[None]},
        {"scores": np.array([0.8]), "labels": np.array([2]), "masks": g2[None]},
        {"scores": np.array([0.7]), "labels": np.array([3]), "masks": fp3[None]},
    ]
    tgts = [
        {"labels": np.array([1]), "masks": g1[None]},
        {"labels": np.array([2]), "masks": g2[None]},
        {"labels": np.zeros((0,), np.int64), "masks": np.zeros((0, H, W), bool)},
    ]
    ours, oracle = _both(preds, tgts)
    for r in (ours, oracle):
        assert r["map"] == pytest.approx(1.0, abs=1e-12)
        assert r["map_small"] == pytest.approx(1.0, abs=1e-12)
        assert r["map_large"] == pytest.approx(1.0, abs=1e-12)
        assert r["map_medium"] == -1.0
        assert r["classes"] == [1, 2]
        np.testing.assert_allclose(r["map_per_class"], [1.0, 1.0])
