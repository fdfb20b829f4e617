"""Independent COCOeval-semantics oracle for differential-testing map_metric.

Neither pycocotools nor torchmetrics is installable in this offline
environment (the reference's metric is torchmetrics MeanAveragePrecision,
whose segm backend IS pycocotools — reference model_essential_part.py:56-58).
This module is a deliberately naive, loop-based re-statement of the published
COCOeval protocol (cocoeval.py semantics: evaluateImg greedy matching,
accumulate's (T,R,K,A,M) precision tensor, summarize's mean over cells > -1),
written independently from `rgbdseg_tpu/train/map_metric.py` so the two can
disagree. No code is shared with the production metric beyond numpy.

Semantics encoded (per pycocotools):
- gts sorted ignore-last (stable); dets sorted by -score (stable), cut to maxDet
- per IoU threshold t, per det in order: scan gts in sorted order, skip
  already-matched; once a real (non-ignored) match is held, stop at the first
  ignored gt; a gt with iou >= current best (init min(t, 1-1e-10)) REPLACES the
  held match (ties -> last index wins)
- matched det inherits the gt's ignore flag; unmatched det is ignored iff its
  own area is outside the range
- accumulate: global stable sort of det scores, cumulative TP/FP excluding
  ignored, precision envelope (backward max), 101-point interpolation via
  searchsorted(recall, recThrs, 'left'), recall = last cum-recall
- summarize: mean over all precision cells > -1 (cells are -1 where the
  image-set has no non-ignored gt for that class)
"""

from __future__ import annotations

import numpy as np

IOU_THRS = np.round(np.arange(0.5, 1.0, 0.05), 2)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RANGES = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}
MAX_DETS = (1, 10, 100)


def _mask_iou(d, g):
    inter = np.logical_and(d, g).sum()
    union = np.logical_or(d, g).sum()
    return inter / union if union > 0 else 0.0


def _evaluate_img(dts, gts, area_rng, max_det):
    """dts: list of (score, mask); gts: list of mask. Returns
    (dtm (T,D) gt-index-or--1, dt_scores (D,), dt_ig (T,D), npig)."""
    g_ig = np.array(
        [(m.sum() < area_rng[0]) or (m.sum() > area_rng[1]) for m in gts], bool
    )
    gtind = np.argsort(g_ig, kind="mergesort")
    gts = [gts[i] for i in gtind]
    g_ig = g_ig[gtind]
    order = np.argsort([-s for s, _ in dts], kind="mergesort")[:max_det]
    dts = [dts[i] for i in order]

    T, D, G = len(IOU_THRS), len(dts), len(gts)
    ious = np.zeros((D, G))
    for di, (_, dm) in enumerate(dts):
        for gi, gm in enumerate(gts):
            ious[di, gi] = _mask_iou(dm, gm)

    dtm = -np.ones((T, D), np.int64)
    gtm = -np.ones((T, G), np.int64)
    for ti, t in enumerate(IOU_THRS):
        for di in range(D):
            iou = min(t, 1 - 1e-10)
            m = -1
            for gi in range(G):
                if gtm[ti, gi] >= 0:
                    continue
                if m > -1 and (not g_ig[m]) and g_ig[gi]:
                    break
                if ious[di, gi] < iou:
                    continue
                iou = ious[di, gi]
                m = gi
            if m > -1:
                dtm[ti, di] = m
                gtm[ti, m] = di

    d_area_out = np.array(
        [(dm.sum() < area_rng[0]) or (dm.sum() > area_rng[1]) for _, dm in dts], bool
    )
    dt_ig = np.zeros((T, D), bool)
    for ti in range(T):
        for di in range(D):
            if dtm[ti, di] >= 0:
                dt_ig[ti, di] = g_ig[dtm[ti, di]]
            else:
                dt_ig[ti, di] = d_area_out[di]
    scores = np.array([s for s, _ in dts], np.float64)
    return dtm, scores, dt_ig, int((~g_ig).sum())


def evaluate(preds, targets):
    """preds/targets in map_metric.update format. Returns the same result
    dict keys as MeanAveragePrecision.compute()."""
    classes = sorted({int(c) for t in targets for c in np.asarray(t["labels"])})
    T, R, K = len(IOU_THRS), len(REC_THRS), len(classes)
    A, M = len(AREA_RANGES), len(MAX_DETS)
    precision = -np.ones((T, R, K, A, M))
    recall = -np.ones((T, K, A, M))

    for ki, cls in enumerate(classes):
        per_img = []
        for p, t in zip(preds, targets):
            p_lab = np.asarray(p["labels"])
            t_lab = np.asarray(t["labels"])
            dts = [
                (float(s), np.asarray(m, bool))
                for s, l, m in zip(p["scores"], p_lab, p["masks"])
                if int(l) == cls
            ]
            gts = [
                np.asarray(m, bool)
                for l, m in zip(t_lab, t["masks"])
                if int(l) == cls
            ]
            per_img.append((dts, gts))

        for ai, arng in enumerate(AREA_RANGES.values()):
            for mi, max_det in enumerate(MAX_DETS):
                evals = [_evaluate_img(d, g, arng, max_det) for d, g in per_img]
                npig = sum(e[3] for e in evals)
                if npig == 0:
                    continue
                scores = np.concatenate([e[1] for e in evals])
                inds = np.argsort(-scores, kind="mergesort")
                dtm = np.concatenate([e[0] for e in evals], axis=1)[:, inds]
                dtig = np.concatenate([e[2] for e in evals], axis=1)[:, inds]
                tps = (dtm >= 0) & ~dtig
                fps = (dtm < 0) & ~dtig
                tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
                fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
                for ti in range(T):
                    tp, fp = tp_sum[ti], fp_sum[ti]
                    nd = len(tp)
                    rc = tp / npig
                    pr = tp / (fp + tp + np.spacing(1))
                    recall[ti, ki, ai, mi] = rc[-1] if nd else 0.0
                    pr = pr.tolist()
                    q = np.zeros(R)
                    for i in range(nd - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    inds_r = np.searchsorted(rc, REC_THRS, side="left")
                    for ri, pi in enumerate(inds_r):
                        try:
                            q[ri] = pr[pi]
                        except IndexError:
                            pass
                    precision[ti, :, ki, ai, mi] = q

    def _summ_ap(iou=None, area="all", max_det=100, ki=None):
        ai = list(AREA_RANGES).index(area)
        mi = MAX_DETS.index(max_det)
        s = precision[:, :, :, ai, mi]
        if iou is not None:
            ti = int(np.where(np.isclose(IOU_THRS, iou))[0][0])
            s = s[ti : ti + 1]
        if ki is not None:
            s = s[:, :, ki : ki + 1]
        s = s[s > -1]
        return float(np.mean(s)) if s.size else -1.0

    def _summ_ar(area="all", max_det=100, ki=None):
        ai = list(AREA_RANGES).index(area)
        mi = MAX_DETS.index(max_det)
        s = recall[:, :, ai, mi]
        if ki is not None:
            s = s[:, ki : ki + 1]
        s = s[s > -1]
        return float(np.mean(s)) if s.size else -1.0

    return {
        "map": _summ_ap(),
        "map_50": _summ_ap(iou=0.5),
        "map_75": _summ_ap(iou=0.75),
        "map_small": _summ_ap(area="small"),
        "map_medium": _summ_ap(area="medium"),
        "map_large": _summ_ap(area="large"),
        "mar_1": _summ_ar(max_det=1),
        "mar_10": _summ_ar(max_det=10),
        "mar_100": _summ_ar(max_det=100),
        "mar_small": _summ_ar(area="small"),
        "mar_medium": _summ_ar(area="medium"),
        "mar_large": _summ_ar(area="large"),
        "classes": classes,
        "map_per_class": [_summ_ap(ki=k) for k in range(K)],
        "mar_100_per_class": [_summ_ar(ki=k) for k in range(K)],
    }
