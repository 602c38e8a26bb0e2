"""Self-contained nuScenes detection metrics (mAP / TP errors / NDS).

The reference evaluates through the nuScenes devkit
(reference: mmdet3d/datasets/nuscenes_dataset.py:711-760 -> NuScenesEval;
core/evaluation/nuscenes_eval.py), which is not installable in this
environment, so the official algorithm (detection_cvpr_2019 config) is
reimplemented here from its public definition:

* matching: per class, predictions sorted by score globally; greedy match
  to the closest unmatched GT (BEV center distance) within threshold
  d in {0.5, 1, 2, 4} m;
* AP: precision interpolated at 101 recall points, clipped at
  min_recall = min_precision = 0.1, normalized by (1 - 0.1);
* TP errors at d = 2 m: ATE (BEV center distance), ASE (1 - IoU of
  aligned boxes), AOE (absolute yaw diff, period 2pi, pi for barrier),
  AVE (BEV velocity L2), AAE (1 - attribute accuracy) — each the
  devkit's cumulative mean interpolated over the confidence curve, then
  averaged over the recall bins in (min_recall, max_recall] where
  max_recall is the last 101-bin with nonzero interpolated confidence;
* classes with zero GT still contribute AP = 0 and TP errors = 1.0 to
  the means (devkit evaluates every configured class);
* class exclusions: cones have no AOE/AVE/AAE, barriers no AVE/AAE;
* optional per-class range filtering of GT and predictions by ego
  distance (devkit filter_eval_boxes + class_range config);
* NDS = (5*mAP + sum over TP metrics of max(1 - mTP, 0)) / 10.

Exact-parity evidence: ``tests/test_nuscenes_metrics_golden.py`` holds
an independent clean-room transcription of the devkit's accumulate /
calc_ap / calc_tp (nuscenes-devkit eval/detection/algo.py structure,
DetectionMetricData interpolation included) and asserts this module
matches it to 1e-9 on randomized and hand-computed fixtures.

When GT attributes are unavailable (info pkls don't carry them), AAE is
reported as 0 for the classes that define it — matching a perfect
attribute head — and flagged in the output as ``aae_unavailable``.
Partially-missing attributes follow the devkit: a GT with an empty
attribute is nan-skipped in the cumulative mean (devkit cummean).
"""
from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np

DIST_THRESHOLDS = (0.5, 1.0, 2.0, 4.0)
TP_THRESHOLD = 2.0
MIN_RECALL = 0.1
MIN_PRECISION = 0.1
N_RECALL_BINS = 101

ATTR_EXCLUDE = {
    "traffic_cone": {"attr_err", "vel_err", "orient_err"},
    "barrier": {"attr_err", "vel_err"},
}
TP_METRICS = ("trans_err", "scale_err", "orient_err", "vel_err",
              "attr_err")

# detection_cvpr_2019 class_range (devkit eval config): boxes farther
# than this from the ego are dropped from both GT and predictions
CLASS_RANGES = {
    "car": 50.0, "truck": 50.0, "bus": 50.0, "trailer": 50.0,
    "construction_vehicle": 50.0, "pedestrian": 40.0,
    "motorcycle": 40.0, "bicycle": 40.0, "traffic_cone": 30.0,
    "barrier": 30.0,
}


def _yaw_diff(a: float, b: float, period: float = 2 * np.pi) -> float:
    d = abs(a - b) % period
    return min(d, period - d)


def _aligned_iou3d(size_a, size_b) -> float:
    """IoU of two axis-aligned, center-aligned boxes (ASE definition)."""
    inter = np.prod(np.minimum(size_a, size_b))
    union = np.prod(size_a) + np.prod(size_b) - inter
    return float(inter / max(union, 1e-9))


def _cummean(x: np.ndarray) -> np.ndarray:
    """Devkit cummean: nan entries are skipped, all-nan -> ones."""
    if np.all(np.isnan(x)):
        return np.ones(len(x))
    s = np.nancumsum(x)
    n = np.cumsum(~np.isnan(x))
    return np.divide(s, n, out=np.zeros_like(s, dtype=float),
                     where=n != 0)


def _accumulate(preds: List[dict], gts_by_token: Dict[str, List[dict]],
                dist_th: float, compute_tp: bool):
    """Greedy matching for one (class, threshold). Returns metric arrays.

    preds: list of dicts with sample_token/translation/size/rotation or
    yaw/velocity/detection_score[/attribute_name], pre-filtered to the
    class, sorted by descending score.
    """
    npos = sum(len(v) for v in gts_by_token.values())
    if npos == 0:
        return None
    taken = defaultdict(set)
    tp, fp, conf = [], [], []
    match_err = defaultdict(list)
    for p in preds:
        token = p["sample_token"]
        gts = gts_by_token.get(token, [])
        best, best_d = None, np.inf
        for gi, g in enumerate(gts):
            if gi in taken[token]:
                continue
            d = np.hypot(p["translation"][0] - g["translation"][0],
                         p["translation"][1] - g["translation"][1])
            if d < best_d:
                best, best_d = gi, d
        is_match = best is not None and best_d < dist_th
        conf.append(p["detection_score"])
        tp.append(1.0 if is_match else 0.0)
        fp.append(0.0 if is_match else 1.0)
        if is_match:
            taken[token].add(best)
            if compute_tp:
                g = gts_by_token[token][best]
                match_err["conf"].append(p["detection_score"])
                match_err["trans_err"].append(best_d)
                match_err["scale_err"].append(
                    1.0 - _aligned_iou3d(np.asarray(p["size"]),
                                         np.asarray(g["size"])))
                p_yaw = p.get("yaw")
                if p_yaw is None:
                    q = p["rotation"]
                    # yaw of quaternion [w,x,y,z]
                    p_yaw = np.arctan2(
                        2 * (q[0] * q[3] + q[1] * q[2]),
                        1 - 2 * (q[2] ** 2 + q[3] ** 2))
                period = np.pi if g["detection_name"] == "barrier" \
                    else 2 * np.pi
                match_err["orient_err"].append(
                    _yaw_diff(p_yaw, g["yaw"], period))
                match_err["vel_err"].append(float(np.hypot(
                    p["velocity"][0] - g["velocity"][0],
                    p["velocity"][1] - g["velocity"][1])))
                g_attr = g.get("attribute_name")
                if g_attr is None:
                    # no attributes in this dataset at all -> perfect
                    # attribute head (flagged as aae_unavailable)
                    match_err["attr_err"].append(0.0)
                elif g_attr == "":
                    # devkit attr_acc: nan for GT without an attribute;
                    # cummean skips it
                    match_err["attr_err"].append(np.nan)
                else:
                    match_err["attr_err"].append(
                        0.0 if p.get("attribute_name") == g_attr else 1.0)
    tp = np.cumsum(tp)
    fp = np.cumsum(fp)
    recall = tp / npos
    precision = tp / np.maximum(tp + fp, 1e-9)
    return dict(recall=recall, precision=precision, conf=np.asarray(conf),
                match_err={k: np.asarray(v, dtype=float)
                           for k, v in match_err.items()}, npos=npos)


def _calc_ap(recall, precision) -> float:
    rec_interp = np.linspace(0, 1, N_RECALL_BINS)
    prec = np.interp(rec_interp, recall, precision, right=0) \
        if len(recall) else np.zeros(N_RECALL_BINS)
    prec = prec[round(100 * MIN_RECALL) + 1:]
    prec = np.clip(prec - MIN_PRECISION, 0, None)
    return float(np.mean(prec)) / (1.0 - MIN_PRECISION)


def _calc_tp(acc, metric: str) -> float:
    """Devkit rule (algo.py calc_tp + DetectionMetricData): cumulative
    mean of per-match errors, interpolated over the 101-bin confidence
    curve, averaged over bins (min_recall_ind, max_recall_ind] where
    max_recall_ind is the last bin with nonzero interpolated
    confidence; 1.0 when no matches reach past min recall."""
    match_conf = acc["match_err"].get("conf")
    if match_conf is None or len(match_conf) == 0:
        return 1.0
    err = acc["match_err"][metric]
    rec_interp = np.linspace(0, 1, N_RECALL_BINS)
    # the 101-bin confidence curve (interpolated over recall, right=0)
    conf_curve = np.interp(rec_interp, acc["recall"], acc["conf"],
                           right=0)
    nz = np.nonzero(conf_curve)[0]
    last_ind = int(nz[-1]) if len(nz) else 0
    first_ind = round(100 * MIN_RECALL) + 1
    if last_ind < first_ind:
        return 1.0
    cum_mean = _cummean(err)
    # interp the cumulative mean over confidence (devkit: x must be
    # increasing, so flip the descending conf arrays)
    curve = np.interp(conf_curve[::-1], match_conf[::-1],
                      cum_mean[::-1])[::-1]
    return float(np.mean(curve[first_ind:last_ind + 1]))


def filter_by_class_range(anns_by_token: Dict[str, List[dict]],
                          ego_xy_by_token: Dict[str, Sequence[float]],
                          class_ranges: Dict[str, float] = None
                          ) -> Dict[str, List[dict]]:
    """Devkit filter_eval_boxes: drop boxes farther than the class
    range from the ego position (detection_cvpr_2019 class_range)."""
    class_ranges = class_ranges or CLASS_RANGES
    out = {}
    for tok, anns in anns_by_token.items():
        ego = np.asarray(ego_xy_by_token[tok][:2], float)
        kept = []
        for a in anns:
            rng = class_ranges.get(a["detection_name"])
            if rng is None:
                kept.append(a)
                continue
            d = np.hypot(a["translation"][0] - ego[0],
                         a["translation"][1] - ego[1])
            if d <= rng:
                kept.append(a)
        out[tok] = kept
    return out


def evaluate_nuscenes(results: Dict[str, List[dict]],
                      gt: Dict[str, List[dict]],
                      class_names: Sequence[str],
                      ego_xy_by_token: Optional[Dict] = None
                      ) -> Dict[str, float]:
    """results/gt: token -> list of annotation dicts (global frame).

    ``ego_xy_by_token``: optional token -> ego (x, y); when given, GT
    and predictions are range-filtered per class first (devkit
    filter_eval_boxes semantics).
    """
    if ego_xy_by_token:
        results = filter_by_class_range(results, ego_xy_by_token)
        gt = filter_by_class_range(gt, ego_xy_by_token)
    metrics: Dict[str, float] = {}
    ap_per_class = {}
    tp_per_class = {}
    aae_unavailable = all(
        g.get("attribute_name") is None
        for gl in gt.values() for g in gl)
    for cls in class_names:
        preds = sorted(
            (p for anns in results.values() for p in anns
             if p["detection_name"] == cls),
            key=lambda p: -p["detection_score"])
        gts = {tok: [g for g in anns if g["detection_name"] == cls]
               for tok, anns in gt.items()}
        aps = []
        tp_vals = None
        for th in DIST_THRESHOLDS:
            acc = _accumulate(preds, gts, th, compute_tp=(
                th == TP_THRESHOLD))
            if acc is None:
                # devkit: a configured class with zero GT still scores
                # (no_predictions -> AP 0, TP errors 1.0)
                aps.append(0.0)
                if th == TP_THRESHOLD:
                    tp_vals = {m: 1.0 for m in TP_METRICS
                               if m not in ATTR_EXCLUDE.get(cls, ())}
                continue
            aps.append(_calc_ap(acc["recall"], acc["precision"]))
            if th == TP_THRESHOLD:
                tp_vals = {m: _calc_tp(acc, m) for m in TP_METRICS
                           if m not in ATTR_EXCLUDE.get(cls, ())}
        ap_per_class[cls] = float(np.mean(aps))
        tp_per_class[cls] = tp_vals or {}
    mAP = float(np.mean(list(ap_per_class.values()))) if ap_per_class \
        else 0.0
    mtp = {}
    for m in TP_METRICS:
        vals = [tp[m] for tp in tp_per_class.values() if m in tp]
        mtp[m] = float(np.mean(vals)) if vals else 1.0
    nds = (5 * mAP + sum(max(1 - mtp[m], 0.0) for m in TP_METRICS)) / 10.0
    metrics["pts_bbox_NuScenes/mAP"] = mAP
    for m in TP_METRICS:
        metrics[f"pts_bbox_NuScenes/m{m.upper()}"] = mtp[m]
    for cls, ap in ap_per_class.items():
        metrics[f"pts_bbox_NuScenes/{cls}_AP"] = ap
    metrics["pts_bbox_NuScenes/NDS"] = nds
    metrics["aae_unavailable"] = float(aae_unavailable)
    return metrics
