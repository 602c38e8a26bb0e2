"""Golden validation of the self-contained nuScenes metrics.

The nuScenes devkit cannot be installed in this sandbox (zero egress),
so this file holds an independent clean-room transcription of the
devkit's detection evaluation — nuscenes-devkit
``eval/detection/algo.py`` (accumulate / calc_ap / calc_tp),
``eval/common/utils.py`` (center_distance / scale_iou / yaw_diff /
velocity_l2 / attr_acc / cummean) and ``DetectionMetricData``'s 101-bin
interpolation — structured exactly like the devkit (per-box object
loops, no_predictions corner cases, confidence-curve interpolation of
the cumulative error means).  ``evaluate_nuscenes``
(distillbev_tpu/core/evaluation/nuscenes_metrics.py) must match it to
1e-9 on randomized and hand-computed fixtures; the reference reaches
the same algorithm through the devkit
(reference: mmdet3d/core/evaluation/nuscenes_eval.py:42-47,
datasets/nuscenes_dataset.py:711-760).
"""
import numpy as np
import pytest

from distillbev_tpu.core.evaluation.nuscenes_metrics import (
    evaluate_nuscenes, filter_by_class_range, CLASS_RANGES)

NELEM = 101
MIN_RECALL = 0.1
MIN_PRECISION = 0.1
DIST_THS = (0.5, 1.0, 2.0, 4.0)
TP_TH = 2.0
TP_METRICS = ("trans_err", "scale_err", "orient_err", "vel_err",
              "attr_err")
LEAVES = {
    "traffic_cone": ("attr_err", "vel_err", "orient_err"),
    "barrier": ("attr_err", "vel_err"),
}


# ---- devkit transcription (clean-room golden) ------------------------

class MD:
    """DetectionMetricData: 101-bin curves."""

    def __init__(self, recall, precision, confidence, errs):
        self.recall = recall
        self.precision = precision
        self.confidence = confidence
        self.errs = errs

    @property
    def max_recall_ind(self):
        non_zero = np.nonzero(self.confidence)[0]
        return non_zero[-1] if len(non_zero) else 0

    @classmethod
    def no_predictions(cls):
        return cls(np.linspace(0, 1, NELEM), np.zeros(NELEM),
                   np.zeros(NELEM),
                   {m: np.ones(NELEM) for m in TP_METRICS})


def center_distance(gt, pred):
    return np.linalg.norm(np.array(pred["translation"][:2]) -
                          np.array(gt["translation"][:2]))


def velocity_l2(gt, pred):
    return np.linalg.norm(np.array(pred["velocity"][:2]) -
                          np.array(gt["velocity"][:2]))


def yaw_diff(gt, pred, period):
    diff = (gt["yaw"] - pred["yaw"]) % period
    return min(diff, period - diff)


def scale_iou(gt, pred):
    sa, sr = np.array(gt["size"]), np.array(pred["size"])
    minima = np.minimum(sa, sr)
    inter = np.prod(minima)
    union = np.prod(sa) + np.prod(sr) - inter
    return inter / union


def attr_acc(gt, pred):
    if gt.get("attribute_name") == "":
        return np.nan
    if gt.get("attribute_name") is None:
        return 1.0  # callers treat no-attribute datasets separately
    return float(pred.get("attribute_name") == gt["attribute_name"])


def cummean(x):
    if np.sum(np.isnan(x)) == len(x):
        return np.ones(len(x))
    sum_vals = np.nancumsum(x.astype(float))
    count_vals = np.cumsum(~np.isnan(x))
    return np.divide(sum_vals, count_vals,
                     out=np.zeros_like(sum_vals),
                     where=count_vals != 0)


def accumulate(gt_boxes, pred_boxes, class_name, dist_th,
               no_attributes=False):
    """gt_boxes/pred_boxes: dict token -> list of box dicts."""
    npos = len([1 for boxes in gt_boxes.values() for b in boxes
                if b["detection_name"] == class_name])
    if npos == 0:
        return MD.no_predictions()

    pred_boxes_list = [b for boxes in pred_boxes.values() for b in boxes
                       if b["detection_name"] == class_name]
    pred_confs = [b["detection_score"] for b in pred_boxes_list]
    sortind = [i for (v, i) in sorted(
        (v, i) for (i, v) in enumerate(pred_confs))][::-1]

    tp, fp, conf = [], [], []
    match_data = {"trans_err": [], "vel_err": [], "scale_err": [],
                  "orient_err": [], "attr_err": [], "conf": []}
    taken = set()
    for ind in sortind:
        pred_box = pred_boxes_list[ind]
        min_dist = np.inf
        match_gt_idx = None
        for gt_idx, gt_box in enumerate(
                gt_boxes.get(pred_box["sample_token"], [])):
            if gt_box["detection_name"] == class_name and \
                    (pred_box["sample_token"], gt_idx) not in taken:
                this_distance = center_distance(gt_box, pred_box)
                if this_distance < min_dist:
                    min_dist = this_distance
                    match_gt_idx = gt_idx
        is_match = min_dist < dist_th
        if is_match:
            taken.add((pred_box["sample_token"], match_gt_idx))
            tp.append(1)
            fp.append(0)
            conf.append(pred_box["detection_score"])
            gt_box_match = gt_boxes[pred_box["sample_token"]][
                match_gt_idx]
            match_data["trans_err"].append(
                center_distance(gt_box_match, pred_box))
            match_data["vel_err"].append(
                velocity_l2(gt_box_match, pred_box))
            match_data["scale_err"].append(
                1 - scale_iou(gt_box_match, pred_box))
            period = np.pi if class_name == "barrier" else 2 * np.pi
            match_data["orient_err"].append(
                yaw_diff(gt_box_match, pred_box, period=period))
            match_data["attr_err"].append(
                0.0 if no_attributes
                else 1 - attr_acc(gt_box_match, pred_box))
            match_data["conf"].append(pred_box["detection_score"])
        else:
            tp.append(0)
            fp.append(1)
            conf.append(pred_box["detection_score"])

    if len(match_data["trans_err"]) == 0:
        return MD.no_predictions()

    tp = np.cumsum(tp).astype(float)
    fp = np.cumsum(fp).astype(float)
    conf = np.array(conf)
    prec = tp / (fp + tp)
    rec = tp / float(npos)
    rec_interp = np.linspace(0, 1, NELEM)
    prec = np.interp(rec_interp, rec, prec, right=0)
    conf = np.interp(rec_interp, rec, conf, right=0)

    errs = {}
    for key in match_data:
        if key == "conf":
            continue
        tmp = cummean(np.array(match_data[key]))
        errs[key] = np.interp(conf[::-1],
                              np.array(match_data["conf"])[::-1],
                              tmp[::-1])[::-1]
    return MD(rec_interp, prec, conf, errs)


def calc_ap(md):
    prec = np.copy(md.precision)
    prec = prec[round(100 * MIN_RECALL) + 1:]
    prec -= MIN_PRECISION
    prec[prec < 0] = 0
    return float(np.mean(prec)) / (1.0 - MIN_PRECISION)


def calc_tp(md, metric_name):
    first_ind = round(100 * MIN_RECALL) + 1
    last_ind = md.max_recall_ind
    if last_ind < first_ind:
        return 1.0
    return float(np.mean(md.errs[metric_name][first_ind:last_ind + 1]))


def devkit_metrics(gt, preds, class_names, no_attributes=False):
    """Full devkit DetectionMetrics.compute: per-class APs over the
    four thresholds, TP errors at 2 m, class exclusions, NDS."""
    label_aps = {}
    label_tps = {}
    for cls in class_names:
        label_aps[cls] = [
            calc_ap(accumulate(gt, preds, cls, th,
                               no_attributes=no_attributes))
            for th in DIST_THS]
        md_tp = accumulate(gt, preds, cls, TP_TH,
                           no_attributes=no_attributes)
        label_tps[cls] = {}
        for m in TP_METRICS:
            if m in LEAVES.get(cls, ()):
                label_tps[cls][m] = np.nan
            else:
                label_tps[cls][m] = calc_tp(md_tp, m)
    mean_ap = float(np.mean([np.mean(v) for v in label_aps.values()]))
    mean_tps = {}
    for m in TP_METRICS:
        vals = [label_tps[c][m] for c in class_names]
        mean_tps[m] = float(np.nanmean(vals)) if not np.all(
            np.isnan(vals)) else 1.0
    nds = (5 * mean_ap + sum(
        max(1 - min(mean_tps[m], 1.0), 0.0) for m in TP_METRICS)) / 10.0
    per_class_ap = {c: float(np.mean(v)) for c, v in label_aps.items()}
    return mean_ap, mean_tps, nds, per_class_ap


# ---- fixtures --------------------------------------------------------

def random_fixture(seed, n_samples=6, classes=("car", "pedestrian",
                                               "barrier",
                                               "traffic_cone"),
                   with_attrs=False, empty_attr_frac=0.0):
    r = np.random.RandomState(seed)
    attrs = {"car": ["vehicle.moving", "vehicle.parked"],
             "pedestrian": ["pedestrian.moving",
                            "pedestrian.standing"]}
    gt, preds = {}, {}
    for s in range(n_samples):
        tok = f"s{s}"
        gt[tok], preds[tok] = [], []
        for cls in classes:
            for _ in range(r.randint(0, 4)):
                pos = r.uniform(-30, 30, 2)
                a = None
                if with_attrs and cls in attrs:
                    a = "" if r.rand() < empty_attr_frac else \
                        attrs[cls][r.randint(2)]
                gt[tok].append(dict(
                    sample_token=tok, detection_name=cls,
                    translation=[pos[0], pos[1], 0.0],
                    size=list(r.uniform(0.5, 4.0, 3)),
                    yaw=float(r.uniform(-np.pi, np.pi)),
                    velocity=list(r.uniform(-3, 3, 2)),
                    attribute_name=a))
            for _ in range(r.randint(0, 6)):
                pos = r.uniform(-30, 30, 2)
                a = None
                if with_attrs and cls in attrs:
                    a = attrs[cls][r.randint(2)]
                preds[tok].append(dict(
                    sample_token=tok, detection_name=cls,
                    translation=[pos[0], pos[1], 0.0],
                    size=list(r.uniform(0.5, 4.0, 3)),
                    yaw=float(r.uniform(-np.pi, np.pi)),
                    velocity=list(r.uniform(-3, 3, 2)),
                    detection_score=float(r.uniform(0.01, 1.0)),
                    attribute_name=a))
        # near-duplicates of some GT so matches exist at several
        # score levels
        for g in list(gt[tok]):
            if r.rand() < 0.7:
                preds[tok].append(dict(
                    sample_token=tok,
                    detection_name=g["detection_name"],
                    translation=[g["translation"][0] + r.uniform(-1, 1),
                                 g["translation"][1] + r.uniform(-1, 1),
                                 0.0],
                    size=list(np.array(g["size"]) *
                              r.uniform(0.8, 1.2, 3)),
                    yaw=g["yaw"] + float(r.uniform(-0.3, 0.3)),
                    velocity=list(np.array(g["velocity"]) +
                                  r.uniform(-0.5, 0.5, 2)),
                    detection_score=float(r.uniform(0.3, 1.0)),
                    attribute_name=(g["attribute_name"] if
                                    r.rand() < 0.8 and
                                    g.get("attribute_name")
                                    else (attrs.get(
                                        g["detection_name"],
                                        ["x"])[0]
                                        if with_attrs else None))))
        r.shuffle(preds[tok])
    return gt, preds


def assert_matches(gt, preds, classes, no_attributes):
    got = evaluate_nuscenes(preds, gt, classes)
    want_map, want_tps, want_nds, want_ap = devkit_metrics(
        gt, preds, classes, no_attributes=no_attributes)
    assert got["pts_bbox_NuScenes/mAP"] == pytest.approx(
        want_map, abs=1e-9)
    for m in TP_METRICS:
        assert got[f"pts_bbox_NuScenes/m{m.upper()}"] == pytest.approx(
            want_tps[m], abs=1e-9), m
    assert got["pts_bbox_NuScenes/NDS"] == pytest.approx(
        want_nds, abs=1e-9)
    for c in classes:
        assert got[f"pts_bbox_NuScenes/{c}_AP"] == pytest.approx(
            want_ap[c], abs=1e-9), c


# ---- tests -----------------------------------------------------------

@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_randomized_no_attributes(seed):
    classes = ["car", "pedestrian", "barrier", "traffic_cone"]
    gt, preds = random_fixture(seed)
    assert_matches(gt, preds, classes, no_attributes=True)


@pytest.mark.parametrize("seed", [10, 11, 12])
def test_randomized_with_attributes(seed):
    classes = ["car", "pedestrian", "barrier", "traffic_cone"]
    gt, preds = random_fixture(seed, with_attrs=True)
    assert_matches(gt, preds, classes, no_attributes=False)


@pytest.mark.parametrize("seed", [20, 21])
def test_randomized_partial_empty_attributes(seed):
    """GTs with attribute_name='' are nan-skipped in the cumulative
    mean (devkit attr_acc -> cummean)."""
    classes = ["car", "pedestrian"]
    gt, preds = random_fixture(seed, classes=("car", "pedestrian"),
                               with_attrs=True, empty_attr_frac=0.4)
    assert_matches(gt, preds, classes, no_attributes=False)


def test_class_with_zero_gt_scores_zero():
    """A configured class with no GT contributes AP=0 and TP errors 1.0
    to the means (devkit no_predictions), not a skip."""
    gt, preds = random_fixture(30, classes=("car",))
    classes = ["car", "bus"]
    for tok in preds:  # some bus predictions with no bus GT anywhere
        preds[tok].append(dict(
            sample_token=tok, detection_name="bus",
            translation=[0.0, 0.0, 0.0], size=[3, 8, 3], yaw=0.0,
            velocity=[0.0, 0.0], detection_score=0.9,
            attribute_name=None))
    assert_matches(gt, preds, classes, no_attributes=True)
    got = evaluate_nuscenes(preds, gt, classes)
    assert got["pts_bbox_NuScenes/bus_AP"] == 0.0


def test_hand_computed_ap():
    """Tiny hand-checked case: 2 GT cars, 3 preds (match, miss, match)
    at scores 0.9/0.8/0.7 -> recall/precision curve by hand."""
    gt = {"s0": [
        dict(sample_token="s0", detection_name="car",
             translation=[0.0, 0.0, 0.0], size=[2, 4, 1.5], yaw=0.0,
             velocity=[0, 0], attribute_name=None),
        dict(sample_token="s0", detection_name="car",
             translation=[10.0, 0.0, 0.0], size=[2, 4, 1.5], yaw=0.0,
             velocity=[0, 0], attribute_name=None),
    ]}
    preds = {"s0": [
        dict(sample_token="s0", detection_name="car",
             translation=[0.1, 0.0, 0.0], size=[2, 4, 1.5], yaw=0.0,
             velocity=[0, 0], detection_score=0.9,
             attribute_name=None),
        dict(sample_token="s0", detection_name="car",
             translation=[30.0, 30.0, 0.0], size=[2, 4, 1.5], yaw=0.0,
             velocity=[0, 0], detection_score=0.8,
             attribute_name=None),
        dict(sample_token="s0", detection_name="car",
             translation=[10.2, 0.0, 0.0], size=[2, 4, 1.5], yaw=0.0,
             velocity=[0, 0], detection_score=0.7,
             attribute_name=None),
    ]}
    got = evaluate_nuscenes(preds, gt, ["car"])
    # at every threshold >= 0.5: rec pts (0.5, 0.5, 1.0),
    # prec (1, 0.5, 2/3). 101-bin interp: prec=1 for r<=0.5 (indices
    # 11..50 after dropping the first 11), then linear 0.5->2/3 over
    # (0.5, 1.0].  AP identical for all four thresholds.
    rec = np.linspace(0, 1, 101)
    prec = np.interp(rec, [0.5, 0.5, 1.0], [1.0, 0.5, 2 / 3], right=0)
    expect = np.clip(prec[11:] - 0.1, 0, None).mean() / 0.9
    assert got["pts_bbox_NuScenes/car_AP"] == pytest.approx(expect,
                                                            abs=1e-9)
    # both matches are exact in size/yaw/vel; ATE cummean is
    # 0.1 -> 0.15, interpolated over the conf curve
    assert got["pts_bbox_NuScenes/mSCALE_ERR"] == pytest.approx(
        0.0, abs=1e-9)
    assert got["pts_bbox_NuScenes/mORIENT_ERR"] == pytest.approx(
        0.0, abs=1e-9)
    ate = got["pts_bbox_NuScenes/mTRANS_ERR"]
    assert 0.1 - 1e-9 <= ate <= 0.15 + 1e-9


def test_range_filtering_matches_devkit_semantics():
    """filter_by_class_range drops far boxes from GT and preds before
    scoring (devkit filter_eval_boxes + class_range)."""
    gt, preds = random_fixture(40, classes=("car", "traffic_cone"))
    ego = {tok: (0.0, 0.0) for tok in gt}
    fgt = filter_by_class_range(gt, ego)
    fpreds = filter_by_class_range(preds, ego)
    for tok in fgt:
        for a in fgt[tok] + fpreds[tok]:
            d = np.hypot(a["translation"][0], a["translation"][1])
            assert d <= CLASS_RANGES[a["detection_name"]] + 1e-9
    got = evaluate_nuscenes(preds, gt, ["car", "traffic_cone"],
                            ego_xy_by_token=ego)
    want = evaluate_nuscenes(fpreds, fgt, ["car", "traffic_cone"])
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12), k
