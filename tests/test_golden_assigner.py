"""Hungarian matcher torch-golden parity (VERDICT r4 #3).

Transcribes the reference matching stack in torch/scipy —
HungarianAssigner3D (core/bbox/assigners/hungarian_assigner_3d.py:43-130)
with mmcv FocalLossCost / ClassificationCost and BBox3DL1Cost — and
asserts the repo's on-device ``hungarian_match_single`` produces
IDENTICAL assignments at the shipped config weights
(FocalLossCost weight=2.0, BBox3DL1Cost weight=0.25), including the
padded-column convention.
"""
import os.path as osp
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))

torch = pytest.importorskip("torch")
from scipy.optimize import linear_sum_assignment  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from distillbev_tpu.models.dense_heads.bevformer_head import (  # noqa: E402
    hungarian_match_single, make_match_cost_fns)


# -- reference transcription (torch) -------------------------------------

def torch_focal_loss_cost(cls_pred, gt_labels, weight=2.0, alpha=0.25,
                          gamma=2.0, eps=1e-12):
    """mmcv FocalLossCost.__call__ (match_costs.py)."""
    cls_pred = cls_pred.sigmoid()
    neg_cost = -(1 - cls_pred + eps).log() * (1 - alpha) * \
        cls_pred.pow(gamma)
    pos_cost = -(cls_pred + eps).log() * alpha * \
        (1 - cls_pred).pow(gamma)
    cls_cost = pos_cost[:, gt_labels] - neg_cost[:, gt_labels]
    return cls_cost * weight


def torch_classification_cost(cls_pred, gt_labels, weight=1.0):
    """mmcv ClassificationCost.__call__."""
    cls_score = cls_pred.softmax(-1)
    return -cls_score[:, gt_labels] * weight


def torch_bbox3d_l1_cost(bbox_pred, gt_bboxes, weight=0.25):
    """BBox3DL1Cost (core/bbox/match_costs/match_cost.py)."""
    return torch.cdist(bbox_pred, gt_bboxes, p=1) * weight


def torch_assign(bbox_pred, cls_pred, norm_gt, gt_labels,
                 cls_cost_fn=torch_focal_loss_cost, reg_weight=0.25):
    """HungarianAssigner3D.assign (hungarian_assigner_3d.py:52-130):
    weighted cls+reg cost, scipy Hungarian, 1-based gt inds (0 = bg)."""
    num_bboxes = bbox_pred.shape[0]
    assigned = torch.zeros(num_bboxes, dtype=torch.long)
    if norm_gt.shape[0] == 0:
        return assigned - 0      # all background
    cls_cost = cls_cost_fn(cls_pred, gt_labels)
    reg_cost = torch_bbox3d_l1_cost(bbox_pred[:, :8], norm_gt[:, :8],
                                    weight=reg_weight)
    cost = (cls_cost + reg_cost).detach().numpy()
    rows, cols = linear_sum_assignment(cost)
    assigned[torch.from_numpy(rows)] = torch.from_numpy(cols) + 1
    return assigned              # [Q], 0 = background, i+1 = gt i


# -- parity tests --------------------------------------------------------

@pytest.mark.parametrize("num_gt", [1, 7, 25])
def test_assignment_matches_reference(num_gt):
    rng = np.random.RandomState(42 + num_gt)
    Q, C, M = 60, 10, 32          # M = padded gt capacity
    cls_logits = rng.randn(Q, C).astype(np.float32) * 2
    bbox_preds = rng.randn(Q, 10).astype(np.float32)
    norm_gt = np.full((M, 10), np.nan, np.float32)
    norm_gt[:num_gt] = rng.randn(num_gt, 10).astype(np.float32)
    gt_labels = np.zeros((M,), np.int64)
    gt_labels[:num_gt] = rng.randint(0, C, num_gt)
    gt_mask = np.arange(M) < num_gt

    # reference: unpadded tensors, torch+scipy
    ref = torch_assign(
        torch.from_numpy(bbox_preds),
        torch.from_numpy(cls_logits),
        torch.from_numpy(norm_gt[:num_gt]),
        torch.from_numpy(gt_labels[:num_gt]))

    # repo: padded arrays, on-device optax Hungarian, shipped config
    cls_cost_fn, reg_w = make_match_cost_fns(dict(
        type="HungarianAssigner3D",
        cls_cost=dict(type="FocalLossCost", weight=2.0),
        reg_cost=dict(type="BBox3DL1Cost", weight=0.25),
        iou_cost=dict(type="IoUCost", weight=0.0)))
    got = np.asarray(hungarian_match_single(
        jnp.asarray(cls_logits), jnp.asarray(bbox_preds),
        jnp.asarray(np.nan_to_num(norm_gt)), jnp.asarray(gt_labels),
        jnp.asarray(gt_mask), cls_cost_fn, reg_w))

    # same positives, same pairs (repo is 0-based with -1 background)
    ref_np = ref.numpy()
    np.testing.assert_array_equal(got >= 0, ref_np > 0)
    np.testing.assert_array_equal(got[got >= 0], ref_np[ref_np > 0] - 1)


def test_default_weights_are_reference_weights():
    """No assigner config -> the reference recipe's 2.0/0.25 (the
    round-4 bug was a hard-coded cls weight of 1.0)."""
    rng = np.random.RandomState(0)
    Q, C, M = 40, 10, 8
    cls_logits = rng.randn(Q, C).astype(np.float32) * 3
    bbox_preds = rng.randn(Q, 10).astype(np.float32)
    norm_gt = rng.randn(M, 10).astype(np.float32)
    gt_labels = rng.randint(0, C, M)
    gt_mask = np.ones((M,), bool)

    cls_cost_fn, reg_w = make_match_cost_fns(None)
    assert reg_w == 0.25
    got = np.asarray(hungarian_match_single(
        jnp.asarray(cls_logits), jnp.asarray(bbox_preds),
        jnp.asarray(norm_gt), jnp.asarray(gt_labels),
        jnp.asarray(gt_mask), cls_cost_fn, reg_w))
    ref = torch_assign(
        torch.from_numpy(bbox_preds), torch.from_numpy(cls_logits),
        torch.from_numpy(norm_gt), torch.from_numpy(gt_labels),
        cls_cost_fn=lambda c, l: torch_focal_loss_cost(
            c, l, weight=2.0)).numpy()
    np.testing.assert_array_equal(got[got >= 0], ref[ref > 0] - 1)

    # and the weight genuinely changes assignments on a case built to
    # flip: verify weight=1.0 differs from weight=2.0 somewhere over
    # a batch of random instances (guards against dead config plumbing)
    flips = 0
    for seed in range(8):
        r = np.random.RandomState(seed)
        cl = r.randn(Q, C).astype(np.float32) * 3
        bp = r.randn(Q, 10).astype(np.float32)
        ng = r.randn(M, 10).astype(np.float32)
        gl = r.randint(0, C, M)
        f1, _ = make_match_cost_fns(dict(
            cls_cost=dict(type="FocalLossCost", weight=1.0)))
        f2, _ = make_match_cost_fns(dict(
            cls_cost=dict(type="FocalLossCost", weight=2.0)))
        a1 = np.asarray(hungarian_match_single(
            jnp.asarray(cl), jnp.asarray(bp), jnp.asarray(ng),
            jnp.asarray(gl), jnp.asarray(np.ones(M, bool)), f1, 0.25))
        a2 = np.asarray(hungarian_match_single(
            jnp.asarray(cl), jnp.asarray(bp), jnp.asarray(ng),
            jnp.asarray(gl), jnp.asarray(np.ones(M, bool)), f2, 0.25))
        flips += int(not np.array_equal(a1, a2))
    assert flips > 0


def test_classification_cost_variant():
    """The assigner's other documented cls_cost type round-trips too."""
    rng = np.random.RandomState(3)
    Q, C, M = 30, 10, 6
    cls_logits = rng.randn(Q, C).astype(np.float32) * 2
    bbox_preds = rng.randn(Q, 10).astype(np.float32)
    norm_gt = rng.randn(M, 10).astype(np.float32)
    gt_labels = rng.randint(0, C, M)
    cls_cost_fn, reg_w = make_match_cost_fns(dict(
        cls_cost=dict(type="ClassificationCost", weight=1.0),
        reg_cost=dict(type="BBox3DL1Cost", weight=1.0)))
    got = np.asarray(hungarian_match_single(
        jnp.asarray(cls_logits), jnp.asarray(bbox_preds),
        jnp.asarray(norm_gt), jnp.asarray(gt_labels),
        jnp.asarray(np.ones(M, bool)), cls_cost_fn, reg_w))
    ref = torch_assign(
        torch.from_numpy(bbox_preds), torch.from_numpy(cls_logits),
        torch.from_numpy(norm_gt), torch.from_numpy(gt_labels),
        cls_cost_fn=torch_classification_cost, reg_weight=1.0).numpy()
    np.testing.assert_array_equal(got[got >= 0], ref[ref > 0] - 1)


def test_unknown_cost_types_hard_error():
    with pytest.raises(ValueError):
        make_match_cost_fns(dict(cls_cost=dict(type="NopeCost")))
    with pytest.raises(ValueError):
        make_match_cost_fns(dict(reg_cost=dict(type="IoU3DCost")))
    with pytest.raises(ValueError):
        make_match_cost_fns(dict(iou_cost=dict(type="IoUCost",
                                               weight=1.0)))
