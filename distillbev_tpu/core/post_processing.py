"""BEV NMS post-processing, TPU-native (static shapes).

Capability parity with the reference's NMS zoo
(reference: mmdet3d/core/post_processing/box3d_nms.py — aligned_3d_nms:120,
circle_nms:181; mmdet3d/ops/iou3d/iou3d_utils.py — nms_gpu:25): the CUDA /
numba loops become fixed-iteration masked suppression on device.  All
functions return a boolean *keep mask* over a fixed-size candidate set (the
idiomatic TPU formulation) plus, for host use, numpy index variants.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .bbox.box_jax_ops import rotated_iou_bev


def circle_nms_mask(centers_xy: jnp.ndarray,
                    scores: jnp.ndarray,
                    thresh: float,
                    valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Circular NMS as a keep-mask (device, static shape).

    Semantics match reference circle_nms (box3d_nms.py:181): a detection
    survives iff no higher-scored *surviving* detection has squared BEV
    center distance <= thresh.  [N,2], [N] -> bool [N].
    """
    n = scores.shape[0]
    d2 = jnp.sum(
        (centers_xy[:, None, :] - centers_xy[None, :, :]) ** 2, axis=-1)
    close = d2 <= thresh
    order = jnp.argsort(-scores)
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)

    def body(k, state):
        keep, supp = state
        i = order[k]
        is_live = (~supp[i]) & valid[i]
        keep = keep.at[i].set(is_live)
        # suppress strictly lower-ranked close neighbours
        newly = close[i] & is_live
        newly = newly.at[i].set(False)
        return keep, supp | newly

    keep0 = jnp.zeros((n,), dtype=bool)
    supp0 = jnp.zeros((n,), dtype=bool)
    keep, _ = jax.lax.fori_loop(0, n, body, (keep0, supp0))
    return keep


def rotated_nms_mask(boxes_xywhr: jnp.ndarray,
                     scores: jnp.ndarray,
                     thresh: float,
                     valid: jnp.ndarray | None = None,
                     pre_max_size: int | None = None) -> jnp.ndarray:
    """Rotated-BEV-IoU NMS keep-mask (device; reference nms_gpu equivalent).

    [N,5] (cx,cy,dx,dy,yaw), [N] scores -> bool [N].  O(N^2) IoU matrix +
    sequential masked suppression; N is the static post-topk candidate
    count (typically <= 500), so the IoU matrix is small.
    """
    n = scores.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    if pre_max_size is not None and pre_max_size < n:
        topk_scores, topk_idx = jax.lax.top_k(
            jnp.where(valid, scores, -jnp.inf), pre_max_size)
        sub_keep = rotated_nms_mask(
            boxes_xywhr[topk_idx], topk_scores, thresh,
            valid=valid[topk_idx])
        keep = jnp.zeros((n,), dtype=bool)
        return keep.at[topk_idx].set(sub_keep)
    iou = rotated_iou_bev(boxes_xywhr, boxes_xywhr)
    overlap = iou > thresh
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))

    def body(k, state):
        keep, supp = state
        i = order[k]
        is_live = (~supp[i]) & valid[i]
        keep = keep.at[i].set(is_live)
        newly = overlap[i] & is_live
        newly = newly.at[i].set(False)
        return keep, supp | newly

    keep0 = jnp.zeros((n,), dtype=bool)
    supp0 = jnp.zeros((n,), dtype=bool)
    keep, _ = jax.lax.fori_loop(0, n, body, (keep0, supp0))
    return keep


# -- host-side numpy variants (used in eval utilities/tests) ---------------


def circle_nms(dets: np.ndarray, thresh: float,
               post_max_size: int = 83) -> list:
    """Numpy circular NMS returning kept indices (reference parity)."""
    x, y, scores = dets[:, 0], dets[:, 1], dets[:, 2]
    order = scores.argsort()[::-1]
    suppressed = np.zeros(dets.shape[0], dtype=bool)
    keep = []
    for i in order:
        if suppressed[i]:
            continue
        keep.append(int(i))
        d2 = (x[i] - x) ** 2 + (y[i] - y) ** 2
        suppressed |= d2 <= thresh
    return keep[:post_max_size]


def aligned_3d_nms(boxes: np.ndarray, scores: np.ndarray,
                   classes: np.ndarray, thresh: float) -> np.ndarray:
    """Axis-aligned 3D NMS on (x1,y1,z1,x2,y2,z2) boxes, class-aware
    (reference box3d_nms.py:120)."""
    x1, y1, z1, x2, y2, z2 = [boxes[:, i] for i in range(6)]
    area = (x2 - x1) * (y2 - y1) * (z2 - z1)
    order = scores.argsort()[::-1]
    keep = []
    suppressed = np.zeros(len(scores), dtype=bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(int(i))
        xx1 = np.maximum(x1[i], x1)
        yy1 = np.maximum(y1[i], y1)
        zz1 = np.maximum(z1[i], z1)
        xx2 = np.minimum(x2[i], x2)
        yy2 = np.minimum(y2[i], y2)
        zz2 = np.minimum(z2[i], z2)
        inter = (np.maximum(0, xx2 - xx1) * np.maximum(0, yy2 - yy1) *
                 np.maximum(0, zz2 - zz1))
        iou = inter / np.maximum(area[i] + area - inter, 1e-8)
        iou *= (classes == classes[i])
        suppressed |= iou > thresh
    return np.array(keep, dtype=np.int64)
