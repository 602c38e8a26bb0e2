"""Box coders.

``CenterPointBBoxCoder`` — decode CenterHead outputs to boxes
(reference: mmdet3d/core/bbox/coders/centerpoint_bbox_coders.py:9-180):
top-K peaks over the class heatmaps, gather regressions at those indices,
reconstruct (x, y, z, dims, yaw, vel), filter by score threshold and
post-center range.  TPU-native: fixed K, mask-based filtering (no dynamic
boolean indexing), channels-last maps.

``NMSFreeCoder`` — decode DETR-style query predictions
(reference: mmdet3d/core/bbox/coders/nms_free_coder.py:10-124).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from ...registry import Registry

CODERS = Registry("bbox_coders_core")


class DecodedBoxes(NamedTuple):
    bboxes: jnp.ndarray   # [B, K, code_size] (x, y, z_bottom, dx,dy,dz, yaw, vx, vy)
    scores: jnp.ndarray   # [B, K]
    labels: jnp.ndarray   # [B, K] int32
    valid: jnp.ndarray    # [B, K] bool


@CODERS.register_module()
class CenterPointBBoxCoder:

    def __init__(self,
                 pc_range: Optional[Sequence[float]] = None,
                 out_size_factor: int = 4,
                 voxel_size: Sequence[float] = (0.2, 0.2),
                 post_center_range: Optional[Sequence[float]] = None,
                 max_num: int = 100,
                 score_threshold: Optional[float] = None,
                 code_size: int = 9):
        self.pc_range = pc_range
        self.out_size_factor = out_size_factor
        self.voxel_size = voxel_size
        self.post_center_range = post_center_range
        self.max_num = max_num
        self.score_threshold = score_threshold
        self.code_size = code_size

    def decode(self,
               heat: jnp.ndarray,
               rot_sine: jnp.ndarray,
               rot_cosine: jnp.ndarray,
               hei: jnp.ndarray,
               dim: jnp.ndarray,
               vel: Optional[jnp.ndarray],
               reg: Optional[jnp.ndarray] = None,
               task_id: int = -1) -> DecodedBoxes:
        """All maps channels-last: heat [B, H, W, n_cls], reg [B, H, W, 2],
        hei [B, H, W, 1], dim [B, H, W, 3] (already exp'ed by caller if
        norm_bbox), rot_* [B, H, W, 1], vel [B, H, W, 2]."""
        b, h, w, n_cls = heat.shape
        k = self.max_num
        flat = heat.reshape(b, h * w * n_cls)
        scores, flat_idx = jax.lax.top_k(flat, k)          # [B, K]
        cls = (flat_idx % n_cls).astype(jnp.int32)
        pix = flat_idx // n_cls
        ys = (pix // w).astype(jnp.float32)
        xs = (pix % w).astype(jnp.float32)

        def gather(m):
            mm = m.reshape(b, h * w, -1)
            return jnp.take_along_axis(mm, pix[..., None], axis=1)

        if reg is not None:
            r = gather(reg)                                # [B, K, 2]
            xs = xs + r[..., 0]
            ys = ys + r[..., 1]
        else:
            xs = xs + 0.5
            ys = ys + 0.5
        rot = jnp.arctan2(gather(rot_sine)[..., 0],
                          gather(rot_cosine)[..., 0])
        hei_k = gather(hei)[..., 0]
        dim_k = gather(dim)                                # [B, K, 3]
        x = xs * self.out_size_factor * self.voxel_size[0] + self.pc_range[0]
        y = ys * self.out_size_factor * self.voxel_size[1] + self.pc_range[1]
        parts = [x[..., None], y[..., None], hei_k[..., None], dim_k,
                 rot[..., None]]
        if vel is not None:
            parts.append(gather(vel))
        boxes = jnp.concatenate(parts, axis=-1)

        valid = jnp.ones_like(scores, dtype=bool)
        if self.score_threshold is not None:
            valid &= scores > self.score_threshold
        if self.post_center_range is not None:
            pcr = jnp.asarray(self.post_center_range)
            valid &= (boxes[..., :3] >= pcr[:3]).all(-1)
            valid &= (boxes[..., :3] <= pcr[3:]).all(-1)
        return DecodedBoxes(boxes, scores, cls, valid)


@CODERS.register_module()
class NMSFreeCoder:
    """Decode DETR-style (cls_scores, bbox_preds) without NMS.

    bbox_preds layout (reference NMSFreeCoder.decode_single):
    (cx, cy, w, l, cz, h, sin, cos, vx, vy) with cx/cy/cz already
    denormalized by the caller; selects top ``max_num`` query-class pairs.
    """

    def __init__(self,
                 pc_range: Sequence[float],
                 voxel_size: Optional[Sequence[float]] = None,
                 post_center_range: Optional[Sequence[float]] = None,
                 max_num: int = 100,
                 score_threshold: Optional[float] = None,
                 num_classes: int = 10):
        self.pc_range = pc_range
        self.post_center_range = post_center_range
        self.max_num = max_num
        self.score_threshold = score_threshold
        self.num_classes = num_classes

    def decode_single(self, cls_scores: jnp.ndarray,
                      bbox_preds: jnp.ndarray) -> DecodedBoxes:
        """cls_scores [Q, n_cls] logits; bbox_preds [Q, 10]."""
        q, n_cls = cls_scores.shape
        scores_all = jax.nn.sigmoid(cls_scores).reshape(-1)
        k = min(self.max_num, scores_all.shape[0])
        scores, idx = jax.lax.top_k(scores_all, k)
        labels = (idx % n_cls).astype(jnp.int32)
        qidx = idx // n_cls
        bp = bbox_preds[qidx]
        cx, cy, w_, l_, cz, h_ = (bp[:, 0], bp[:, 1], bp[:, 2], bp[:, 3],
                                  bp[:, 4], bp[:, 5])
        rot = jnp.arctan2(bp[:, 6], bp[:, 7])
        # bottom center convention: z - h/2
        boxes = jnp.stack(
            [cx, cy, cz - jnp.exp(h_) / 2, jnp.exp(w_), jnp.exp(l_),
             jnp.exp(h_), rot, bp[:, 8], bp[:, 9]], axis=-1)
        valid = jnp.ones_like(scores, dtype=bool)
        if self.score_threshold is not None:
            valid &= scores > self.score_threshold
        if self.post_center_range is not None:
            pcr = jnp.asarray(self.post_center_range)
            valid &= (boxes[:, :3] >= pcr[:3]).all(-1)
            valid &= (boxes[:, :3] <= pcr[3:]).all(-1)
        return DecodedBoxes(boxes[None], scores[None], labels[None],
                            valid[None])
