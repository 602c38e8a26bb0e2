"""DETR-style 3D heads: BEVFormerHead (camera student) and DGCNN3DHead
(LiDAR teachers).

Capability parity with the reference heads
(reference: mmdet3d/models/dense_heads/bevformer_head.py:26-520 — BEV
queries + object queries, learned positional encoding, cls/reg branches
per decoder layer, ``only_bev`` mode:154-165, output dict with
bev_embed/all_cls_scores/all_bbox_preds/hs/query_embed:216-226,
Hungarian-matched focal+L1 loss:337-494; dgcnn3d_head.py:18-510 the
teacher-side analogue over DeformableDetrTransformerDistill).

TPU-native: the Hungarian assignment runs ON DEVICE via
``optax.assignment.hungarian_algorithm`` over a statically-padded cost
matrix (the reference calls a host solver per sample —
a device->host sync inside the loss).  Padded GT columns carry +inf-like
cost so they never match real predictions; matches to padding are
dropped by masking.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..builder import HEADS, build_loss
from ..transformer.perception_transformer import (
    DeformableDetrTransformerDistill, PerceptionTransformer)
from ...core.bbox.coders import NMSFreeCoder


def normalize_bbox(boxes: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, cz, w, l, h, yaw, vx, vy) -> 10-dim regression target
    (cx, cy, log w, log l, cz, log h, sin, cos, vx, vy)
    (reference core/bbox/util.py normalize_bbox:4-24)."""
    cx, cy, cz = boxes[..., 0:1], boxes[..., 1:2], boxes[..., 2:3]
    w = jnp.log(jnp.maximum(boxes[..., 3:4], 1e-6))
    l = jnp.log(jnp.maximum(boxes[..., 4:5], 1e-6))
    h = jnp.log(jnp.maximum(boxes[..., 5:6], 1e-6))
    rot = boxes[..., 6:7]
    out = [cx, cy, w, l, cz, h, jnp.sin(rot), jnp.cos(rot)]
    if boxes.shape[-1] > 7:
        out += [boxes[..., 7:8], boxes[..., 8:9]]
    return jnp.concatenate(out, axis=-1)


def sine_positional_encoding_2d(h: int, w: int, num_feats: int,
                                temperature: float = 10000.0,
                                normalize: bool = True,
                                scale: float = 2.0 * math.pi,
                                offset: float = 0.0):
    """Param-free sine PE (mmcv SinePositionalEncoding over an all-valid
    mask — the only case the reference heads hit).  Returns
    [h*w, 2*num_feats] numpy, y-features then x-features."""
    import numpy as np
    y = np.arange(1, h + 1, dtype=np.float32)[:, None].repeat(w, 1)
    x = np.arange(1, w + 1, dtype=np.float32)[None, :].repeat(h, 0)
    if normalize:
        y = (y + offset) / (h + 1e-6) * scale
        x = (x + offset) / (w + 1e-6) * scale
    dim_t = temperature ** (
        2 * (np.arange(num_feats, dtype=np.float32) // 2) / num_feats)
    py = y[..., None] / dim_t
    px = x[..., None] / dim_t
    py = np.stack([np.sin(py[..., 0::2]), np.cos(py[..., 1::2])],
                  axis=-1).reshape(h, w, -1)
    px = np.stack([np.sin(px[..., 0::2]), np.cos(px[..., 1::2])],
                  axis=-1).reshape(h, w, -1)
    return np.concatenate([py, px], axis=-1).reshape(h * w, -1)


def make_match_cost_fns(assigner_cfg: Optional[dict]):
    """Config-driven matching costs (reference
    core/bbox/assigners/hungarian_assigner_3d.py:43-47 + mmcv
    FocalLossCost / ClassificationCost / BBox3DL1Cost; config surface
    configs/.../lidarformer_to_bevformer_nus_1x1conv_r50.py:201-206).

    Returns ``(cls_cost_fn, reg_weight)``; ``cls_cost_fn(logits [Q, C],
    labels [M]) -> [Q, M]``.  Defaults to the reference recipe's
    FocalLossCost(weight=2.0) + BBox3DL1Cost(weight=0.25).
    """
    cfg = dict(assigner_cfg or {})
    cls_cfg = dict(cfg.get("cls_cost",
                           dict(type="FocalLossCost", weight=2.0)))
    reg_cfg = dict(cfg.get("reg_cost",
                           dict(type="BBox3DL1Cost", weight=0.25)))
    iou_cfg = dict(cfg.get("iou_cost", dict(type="IoUCost", weight=0.0)))
    if float(iou_cfg.get("weight", 0.0)) != 0.0:
        raise ValueError(
            "HungarianAssigner3D iou_cost is a fake cost in the "
            "reference (weight 0.0); non-zero weight unsupported")
    reg_type = reg_cfg.get("type", "BBox3DL1Cost")
    if reg_type != "BBox3DL1Cost":
        raise ValueError(f"unknown reg_cost type {reg_type!r}")
    reg_weight = float(reg_cfg.get("weight", 0.25))

    cls_type = cls_cfg.get("type", "FocalLossCost")
    cls_weight = float(cls_cfg.get("weight", 2.0))
    if cls_type == "FocalLossCost":
        alpha = float(cls_cfg.get("alpha", 0.25))
        gamma = float(cls_cfg.get("gamma", 2.0))
        eps = float(cls_cfg.get("eps", 1e-12))

        def cls_cost_fn(logits, labels):
            prob = jax.nn.sigmoid(logits)                   # [Q, C]
            neg = (1 - alpha) * (prob ** gamma) * \
                (-jnp.log(1 - prob + eps))
            pos = alpha * ((1 - prob) ** gamma) * \
                (-jnp.log(prob + eps))
            return (pos - neg)[:, labels] * cls_weight       # [Q, M]
    elif cls_type == "ClassificationCost":
        def cls_cost_fn(logits, labels):
            score = jax.nn.softmax(logits, axis=-1)
            return -score[:, labels] * cls_weight
    else:
        raise ValueError(f"unknown cls_cost type {cls_type!r}")
    return cls_cost_fn, reg_weight


def hungarian_match_single(cls_scores, bbox_preds, norm_gt, gt_labels,
                           gt_mask, cls_cost_fn, reg_weight):
    """On-device Hungarian assignment for one sample.

    Returns assigned gt index per query ([Q] int32, -1 = background).
    Cost = cls_cost + L1(pred[:8], gt[:8]) * reg_weight over a padded
    [Q, M] matrix; padded GT columns carry a large constant so they
    never beat real columns, and matches to padding are dropped.
    """
    from optax import assignment
    q = cls_scores.shape[0]
    cls_cost = cls_cost_fn(cls_scores, gt_labels)            # [Q, M]
    reg_cost = jnp.abs(
        bbox_preds[:, None, :8] - norm_gt[None, :, :8]).sum(-1)
    cost = cls_cost + reg_cost * reg_weight
    big = 1e6
    cost = jnp.where(gt_mask[None, :], cost, big)
    rows, cols = assignment.hungarian_algorithm(cost)
    assigned_q = jnp.full((q,), -1, jnp.int32)
    return assigned_q.at[rows].set(
        jnp.where(gt_mask[cols], cols, -1))


class LearnedPositionalEncoding(nn.Module):
    """Row/col learned embeddings (mmcv LearnedPositionalEncoding)."""
    num_feats: int = 128
    row_num_embed: int = 200
    col_num_embed: int = 200

    @nn.compact
    def __call__(self, h: int, w: int):
        row = self.param("row_embed", nn.initializers.normal(1.0),
                         (self.row_num_embed, self.num_feats))
        col = self.param("col_embed", nn.initializers.normal(1.0),
                         (self.col_num_embed, self.num_feats))
        pos = jnp.concatenate([
            jnp.broadcast_to(col[None, :w], (h, w, self.num_feats)),
            jnp.broadcast_to(row[:h, None], (h, w, self.num_feats)),
        ], axis=-1)
        return pos.reshape(h * w, -1)


class _DETR3DHeadBase(nn.Module):
    """Shared cls/reg branches + Hungarian loss + decode."""
    num_classes: int = 10
    embed_dims: int = 256
    num_query: int = 900
    code_size: int = 10
    code_weights: Any = (1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2,
                         0.2)
    pc_range: Any = None
    bbox_coder: Any = None
    loss_cls: Any = None
    loss_bbox: Any = None
    num_reg_fcs: int = 2
    with_box_refine: bool = True
    train_cfg: Any = None
    test_cfg: Any = None
    sync_cls_avg_factor: bool = False

    def _branches(self, num_layers: int):
        def cls_branch(lvl, x):
            for i in range(self.num_reg_fcs):
                x = nn.Dense(self.embed_dims,
                             name=f"cls_{lvl}_fc{i}")(x)
                x = nn.LayerNorm(epsilon=1e-5, name=f"cls_{lvl}_ln{i}")(x)
                x = nn.relu(x)
            return nn.Dense(self.num_classes,
                            bias_init=nn.initializers.constant(-4.595),
                            name=f"cls_{lvl}_out")(x)

        def reg_branch(lvl, x):
            for i in range(self.num_reg_fcs):
                x = nn.Dense(self.embed_dims,
                             name=f"reg_{lvl}_fc{i}")(x)
                x = nn.relu(x)
            return nn.Dense(self.code_size, name=f"reg_{lvl}_out")(x)

        return cls_branch, reg_branch

    def _decode_outputs(self, hs, init_ref, inter_refs, cls_branch,
                        reg_branch):
        """Per-layer class scores + denormalized box preds
        (reference forward:185-215)."""
        from ..transformer.decoder import inverse_sigmoid
        pcr = list(self.pc_range)
        all_cls, all_box = [], []
        for lvl in range(hs.shape[0]):
            ref = init_ref if lvl == 0 else inter_refs[lvl - 1]
            ref = inverse_sigmoid(ref)
            cls = cls_branch(lvl, hs[lvl])
            tmp = reg_branch(lvl, hs[lvl])
            xy = jax.nn.sigmoid(tmp[..., 0:2] + ref[..., 0:2])
            z = jax.nn.sigmoid(tmp[..., 4:5] + ref[..., 2:3])
            cx = xy[..., 0:1] * (pcr[3] - pcr[0]) + pcr[0]
            cy = xy[..., 1:2] * (pcr[4] - pcr[1]) + pcr[1]
            cz = z * (pcr[5] - pcr[2]) + pcr[2]
            box = jnp.concatenate(
                [cx, cy, tmp[..., 2:4], cz, tmp[..., 5:]], axis=-1)
            all_cls.append(cls)
            all_box.append(box)
        return jnp.stack(all_cls), jnp.stack(all_box)

    # -- loss ----------------------------------------------------------
    def loss(self, outs: Dict, gt_boxes: jnp.ndarray,
             gt_labels: jnp.ndarray, gt_mask: jnp.ndarray
             ) -> Dict[str, jnp.ndarray]:
        """Hungarian-matched focal + weighted L1 over all decoder layers.

        gt_boxes [B, M, 9] *gravity-centered* (cx, cy, cz, w, l, h, yaw,
        vx, vy); the reference concatenates gravity_center + dims
        (bevformer_head loss pre-processing).
        """
        loss_cls_fn = build_loss(dict(self.loss_cls))
        loss_bbox_fn = build_loss(dict(self.loss_bbox))
        cls_cost_fn, reg_weight = make_match_cost_fns(
            (dict(self.train_cfg or {})).get("assigner"))
        cw = jnp.asarray(self.code_weights)
        norm_gt = normalize_bbox(gt_boxes)                  # [B, M, 10]
        losses = {}
        all_cls = outs["all_cls_scores"]
        all_box = outs["all_bbox_preds"]
        for lvl in range(all_cls.shape[0]):
            lc, lb = self._loss_single(
                all_cls[lvl], all_box[lvl], norm_gt, gt_labels, gt_mask,
                loss_cls_fn, loss_bbox_fn, cw, cls_cost_fn, reg_weight)
            suffix = "" if lvl == all_cls.shape[0] - 1 else f".d{lvl}"
            losses[f"loss_cls{suffix}"] = lc
            losses[f"loss_bbox{suffix}"] = lb
        return losses

    def _loss_single(self, cls_scores, bbox_preds, norm_gt, gt_labels,
                     gt_mask, loss_cls_fn, loss_bbox_fn, code_weights,
                     cls_cost_fn, reg_weight):
        """One decoder layer's loss with on-device Hungarian matching."""
        assigned = jax.vmap(
            lambda c, b_, g, l, m: hungarian_match_single(
                c, b_, g, l, m, cls_cost_fn, reg_weight))(
            cls_scores, bbox_preds, norm_gt, gt_labels, gt_mask)  # [B, Q]
        pos = assigned >= 0
        num_pos = jnp.maximum(pos.sum(), 1).astype(jnp.float32)

        tgt_labels = jnp.where(
            pos, jnp.take_along_axis(
                gt_labels, jnp.maximum(assigned, 0), axis=1),
            self.num_classes)
        onehot = jax.nn.one_hot(tgt_labels, self.num_classes)
        loss_cls = loss_cls_fn(cls_scores, onehot,
                               avg_factor=num_pos)

        tgt_boxes = jnp.take_along_axis(
            norm_gt, jnp.maximum(assigned, 0)[..., None], axis=1)
        w = pos[..., None].astype(jnp.float32) * code_weights
        valid = jnp.isfinite(tgt_boxes).all(-1, keepdims=True)
        w = w * valid
        loss_bbox = loss_bbox_fn(bbox_preds, jnp.where(valid, tgt_boxes,
                                                       0.0),
                                 w, avg_factor=num_pos)
        return loss_cls, loss_bbox

    def get_bboxes(self, outs: Dict):
        """Decode final-layer predictions via NMSFreeCoder."""
        coder_cfg = dict(self.bbox_coder)
        coder_cfg.pop("type", None)
        coder_cfg.pop("voxel_size", None)
        coder = NMSFreeCoder(**coder_cfg)
        cls = outs["all_cls_scores"][-1]
        box = outs["all_bbox_preds"][-1]
        dets = [coder.decode_single(cls[i], box[i])
                for i in range(cls.shape[0])]
        return jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *dets)


@HEADS.register_module()
class BEVFormerHead(_DETR3DHeadBase):
    bev_h: int = 200
    bev_w: int = 200
    transformer: Any = None
    positional_encoding: Any = None
    as_two_stage: bool = False
    real_h: float = 102.4
    real_w: float = 102.4

    @nn.compact
    def __call__(self, mlvl_feats, prev_bev=None, can_bus=None,
                 lidar2img=None, img_shape=None, only_bev: bool = False,
                 prev_valid=None, sca_budget=None,
                 train: bool = False):
        bev_queries = self.param(
            "bev_embedding", nn.initializers.normal(1.0),
            (self.bev_h * self.bev_w, self.embed_dims))
        query_embed = self.param(
            "query_embedding", nn.initializers.normal(1.0),
            (self.num_query, self.embed_dims * 2))
        pe_cfg = dict(self.positional_encoding or {})
        pe_cfg.pop("type", None)
        bev_pos = LearnedPositionalEncoding(
            name="positional_encoding", **pe_cfg)(self.bev_h, self.bev_w)
        bev_pos = jnp.broadcast_to(
            bev_pos[None], (mlvl_feats[0].shape[0],) + bev_pos.shape)

        t_cfg = dict(self.transformer or {})
        t_cfg.pop("type", None)
        transformer = PerceptionTransformer(name="transformer", **t_cfg)
        grid_length = (self.real_h / self.bev_h, self.real_w / self.bev_w)
        cls_branch, reg_branch = self._branches(6)

        if only_bev:
            return transformer(
                mlvl_feats, bev_queries, query_embed, self.bev_h,
                self.bev_w, grid_length=grid_length, bev_pos=bev_pos,
                prev_bev=prev_bev, can_bus=can_bus, lidar2img=lidar2img,
                img_shape=img_shape, only_bev=True,
                prev_valid=prev_valid, sca_budget=sca_budget,
                train=train)

        bev_embed, hs, init_ref, inter_refs = transformer(
            mlvl_feats, bev_queries, query_embed, self.bev_h, self.bev_w,
            grid_length=grid_length, bev_pos=bev_pos, prev_bev=prev_bev,
            can_bus=can_bus, lidar2img=lidar2img, img_shape=img_shape,
            reg_branch=reg_branch if self.with_box_refine else None,
            prev_valid=prev_valid, train=train)
        all_cls, all_box = self._decode_outputs(
            hs, init_ref, inter_refs, cls_branch, reg_branch)
        return dict(bev_embed=bev_embed, all_cls_scores=all_cls,
                    all_bbox_preds=all_box, hs=hs,
                    query_embed=query_embed, enc_cls_scores=None,
                    enc_bbox_preds=None)


@HEADS.register_module()
class DGCNN3DHead(_DETR3DHeadBase):
    """Teacher-side DETR head over multi-level LiDAR BEV features
    (reference dgcnn3d_head.py:18-510).

    As in the reference, the deformable ENCODER's queries are a learned
    ``bev_embedding`` (+ sine positional encoding) that cross-attends
    into the flattened FPN levels — the encoder output ``bev_embed`` is
    the distillation surface; the decoder then runs DETR-style object
    queries over it."""
    transformer: Any = None
    bev_h: int = 200
    bev_w: int = 200
    positional_encoding: Any = None

    @nn.compact
    def __call__(self, mlvl_feats, train: bool = False):
        """mlvl_feats: [B, H, W, C] or list thereof -> outs dict."""
        if not isinstance(mlvl_feats, (list, tuple)):
            mlvl_feats = [mlvl_feats]
        bev_queries = self.param(
            "bev_embedding", nn.initializers.normal(1.0),
            (self.bev_h * self.bev_w, self.embed_dims))
        query_embed = self.param(
            "query_embedding", nn.initializers.normal(1.0),
            (self.num_query, self.embed_dims * 2))
        pe = dict(self.positional_encoding or {})
        pe.pop("type", None)
        bev_pos = jnp.asarray(sine_positional_encoding_2d(
            self.bev_h, self.bev_w,
            pe.get("num_feats", self.embed_dims // 2),
            normalize=pe.get("normalize", True),
            offset=pe.get("offset", 0.0)))
        t_cfg = dict(self.transformer or {})
        t_cfg.pop("type", None)
        t_cfg.setdefault("bev_size", self.bev_h)
        transformer = DeformableDetrTransformerDistill(
            name="transformer", **t_cfg)
        cls_branch, reg_branch = self._branches(6)
        bev_embed, hs, init_ref, inter_refs = transformer(
            list(mlvl_feats), bev_queries, bev_pos, query_embed,
            reg_branch=reg_branch if self.with_box_refine else None,
            train=train)
        all_cls, all_box = self._decode_outputs(
            hs, init_ref, inter_refs, cls_branch, reg_branch)
        return dict(bev_embed=bev_embed, all_cls_scores=all_cls,
                    all_bbox_preds=all_box, hs=hs,
                    query_embed=query_embed)
