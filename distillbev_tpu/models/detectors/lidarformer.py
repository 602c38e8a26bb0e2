"""Transformer-head LiDAR teachers: LidarFormer and MVPFormer.

Capability parity with the reference teachers
(reference: mmdet3d/models/detectors/lidarformer.py:11-188 — hard
voxelize + HardSimpleVFE + spconv SparseEncoder + SECOND + FPN +
DGCNN3DHead producing bev_embed/hs/query_embed; mvpformer.py:12-205 —
same but DynamicVoxelEncoder over 17-dim virtual points).
"""
from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builder import (DETECTORS, build_backbone, build_head,
                       build_middle_encoder, build_neck,
                       build_voxel_encoder)
from ...ops.voxelize import hard_voxelize


class FormerTeacherBundle(NamedTuple):
    bev_feat: jnp.ndarray        # [B, H, W, C] (pre-head BEV map)
    backbone_feats: Tuple[jnp.ndarray, ...]
    canvas: Optional[jnp.ndarray]


@DETECTORS.register_module()
class LidarFormer(nn.Module):
    pts_voxel_layer: Any = None
    pts_voxel_encoder: Any = None
    pts_middle_encoder: Any = None
    pts_backbone: Any = None
    pts_neck: Any = None
    pts_bbox_head: Any = None
    train_cfg: Any = None
    test_cfg: Any = None
    pretrained: Any = None

    def setup(self):
        self.voxel_encoder = build_voxel_encoder(
            dict(self.pts_voxel_encoder))
        self.middle_encoder = build_middle_encoder(
            dict(self.pts_middle_encoder))
        self.backbone = build_backbone(dict(self.pts_backbone))
        self.neck = build_neck(dict(self.pts_neck)) \
            if self.pts_neck else None
        head_cfg = dict(self.pts_bbox_head)
        head_cfg.pop("in_channels", None)
        head_cfg.pop("as_two_stage", None)
        head_cfg.setdefault("train_cfg", (self.train_cfg or {}).get(
            "pts"))
        head_cfg.setdefault("test_cfg", (self.test_cfg or {}).get("pts"))
        self.bbox_head = build_head(head_cfg)

    def extract_pts_feat(self, points, point_mask, train: bool = False
                         ) -> FormerTeacherBundle:
        vl = dict(self.pts_voxel_layer)
        max_voxels = vl["max_voxels"]
        if isinstance(max_voxels, (tuple, list)):
            max_voxels = max_voxels[0]
        vox = jax.vmap(lambda p, m: hard_voxelize(
            p, m, tuple(vl["voxel_size"]),
            tuple(vl["point_cloud_range"]), vl["max_num_points"],
            max_voxels))(points, point_mask)
        b, v = vox.coords.shape[:2]
        voxel_mask = jnp.arange(v)[None, :] < vox.num_voxels[:, None]
        vf = self.voxel_encoder(vox.voxels, vox.num_points, vox.coords,
                                voxel_mask, train=train)
        # flatten batch into one sparse tensor (batch idx in coords)
        batch_idx = jnp.broadcast_to(
            jnp.arange(b, dtype=jnp.int32)[:, None], (b, v))
        coords4 = jnp.concatenate(
            [batch_idx[..., None], vox.coords], axis=-1).reshape(
            b * v, 4)
        feats = vf.reshape(b * v, -1)
        valid = voxel_mask.reshape(b * v)
        bev = self.middle_encoder(feats, coords4, valid, b, train=train)
        backbone_feats = self.backbone(bev, train=train)
        if self.neck is not None:
            neck_out = self.neck(backbone_feats, train=train)
            if not isinstance(neck_out, (tuple, list)):
                neck_out = (neck_out,)
        else:
            neck_out = (backbone_feats[-1],)
        return FormerTeacherBundle(neck_out[0], backbone_feats,
                                   bev), tuple(neck_out)

    def __call__(self, points, point_mask, train: bool = False):
        bundle, mlvl = self.extract_pts_feat(points, point_mask,
                                             train=train)
        outs = self.bbox_head(list(mlvl), train=train)
        return outs, bundle

    def loss(self, outs, gt_boxes, gt_labels, gt_mask):
        return self.bbox_head.loss(outs, gt_boxes, gt_labels, gt_mask)

    def get_bboxes(self, outs):
        return self.bbox_head.get_bboxes(outs)


@DETECTORS.register_module()
class MVPFormer(LidarFormer):
    """MVP teacher: DynamicVoxelEncoder over 17-dim virtual points
    (reference mvpformer.py:37-49)."""

    def extract_pts_feat(self, points, point_mask, train: bool = False
                         ) -> FormerTeacherBundle:
        b = points.shape[0]
        outs = []
        # DynamicVoxelEncoder handles voxelize+encode per sample; fold
        # batch by offsetting voxel ids like DynamicCenterPoint
        feats_list, coords_list, valid_list = [], [], []
        for bi in range(b):
            f, c, nv = self.voxel_encoder(points[bi], point_mask[bi],
                                          train=train)
            v = f.shape[0]
            mask = jnp.arange(v) < nv
            batch_col = jnp.full((v, 1), bi, jnp.int32)
            coords_list.append(jnp.concatenate([batch_col, c], axis=-1))
            feats_list.append(f)
            valid_list.append(mask)
        feats = jnp.concatenate(feats_list, axis=0)
        coords4 = jnp.concatenate(coords_list, axis=0)
        valid = jnp.concatenate(valid_list, axis=0)
        bev = self.middle_encoder(feats, coords4, valid, b, train=train)
        backbone_feats = self.backbone(bev, train=train)
        if self.neck is not None:
            neck_out = self.neck(backbone_feats, train=train)
            if not isinstance(neck_out, (tuple, list)):
                neck_out = (neck_out,)
        else:
            neck_out = (backbone_feats[-1],)
        return FormerTeacherBundle(neck_out[0], backbone_feats,
                                   bev), tuple(neck_out)
