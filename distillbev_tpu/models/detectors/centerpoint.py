"""CenterPoint LiDAR detector (pillar + dynamic variants).

Capability parity with the reference detectors
(reference: mmdet3d/models/detectors/centerpoint.py:40-104 — CenterPoint
with ``extract_pts_feat(return_canvas, return_backbone_feature)`` and
``forward_pts_train(get_preds, get_targets)`` used by the distillation
engine; mvx_two_stage.py:219 hard ``voxelize``;
dynamic_centerpoint.py:14-99 — DynamicCenterPoint with coords-only
voxelization + DynamicScatter; MVP = DynamicCenterPoint with
``DynamicPillarFeatureNet(virtual=True, in_channels=17)``, configs/mvp/).

TPU-native design: a flax module whose ``__call__`` runs the full padded
static-shape pipeline points -> voxels -> VFE -> canvas -> SECOND ->
SECONDFPN -> CenterHead; batched voxelization via ``vmap`` of the static
sort-based voxelizer.  The reference's ``return_canvas`` /
``return_backbone_feature`` flags become a returned ``FeatureBundle`` so
the distiller can pick positions without re-running the teacher.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builder import (DETECTORS, build_backbone, build_head,
                       build_middle_encoder, build_neck,
                       build_voxel_encoder)
from ...ops.voxelize import hard_voxelize, compute_voxel_coords, \
    sorted_voxel_info, unique_voxels
from ...ops.scatter import scatter_reduce


class FeatureBundle(NamedTuple):
    """Every intermediate the distillation engine can pair on."""
    canvas: Optional[jnp.ndarray]          # [B, ny, nx, C] scatter canvas
    backbone_feats: Optional[Tuple[jnp.ndarray, ...]]   # SECOND stages
    neck_feat: jnp.ndarray                 # SECONDFPN output [B, H, W, C]


@DETECTORS.register_module()
class CenterPoint(nn.Module):
    """Hard-voxelization (pillar) CenterPoint."""
    pts_voxel_layer: Any = None
    pts_voxel_encoder: Any = None
    pts_middle_encoder: Any = None
    pts_backbone: Any = None
    pts_neck: Any = None
    pts_bbox_head: Any = None
    train_cfg: Any = None
    test_cfg: Any = None
    max_points_per_sample: int = 0   # unused; points arrive padded
    # fused sorted-pillar path: skips the [V, P, C] scatter-fill (the
    # most expensive op of the pillar pipeline on TPU) and runs the VFE
    # as segmented reductions over the sorted point array.  Numerically
    # identical to the unfused path (same kept set, same statistics);
    # used whenever the voxel encoder exposes ``encode_sorted``.
    fused_pillars: bool = True
    # cast the scatter canvas before SECOND/FPN (e.g. "bfloat16"): the
    # dense BEV convs are bandwidth bound; geometry/VFE stats stay fp32
    backbone_dtype: Any = None
    # points arrive pre-sorted by pillar key from the host pipeline
    # (SortPointsByPillar with THIS model's voxel_size/pc_range):
    # skips the on-device sort + sorted-row gather in the fused path.
    # apis/train verifies the pipeline matches before enabling this.
    presorted_points: bool = False

    def setup(self):
        self.voxel_encoder = build_voxel_encoder(
            dict(self.pts_voxel_encoder))
        self.middle_encoder = build_middle_encoder(
            dict(self.pts_middle_encoder))
        self.backbone = build_backbone(dict(self.pts_backbone))
        self.neck = build_neck(dict(self.pts_neck))
        head_cfg = dict(self.pts_bbox_head)
        head_cfg.setdefault("train_cfg",
                            (self.train_cfg or {}).get("pts"))
        head_cfg.setdefault("test_cfg", (self.test_cfg or {}).get("pts"))
        self.bbox_head = build_head(head_cfg)

    def voxelize(self, points, point_mask):
        """[B, N, C] padded points -> batched static voxel tensors."""
        vl = dict(self.pts_voxel_layer)
        max_voxels = vl["max_voxels"]
        if isinstance(max_voxels, (tuple, list)):
            max_voxels = max_voxels[0]
        vox_fn = lambda p, m: hard_voxelize(
            p, m, tuple(vl["voxel_size"]),
            tuple(vl["point_cloud_range"]),
            vl["max_num_points"], max_voxels)
        return jax.vmap(vox_fn)(points, point_mask)

    def _voxel_layer_args(self):
        vl = dict(self.pts_voxel_layer)
        max_voxels = vl["max_voxels"]
        if isinstance(max_voxels, (tuple, list)):
            max_voxels = max_voxels[0]
        return (tuple(vl["voxel_size"]), tuple(vl["point_cloud_range"]),
                vl["max_num_points"], max_voxels)

    def _extract_fused(self, points, point_mask, train: bool):
        """Sorted-pillar fast path (no [V, P, C] materialization)."""
        vs, pcr, max_points, max_voxels = self._voxel_layer_args()
        info = jax.vmap(lambda p, m: sorted_voxel_info(
            p, m, vs, pcr, max_points, max_voxels,
            presorted=self.presorted_points))(points, point_mask)
        b, n, c = points.shape
        v = max_voxels
        # fold batch into the segment axis: sample i's voxels live in
        # [i*v, (i+1)*v); dropped rows go to the b*v sentinel.  Runs stay
        # contiguous, which is all the segmented reductions need.
        off = jnp.arange(b, dtype=jnp.int32)[:, None] * v
        vidx_flat = jnp.where(info.keep, info.voxel_idx + off,
                              b * v).reshape(-1)
        voxel_mask = (jnp.arange(v)[None, :] <
                      info.num_voxels[:, None])
        # flat start rows: sample i's rows live at [i*n, (i+1)*n);
        # per-sample sentinels (== n) become the flat sentinel b*n
        row_off = jnp.arange(b, dtype=jnp.int32)[:, None] * n
        start_rows_flat = jnp.where(info.start_rows < n,
                                    info.start_rows + row_off,
                                    b * n).reshape(-1)
        vf = self.voxel_encoder.encode_sorted(
            info.sorted_pts.reshape(b * n, c), vidx_flat,
            info.slot.reshape(-1), info.keep.reshape(-1),
            info.coords.reshape(b * v, 3),
            info.num_points.reshape(-1), b * v, max_points,
            voxel_mask=voxel_mask.reshape(-1),
            start_rows=start_rows_flat, train=train)
        vf = vf.reshape(b, v, -1)
        canvas = self.middle_encoder(vf, info.coords, voxel_mask)
        if self.backbone_dtype is not None:
            canvas = canvas.astype(self.backbone_dtype)
        feats = self.backbone(canvas, train=train)
        neck = self.neck(feats, train=train)
        return FeatureBundle(canvas, feats, neck)

    def extract_pts_feat(self, points, point_mask, train: bool = False
                         ) -> FeatureBundle:
        if self.fused_pillars and hasattr(self.voxel_encoder,
                                          "encode_sorted"):
            return self._extract_fused(points, point_mask, train)
        vox = self.voxelize(points, point_mask)
        voxel_mask = jnp.arange(vox.voxels.shape[1])[None, :] < \
            vox.num_voxels[:, None]
        vf = self.voxel_encoder(vox.voxels, vox.num_points, vox.coords,
                                voxel_mask, train=train)
        canvas = self.middle_encoder(vf, vox.coords, voxel_mask)
        if self.backbone_dtype is not None:
            canvas = canvas.astype(self.backbone_dtype)
        feats = self.backbone(canvas, train=train)
        neck = self.neck(feats, train=train)
        return FeatureBundle(canvas, feats, neck)

    def __call__(self, points, point_mask, train: bool = False):
        """Forward to head predictions; returns (preds, FeatureBundle)."""
        bundle = self.extract_pts_feat(points, point_mask, train=train)
        preds = self.bbox_head(bundle.neck_feat, train=train)
        return preds, bundle

    def loss(self, preds, gt_boxes, gt_labels, gt_mask,
             return_targets: bool = False):
        return self.bbox_head.loss(preds, gt_boxes, gt_labels, gt_mask,
                                   return_targets=return_targets)

    def get_bboxes(self, preds):
        return self.bbox_head.get_bboxes(preds)


@DETECTORS.register_module()
class DynamicCenterPoint(nn.Module):
    """Dynamic-voxelization CenterPoint (coords-only voxelize + dynamic
    pillar VFE).  MVP teacher == this with virtual=True 17-dim points."""
    pts_voxel_layer: Any = None
    pts_voxel_encoder: Any = None
    pts_middle_encoder: Any = None
    pts_backbone: Any = None
    pts_neck: Any = None
    pts_bbox_head: Any = None
    train_cfg: Any = None
    test_cfg: Any = None
    max_voxels: int = 32000

    def setup(self):
        self.voxel_encoder = build_voxel_encoder(
            dict(self.pts_voxel_encoder))
        self.middle_encoder = build_middle_encoder(
            dict(self.pts_middle_encoder))
        self.backbone = build_backbone(dict(self.pts_backbone))
        self.neck = build_neck(dict(self.pts_neck))
        head_cfg = dict(self.pts_bbox_head)
        head_cfg.setdefault("train_cfg",
                            (self.train_cfg or {}).get("pts"))
        head_cfg.setdefault("test_cfg", (self.test_cfg or {}).get("pts"))
        self.bbox_head = build_head(head_cfg)

    def _branch_canvas(self, points, point_mask, voxel_encoder,
                       middle_encoder, train: bool):
        """Dynamic voxelize + VFE + scatter for one point set; shared by
        the single- and multi-branch variants."""
        import numpy as np
        vl = dict(self.pts_voxel_layer)
        vs = tuple(vl["voxel_size"])
        pcr = tuple(vl["point_cloud_range"])
        grid_xyz = np.floor((np.asarray(pcr[3:]) - np.asarray(pcr[:3]))
                            / np.asarray(vs) + 0.5).astype(np.int32)
        grid_zyx = jnp.asarray(grid_xyz[::-1].copy())

        def per_sample(pts, mask):
            coords, in_range = compute_voxel_coords(pts, vs, pcr)
            ok = in_range & mask
            p2v, vcoords, nvox = unique_voxels(coords, ok, grid_zyx,
                                               self.max_voxels)
            return p2v, vcoords, nvox

        p2v, vcoords, nvox = jax.vmap(per_sample)(points, point_mask)

        # voxel encoder holds params -> cannot vmap over module call with
        # shared params via jax.vmap directly; use nn.vmap-free loop via
        # folding batch into the point axis instead:
        b, n, c = points.shape
        batch_off = jnp.arange(b, dtype=jnp.int32)[:, None] * self.max_voxels
        p2v_flat = jnp.where(p2v < self.max_voxels, p2v + batch_off,
                             b * self.max_voxels).reshape(-1)
        pts_flat = points.reshape(b * n, c)
        vcoords_flat = vcoords.reshape(b * self.max_voxels, 3)
        vfeats = voxel_encoder(pts_flat, p2v_flat, vcoords_flat,
                               b * self.max_voxels,
                               valid=point_mask.reshape(-1),
                               train=train)
        vfeats = vfeats.reshape(b, self.max_voxels, -1)
        voxel_mask = jnp.arange(self.max_voxels)[None, :] < nvox[:, None]
        return middle_encoder(vfeats, vcoords, voxel_mask)

    def extract_pts_feat(self, points, point_mask, train: bool = False
                         ) -> FeatureBundle:
        canvas = self._branch_canvas(points, point_mask,
                                     self.voxel_encoder,
                                     self.middle_encoder, train)
        feats = self.backbone(canvas, train=train)
        neck = self.neck(feats, train=train)
        return FeatureBundle(canvas, feats, neck)

    def __call__(self, points, point_mask, train: bool = False):
        bundle = self.extract_pts_feat(points, point_mask, train=train)
        preds = self.bbox_head(bundle.neck_feat, train=train)
        return preds, bundle

    def loss(self, preds, gt_boxes, gt_labels, gt_mask,
             return_targets: bool = False):
        return self.bbox_head.loss(preds, gt_boxes, gt_labels, gt_mask,
                                   return_targets=return_targets)

    def get_bboxes(self, preds):
        return self.bbox_head.get_bboxes(preds)


@DETECTORS.register_module()
class DynamicMultiBranchCenterPoint(DynamicCenterPoint):
    """Feature-level temporal point-cloud fusion
    (reference dynamic_centerpoint.py:99-215): points are split by the
    per-point time-lag channel into the current sweep (t < time_thres)
    and prior sweeps; each branch gets its own dynamic voxelizer + VFE +
    scatter (+ optional pre-process net), and the branch canvases are
    fused (cat/add/avg) before the shared backbone.

    TPU-native: boolean time masks replace the reference's boolean
    indexing (static shapes); "no prior sweeps" falls back to the
    current-sweep canvas with a traced where instead of Python control
    flow.  ``repeat == 1`` as in the reference."""
    pre_process: Any = None
    repeat: int = 1
    fuse: str = "cat"
    max_multi_sweeps: Any = None
    time_thres: Any = None

    def setup(self):
        super().setup()
        n_branch = self.repeat + 1
        self.branch_voxel_encoders = [
            build_voxel_encoder(dict(self.pts_voxel_encoder))
            for _ in range(self.repeat)]
        self.branch_middle_encoders = [
            build_middle_encoder(dict(self.pts_middle_encoder))
            for _ in range(self.repeat)]
        if self.pre_process:
            self.pre_process_nets = [
                build_backbone(dict(self.pre_process))
                for _ in range(n_branch)]

    def extract_pts_feat(self, points, point_mask, train: bool = False
                         ) -> FeatureBundle:
        assert self.repeat == 1, "reference supports repeat == 1"
        t = points[..., 4]
        thres = jnp.float32(self.time_thres)
        # reference: past branch starts at the earliest prior-sweep
        # timestamp >= time_thres (falls back to time_thres when none)
        past = (t >= thres) & point_mask
        big = jnp.float32(1e9)
        min_past = jnp.min(jnp.where(past, t, big), axis=1,
                           keepdims=True)
        has_past = jnp.any(past, axis=1, keepdims=True)
        split = jnp.where(has_past, jnp.minimum(min_past, big), thres)

        cur_mask = point_mask & (t < split)
        past_mask = point_mask & (t >= split)
        canvases = [self._branch_canvas(points, cur_mask,
                                        self.voxel_encoder,
                                        self.middle_encoder, train)]
        past_canvas = self._branch_canvas(points, past_mask,
                                          self.branch_voxel_encoders[0],
                                          self.branch_middle_encoders[0],
                                          train)
        # repeat the current canvas when a sample has no prior sweeps
        gate = has_past[:, 0].reshape(-1, 1, 1, 1)
        canvases.append(jnp.where(gate, past_canvas, canvases[0]))
        if self.pre_process:
            canvases = [net(cv, train=train)[0]
                        for net, cv in zip(self.pre_process_nets,
                                           canvases)]
        if self.fuse == "cat":
            canvas = jnp.concatenate(canvases, axis=-1)
        elif self.fuse == "add":
            canvas = sum(canvases)
        elif self.fuse == "avg":
            canvas = sum(canvases) / len(canvases)
        else:
            raise NotImplementedError(self.fuse)
        feats = self.backbone(canvas, train=train)
        neck = self.neck(feats, train=train)
        return FeatureBundle(canvas, feats, neck)
