"""Single- and two-stage 3D detector bases.

Capability parity with the reference's generic detector shells
(reference: mmdet3d/models/detectors/single_stage.py:1-71 —
``SingleStage3DDetector`` whose ``extract_feat`` is backbone(+neck) and
whose ``forward_dummy`` feeds the head for FLOPs counting;
two_stage.py:1-16 — ``TwoStage3DDetector``, a shell inheriting mmdet's
``TwoStageDetector`` rpn/roi composition).  No shipped reference config
instantiates either; they are composition bases for single-/two-stage
LiDAR detectors.

TPU-native design: flax modules assembling registry-built parts over
channels-last dense feature maps (static shapes end to end).  The
reference's ``forward(return_loss)`` dispatch does not exist in this
framework — ``__call__`` produces head predictions and ``loss`` is a
separate pure method delegating to the head, like every other detector
here (see detectors/centerpoint.py).
"""
from __future__ import annotations

from typing import Any

from flax import linen as nn

from ..builder import DETECTORS, build_backbone, build_head, build_neck


@DETECTORS.register_module()
class SingleStage3DDetector(nn.Module):
    """Backbone(+neck)+head over a dense BEV/point feature map.

    Reference single_stage.py:25-71.  Input is a channels-last feature
    array (e.g. a scattered pillar canvas ``[B, ny, nx, C]``); the
    voxelization/VFE front end of a concrete detector subclass feeds it.
    """
    backbone: Any = None
    neck: Any = None
    bbox_head: Any = None
    train_cfg: Any = None
    test_cfg: Any = None
    pretrained: Any = None

    def setup(self):
        self.backbone_mod = build_backbone(dict(self.backbone))
        self.neck_mod = (build_neck(dict(self.neck))
                         if self.neck is not None else None)
        head_cfg = dict(self.bbox_head)
        # reference single_stage.py:36-37 pushes train/test cfg into the
        # head config before building
        head_cfg.setdefault("train_cfg", self.train_cfg)
        head_cfg.setdefault("test_cfg", self.test_cfg)
        self.bbox_head_mod = build_head(head_cfg)

    def extract_feat(self, x, train: bool = False):
        """backbone -> optional neck (reference single_stage.py:55-64)."""
        feats = self.backbone_mod(x, train=train)
        if self.neck_mod is not None:
            feats = self.neck_mod(feats, train=train)
        return feats

    def __call__(self, x, train: bool = False):
        feats = self.extract_feat(x, train=train)
        return self.bbox_head_mod(feats, train=train)

    # reference single_stage.py:42-53 (FLOPs counting entry)
    def forward_dummy(self, x):
        return self(x, train=False)

    def loss(self, preds, *args, **kwargs):
        return self.bbox_head_mod.loss(preds, *args, **kwargs)

    def get_bboxes(self, preds, *args, **kwargs):
        return self.bbox_head_mod.get_bboxes(preds, *args, **kwargs)


@DETECTORS.register_module()
class TwoStage3DDetector(nn.Module):
    """Shared-feature rpn -> roi composition (reference two_stage.py:1-16,
    delegating to mmdet ``TwoStageDetector`` semantics: rpn proposes on
    the shared features, the roi head consumes features + proposals)."""
    backbone: Any = None
    neck: Any = None
    rpn_head: Any = None
    roi_head: Any = None
    train_cfg: Any = None
    test_cfg: Any = None
    pretrained: Any = None

    def setup(self):
        self.backbone_mod = build_backbone(dict(self.backbone))
        self.neck_mod = (build_neck(dict(self.neck))
                         if self.neck is not None else None)
        if self.rpn_head is not None:
            rpn_cfg = dict(self.rpn_head)
            rpn_cfg.setdefault("train_cfg",
                               (self.train_cfg or {}).get("rpn"))
            rpn_cfg.setdefault("test_cfg",
                               (self.test_cfg or {}).get("rpn"))
            self.rpn_head_mod = build_head(rpn_cfg)
        else:
            self.rpn_head_mod = None
        if self.roi_head is not None:
            roi_cfg = dict(self.roi_head)
            roi_cfg.setdefault("train_cfg",
                               (self.train_cfg or {}).get("rcnn"))
            roi_cfg.setdefault("test_cfg",
                               (self.test_cfg or {}).get("rcnn"))
            self.roi_head_mod = build_head(roi_cfg)
        else:
            self.roi_head_mod = None

    def extract_feat(self, x, train: bool = False):
        feats = self.backbone_mod(x, train=train)
        if self.neck_mod is not None:
            feats = self.neck_mod(feats, train=train)
        return feats

    def __call__(self, x, train: bool = False):
        """Returns ``(rpn_outs, roi_outs)``; ``roi_outs`` is None when no
        roi head is configured (proposal-only mode)."""
        feats = self.extract_feat(x, train=train)
        rpn_outs = (self.rpn_head_mod(feats, train=train)
                    if self.rpn_head_mod is not None else None)
        roi_outs = (self.roi_head_mod(feats, rpn_outs, train=train)
                    if self.roi_head_mod is not None else None)
        return rpn_outs, roi_outs
