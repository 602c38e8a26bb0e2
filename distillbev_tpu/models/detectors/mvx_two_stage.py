"""Generic multi-modality two-stage detector base.

Capability parity with the reference's ``MVXTwoStageDetector`` /
``MVXFasterRCNN`` (reference: mmdet3d/models/detectors/mvx_two_stage.py
:21-529 — owns pts_voxel_layer/voxel_encoder/middle_encoder/backbone/
neck/bbox_head with hard ``voxelize``:219 and ``forward_train``:244;
mvx_faster_rcnn.py).  In this framework the LiDAR-only path is exactly
``CenterPoint``; this class adds the optional image branch fields so
configs targeting the generic detector build unchanged.
"""
from __future__ import annotations

from typing import Any

from flax import linen as nn

from ..builder import DETECTORS, build_backbone, build_neck
from .centerpoint import CenterPoint


@DETECTORS.register_module()
class MVXTwoStageDetector(CenterPoint):
    pts_fusion_layer: Any = None
    img_backbone: Any = None
    img_neck: Any = None
    img_roi_head: Any = None
    img_rpn_head: Any = None
    img_bbox_head: Any = None
    pretrained: Any = None

    def setup(self):
        super().setup()
        if self.img_backbone is not None:
            self.image_backbone = build_backbone(dict(self.img_backbone))
        if self.img_neck is not None:
            self.image_neck = build_neck(dict(self.img_neck))

    def extract_img_feat(self, imgs, train: bool = False):
        """Optional image branch (fusion models)."""
        if self.img_backbone is None:
            return None
        b, n, h, w, c = imgs.shape
        x = self.image_backbone(imgs.reshape(b * n, h, w, c),
                                train=train)
        if self.img_neck is not None:
            x = self.image_neck(x, train=train)
        return x


@DETECTORS.register_module()
class MVXFasterRCNN(MVXTwoStageDetector):
    """Config-name compatibility (reference mvx_faster_rcnn.py)."""
