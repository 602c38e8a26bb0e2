"""Test-time augmentation wrapper.

Capability parity with the reference's ``MultiScaleFlipAug3D``
(reference: mmdet3d/datasets/pipelines/test_time_aug.py — wraps the inner
transforms and emits one sample per (scale, flip, pcd-flip) combination).
"""
from __future__ import annotations

from typing import Optional, Sequence

from ..nuscenes_dataset import PIPELINES, compose_pipeline


@PIPELINES.register_module()
class MultiScaleFlipAug3D:

    def __init__(self, transforms: Sequence[dict], img_scale=None,
                 pts_scale_ratio=1, flip: bool = False,
                 flip_direction="horizontal",
                 pcd_horizontal_flip: bool = False,
                 pcd_vertical_flip: bool = False):
        self.transforms = compose_pipeline(transforms)
        self.img_scale = img_scale if isinstance(img_scale, list) \
            else [img_scale]
        self.pts_scale_ratio = (pts_scale_ratio if isinstance(
            pts_scale_ratio, list) else [float(pts_scale_ratio)])
        self.flip = flip
        self.pcd_horizontal_flip = pcd_horizontal_flip
        self.pcd_vertical_flip = pcd_vertical_flip
        self.flip_direction = (flip_direction if isinstance(
            flip_direction, list) else [flip_direction])

    def __call__(self, results):
        aug_data = []
        flip_aug = [False, True] if self.flip else [False]
        h_flips = [False, True] if self.pcd_horizontal_flip else [False]
        v_flips = [False, True] if self.pcd_vertical_flip else [False]
        for scale in self.img_scale:
            for ratio in self.pts_scale_ratio:
                for fl in flip_aug:
                    for h in h_flips:
                        for v in v_flips:
                            for d in self.flip_direction:
                                r = dict(results)
                                r["scale"] = scale
                                r["flip"] = fl
                                r["pcd_scale_factor"] = ratio
                                r["flip_direction"] = d
                                r["pcd_horizontal_flip"] = h
                                r["pcd_vertical_flip"] = v
                                out = self.transforms(r)
                                if out is not None:
                                    aug_data.append(out)
        if len(aug_data) == 1:
            return aug_data[0]
        return aug_data
