"""Formatting: sample dicts -> static padded arrays for the jit step.

The TPU counterpart of the reference's DataContainer packing
(reference: mmdet3d/datasets/pipelines/formating.py —
DefaultFormatBundle3D:175, Collect3D:85): instead of ragged tensors +
collate-time scatter, every sample is padded to the static budgets the
compiled train step expects, with explicit validity masks.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..nuscenes_dataset import PIPELINES


@PIPELINES.register_module()
class DefaultFormatBundle3D:
    """Kept for config-name parity; numeric packing happens in
    Collect3D."""

    def __init__(self, class_names=None, with_gt: bool = True,
                 with_label: bool = True):
        self.class_names = class_names

    def __call__(self, results):
        return results


@PIPELINES.register_module()
class Collect3D:
    """Pad points/boxes to static budgets and emit plain numpy arrays.

    Output keys (when present in the sample):
        points [max_points, C], point_mask [max_points];
        gt_boxes [max_objs, 9], gt_labels [max_objs], gt_mask [max_objs];
        img_inputs tuple passed through; meta dict under 'img_metas'.
    """

    def __init__(self, keys: Sequence[str],
                 meta_keys: Sequence[str] = ("sample_idx", "timestamp",
                                             "box_type_3d"),
                 max_points: int = 300_000, max_objs: int = 500):
        self.keys = list(keys)
        self.meta_keys = list(meta_keys)
        self.max_points = max_points
        self.max_objs = max_objs

    def __call__(self, results):
        out = {}
        if "points" in self.keys and "points" in results:
            pts = results["points"].tensor
            n = min(len(pts), self.max_points)
            buf = np.zeros((self.max_points, pts.shape[-1]), np.float32)
            buf[:n] = pts[:n]
            mask = np.zeros(self.max_points, bool)
            mask[:n] = True
            out["points"] = buf
            out["point_mask"] = mask
        if "gt_bboxes_3d" in self.keys and "gt_bboxes_3d" in results:
            boxes = results["gt_bboxes_3d"].tensor
            labels = np.asarray(results["gt_labels_3d"], np.int32)
            m = min(len(boxes), self.max_objs)
            bbuf = np.zeros((self.max_objs, 9), np.float32)
            if boxes.shape[-1] >= 9:
                bbuf[:m] = boxes[:m, :9]
            else:
                bbuf[:m, :boxes.shape[-1]] = boxes[:m]
            lbuf = np.zeros(self.max_objs, np.int32)
            lbuf[:m] = labels[:m]
            gmask = np.zeros(self.max_objs, bool)
            gmask[:m] = True
            out["gt_boxes"] = bbuf
            out["gt_labels"] = lbuf
            out["gt_mask"] = gmask
        if "img_inputs" in self.keys and "img_inputs" in results:
            out["img_inputs"] = tuple(
                np.asarray(a, np.float32)
                for a in results["img_inputs"])
        if "img" in self.keys and "img" in results:
            out["img"] = np.stack(
                [np.asarray(i, np.float32) for i in results["img"]])
        metas = {k: results.get(k) for k in self.meta_keys
                 if k in results}
        out["img_metas"] = metas
        return out


@PIPELINES.register_module()
class CustomCollect3D(Collect3D):
    """BEVFormer collect (reference: datasets/pipelines -> external
    BEVFormer plugin CustomCollect3D): same static packing as Collect3D
    with the queue/test metadata the sequential eval state machine
    needs."""

    def __init__(self, keys: Sequence[str],
                 meta_keys: Sequence[str] = (
                     "sample_idx", "timestamp", "can_bus", "lidar2img",
                     "scene_token", "box_type_3d"),
                 max_points: int = 300_000, max_objs: int = 500):
        super().__init__(keys, meta_keys=meta_keys,
                         max_points=max_points, max_objs=max_objs)


def collate_samples(samples: Sequence[dict]) -> dict:
    """Stack a list of Collect3D outputs into a batch (numpy)."""
    batch = {}
    keys = samples[0].keys()
    for k in keys:
        if k == "img_metas":
            batch[k] = [s[k] for s in samples]
        elif k == "img_inputs":
            parts = list(zip(*[s[k] for s in samples]))
            batch[k] = tuple(np.stack(p) for p in parts)
        else:
            batch[k] = np.stack([s[k] for s in samples])
    return batch
