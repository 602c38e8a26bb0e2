"""3D augmentation + filtering pipeline transforms.

Capability parity with the reference's transforms
(reference: mmdet3d/datasets/pipelines/transforms_3d.py —
RandomFlip3D:71 (update_transform:145), ObjectSample:284,
GlobalRotScaleTrans:540 (update_transform:671), PointsRangeFilter:733,
ObjectRangeFilter:772, ObjectNameFilter:824, PointShuffle,
PhotoMetricDistortionMultiViewImage:1479, NormalizeMultiviewImage:1580,
PadMultiViewImage:1620) and dbsampler.py:81.

``update_img2lidar=True`` rewrites the camera->lidar extrinsics in
``img_inputs`` with the BEV-space augmentation so the image-derived BEV
stays geometrically consistent.  Our ``img_inputs`` rots/trans are
[F, N, ...]; the aug applies to every frame.
"""
from __future__ import annotations

import os.path as osp
import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..nuscenes_dataset import PIPELINES
from ...core.bbox.structures import LiDARInstance3DBoxes
from ...core.bbox import box_np_ops
from ...core.points import LiDARPoints


def _apply_aug_to_img_inputs(results, aug4: np.ndarray):
    """Left-multiply cam->lidar transforms by the BEV aug transform."""
    img_inputs = list(results["img_inputs"])
    rots, trans = img_inputs[1], img_inputs[2]
    f, n = rots.shape[:2]
    for fi in range(f):
        for ci in range(n):
            m = np.eye(4, dtype=np.float32)
            m[:3, :3] = rots[fi, ci]
            m[:3, 3] = trans[fi, ci]
            m = aug4 @ m
            rots[fi, ci] = m[:3, :3]
            trans[fi, ci] = m[:3, 3]
    img_inputs[1], img_inputs[2] = rots, trans
    results["img_inputs"] = tuple(img_inputs)


@PIPELINES.register_module()
class RandomFlip3D:
    """BEV flips of points/boxes (+ extrinsics update)."""

    def __init__(self, flip_ratio_bev_horizontal: float = 0.0,
                 flip_ratio_bev_vertical: float = 0.0,
                 sync_2d: bool = True, update_img2lidar: bool = False,
                 **kwargs):
        self.flip_ratio_bev_horizontal = flip_ratio_bev_horizontal
        self.flip_ratio_bev_vertical = flip_ratio_bev_vertical
        self.update_img2lidar = update_img2lidar

    def __call__(self, results):
        flip_h = np.random.rand() < self.flip_ratio_bev_horizontal
        flip_v = np.random.rand() < self.flip_ratio_bev_vertical
        results["pcd_horizontal_flip"] = flip_h
        results["pcd_vertical_flip"] = flip_v
        if flip_h:
            results["gt_bboxes_3d"].flip(
                "horizontal", results["points"].tensor)
        if flip_v:
            results["gt_bboxes_3d"].flip(
                "vertical", results["points"].tensor)
        if self.update_img2lidar and "img_inputs" in results:
            aug = np.eye(4, dtype=np.float32)
            if flip_h:
                aug[1, 1] = -1
            if flip_v:
                aug[0, 0] = -1
            _apply_aug_to_img_inputs(results, aug)
        return results


@PIPELINES.register_module()
class GlobalRotScaleTrans:
    """Global rotation / scaling / translation of the whole scene."""

    def __init__(self, rot_range=(-0.78539816, 0.78539816),
                 scale_ratio_range=(0.95, 1.05),
                 translation_std=(0, 0, 0), shift_height: bool = False,
                 update_img2lidar: bool = False):
        self.rot_range = rot_range
        self.scale_ratio_range = scale_ratio_range
        self.translation_std = translation_std
        self.update_img2lidar = update_img2lidar

    def __call__(self, results):
        boxes = results["gt_bboxes_3d"]
        points = results["points"]

        angle = np.random.uniform(*self.rot_range)
        if len(boxes) > 0:
            pts_out, rot_mat_T = boxes.rotate(angle, points.tensor)
            results["pcd_rotation"] = rot_mat_T
        else:
            rot_mat_T = points.rotate(angle)
            results["pcd_rotation"] = rot_mat_T

        scale = np.random.uniform(*self.scale_ratio_range)
        results["pcd_scale_factor"] = scale
        points.scale(scale)
        boxes.scale(scale)

        trans = np.random.normal(
            scale=np.asarray(self.translation_std)).astype(np.float32) \
            if np.any(np.asarray(self.translation_std) > 0) else \
            np.zeros(3, np.float32)
        points.translate(trans)
        boxes.translate(trans)
        results["pcd_trans"] = trans

        if self.update_img2lidar and "img_inputs" in results:
            aug = np.zeros((4, 4), np.float32)
            aug[:3, :3] = results["pcd_rotation"].T * scale
            aug[:3, 3] = trans
            aug[3, 3] = 1.0
            _apply_aug_to_img_inputs(results, aug)
        return results


@PIPELINES.register_module()
class PointsRangeFilter:

    def __init__(self, point_cloud_range):
        self.pcr = np.asarray(point_cloud_range, np.float32)

    def __call__(self, results):
        points = results["points"]
        mask = points.in_range_3d(self.pcr)
        results["points"] = points[mask]
        return results


@PIPELINES.register_module()
class SortPointsByPillar:
    """Host-side stable sort of the cloud by flat pillar/voxel key.

    TPU-system optimization with no reference counterpart (the CUDA
    voxelizer hashes with atomics on device): sorting here lets the
    on-device fused pillar path (``ops.voxelize.sorted_voxel_info``
    with ``presorted=True``) skip its XLA sort + sorted-row gather —
    ~22 ms/step at 4 x 300k points, off the chip's critical path and
    onto the (parallel, prefetched) loader workers for ~5 ms of numpy.

    The key math mirrors ``ops.voxelize.compute_voxel_coords`` in
    float32 exactly: coord = floor((p - lo) / vs), key =
    (z*gy + y)*gx + x, out-of-range rows pushed last.  Place AFTER
    every point-mutating transform (aug, range filter), right before
    the format bundle; ``apis.train`` matches (voxel_size,
    point_cloud_range) against the teacher's pts_voxel_layer before
    enabling the device fast path.
    """

    def __init__(self, voxel_size, point_cloud_range):
        self.voxel_size = list(voxel_size)
        self.point_cloud_range = list(point_cloud_range)
        self._vs = np.asarray(voxel_size, np.float32)
        self._lo = np.asarray(point_cloud_range[:3], np.float32)
        hi = np.asarray(point_cloud_range[3:], np.float32)
        self._grid = np.floor(
            (hi - self._lo) / self._vs + 0.5).astype(np.int64)

    def __call__(self, results):
        pts = results["points"].tensor
        c = np.floor(
            (pts[:, :3].astype(np.float32) - self._lo) / self._vs
        ).astype(np.int64)
        gx, gy, gz = self._grid
        valid = ((c[:, 0] >= 0) & (c[:, 0] < gx) &
                 (c[:, 1] >= 0) & (c[:, 1] < gy) &
                 (c[:, 2] >= 0) & (c[:, 2] < gz))
        key = (c[:, 2] * gy + c[:, 1]) * gx + c[:, 0]
        key = np.where(valid, key, np.iinfo(np.int64).max)
        order = np.argsort(key, kind="stable")
        results["points"].tensor = pts[order]
        results["points_presorted"] = dict(
            voxel_size=self.voxel_size,
            point_cloud_range=self.point_cloud_range)
        return results


@PIPELINES.register_module()
class ObjectRangeFilter:

    def __init__(self, point_cloud_range):
        self.bev_range = np.asarray(point_cloud_range, np.float32)[
            [0, 1, 3, 4]]

    def __call__(self, results):
        boxes = results["gt_bboxes_3d"]
        mask = boxes.in_range_bev(self.bev_range)
        results["gt_bboxes_3d"] = boxes[mask]
        results["gt_labels_3d"] = np.asarray(
            results["gt_labels_3d"])[mask]
        results["gt_bboxes_3d"].limit_yaw(offset=0.5, period=2 * np.pi)
        return results


@PIPELINES.register_module()
class ObjectNameFilter:

    def __init__(self, classes):
        self.classes = list(classes)

    def __call__(self, results):
        labels = np.asarray(results["gt_labels_3d"])
        mask = (labels >= 0) & (labels < len(self.classes))
        results["gt_bboxes_3d"] = results["gt_bboxes_3d"][mask]
        results["gt_labels_3d"] = labels[mask]
        return results


@PIPELINES.register_module()
class PointShuffle:

    def __call__(self, results):
        results["points"].shuffle()
        return results


@PIPELINES.register_module()
class DataBaseSampler:
    """GT-database copy-paste sampler (reference dbsampler.py:81-230).

    Samples extra GT boxes + their points from a pre-built database so
    every class reaches its ``sample_groups`` count, rejecting samples
    whose BEV boxes collide with existing ones.
    """

    def __init__(self, info_path: str, data_root: str, rate: float,
                 prepare: Optional[dict] = None,
                 sample_groups: Optional[dict] = None,
                 classes: Optional[Sequence[str]] = None,
                 points_loader: Optional[dict] = None):
        self.data_root = data_root
        self.rate = rate
        self.classes = list(classes or [])
        self.sample_groups = dict(sample_groups or {})
        with open(info_path, "rb") as f:
            db = pickle.load(f)
        prepare = dict(prepare or {})
        if "filter_by_difficulty" in prepare:
            levels = set(prepare["filter_by_difficulty"])
            db = {k: [d for d in v if d.get("difficulty", 0)
                      not in levels] for k, v in db.items()}
        if "filter_by_min_points" in prepare:
            for name, min_pts in prepare["filter_by_min_points"].items():
                if name in db:
                    db[name] = [d for d in db[name]
                                if d["num_points_in_gt"] >= int(min_pts)]
        self.db = db

    def sample_all(self, gt_bboxes: np.ndarray, gt_names: np.ndarray):
        sampled, sampled_boxes = [], []
        existing = gt_bboxes.copy()
        for name, max_num in self.sample_groups.items():
            num = int(max_num) - int(np.sum(gt_names == name))
            num = int(num * self.rate)
            if num <= 0 or name not in self.db or not self.db[name]:
                continue
            cand_idx = np.random.choice(
                len(self.db[name]), min(num, len(self.db[name])),
                replace=False)
            for ci in cand_idx:
                info = self.db[name][ci]
                box = np.asarray(info["box3d_lidar"],
                                 np.float32).reshape(1, -1)
                if self._collides(box, existing, sampled_boxes):
                    continue
                sampled.append(info)
                sampled_boxes.append(box)
        if not sampled:
            return None
        boxes = np.concatenate(sampled_boxes, axis=0)
        names = np.array([s["name"] for s in sampled])
        points_list = []
        for s, b in zip(sampled, boxes):
            path = osp.join(self.data_root, s["path"])
            pts = np.fromfile(path, dtype=np.float32).reshape(
                -1, 5) if osp.exists(path) else np.zeros((0, 5),
                                                         np.float32)
            pts[:, :3] += b[:3]
            points_list.append(pts)
        return dict(gt_bboxes_3d=boxes, gt_names=names,
                    points=np.concatenate(points_list, axis=0)
                    if points_list else np.zeros((0, 5), np.float32))

    def _collides(self, box, existing, sampled_boxes) -> bool:
        all_boxes = [existing] + sampled_boxes
        others = np.concatenate([b for b in all_boxes if len(b)],
                                axis=0) if any(
            len(b) for b in all_boxes) else None
        if others is None or len(others) == 0:
            return False
        c1 = box_np_ops.center_to_corner_box2d(
            box[:, :2], box[:, 3:5], box[:, 6])
        c2 = box_np_ops.center_to_corner_box2d(
            others[:, :2], others[:, 3:5], others[:, 6])
        s1 = box_np_ops.corner_to_standup_nd(c1)[0]
        s2 = box_np_ops.corner_to_standup_nd(c2)
        ix = np.maximum(
            0, np.minimum(s1[2], s2[:, 2]) - np.maximum(s1[0], s2[:, 0]))
        iy = np.maximum(
            0, np.minimum(s1[3], s2[:, 3]) - np.maximum(s1[1], s2[:, 1]))
        return bool(np.any(ix * iy > 0))


@PIPELINES.register_module()
class ObjectSample:
    """Paste sampled DB objects into the scene (reference
    transforms_3d.py:284-380)."""

    def __init__(self, db_sampler: dict, sample_2d: bool = False):
        from ...registry import build_from_cfg
        cfg = dict(db_sampler)
        cfg.setdefault("type", "DataBaseSampler")
        self.db_sampler = build_from_cfg(cfg, PIPELINES)

    def __call__(self, results):
        gt_boxes = results["gt_bboxes_3d"]
        gt_labels = np.asarray(results["gt_labels_3d"])
        gt_names = np.asarray(results.get(
            "gt_names",
            [self.db_sampler.classes[l] if 0 <= l <
             len(self.db_sampler.classes) else "" for l in gt_labels]))
        sampled = self.db_sampler.sample_all(gt_boxes.tensor, gt_names)
        if sampled is None:
            return results
        s_boxes = sampled["gt_bboxes_3d"]
        if s_boxes.shape[-1] < gt_boxes.tensor.shape[-1]:
            pad = gt_boxes.tensor.shape[-1] - s_boxes.shape[-1]
            s_boxes = np.concatenate(
                [s_boxes, np.zeros((len(s_boxes), pad), np.float32)], -1)
        s_labels = np.array(
            [self.db_sampler.classes.index(n)
             for n in sampled["gt_names"]], np.int64)
        # remove original points inside sampled boxes
        points = results["points"]
        inside = box_np_ops.points_in_rbbox(points.tensor,
                                            s_boxes[:, :7])
        points = points[~inside.any(axis=-1)]
        s_points = sampled["points"]
        if s_points.shape[-1] != points.tensor.shape[-1]:
            d = points.tensor.shape[-1]
            if s_points.shape[-1] > d:
                s_points = s_points[:, :d]
            else:
                s_points = np.concatenate(
                    [s_points, np.zeros(
                        (len(s_points),
                         d - s_points.shape[-1]), np.float32)], -1)
        merged = np.concatenate([s_points, points.tensor], axis=0)
        results["points"] = LiDARPoints(merged,
                                        points_dim=merged.shape[-1])
        results["gt_bboxes_3d"] = LiDARInstance3DBoxes(
            np.concatenate([gt_boxes.tensor, s_boxes], axis=0),
            box_dim=gt_boxes.tensor.shape[-1])
        results["gt_labels_3d"] = np.concatenate([gt_labels, s_labels])
        return results


# -- BEVFormer image-space transforms ---------------------------------------


@PIPELINES.register_module()
class PhotoMetricDistortionMultiViewImage:
    """Random brightness/contrast/saturation/hue over each view
    (reference transforms_3d.py:1479-1578)."""

    def __init__(self, brightness_delta: int = 32,
                 contrast_range=(0.5, 1.5), saturation_range=(0.5, 1.5),
                 hue_delta: int = 18):
        self.brightness_delta = brightness_delta
        self.contrast_range = contrast_range
        self.saturation_range = saturation_range
        self.hue_delta = hue_delta

    def _one(self, img: np.ndarray) -> np.ndarray:
        import cv2
        img = img.astype(np.float32)
        if np.random.randint(2):
            img += np.random.uniform(-self.brightness_delta,
                                     self.brightness_delta)
        contrast_first = np.random.randint(2)
        if contrast_first and np.random.randint(2):
            img *= np.random.uniform(*self.contrast_range)
        hsv = cv2.cvtColor(np.clip(img, 0, 255).astype(np.uint8),
                           cv2.COLOR_RGB2HSV).astype(np.float32)
        if np.random.randint(2):
            hsv[..., 1] *= np.random.uniform(*self.saturation_range)
        if np.random.randint(2):
            hsv[..., 0] = (hsv[..., 0] + np.random.uniform(
                -self.hue_delta, self.hue_delta)) % 180
        img = cv2.cvtColor(
            np.clip(hsv, 0, 255).astype(np.uint8),
            cv2.COLOR_HSV2RGB).astype(np.float32)
        if not contrast_first and np.random.randint(2):
            img *= np.random.uniform(*self.contrast_range)
        return img

    def __call__(self, results):
        results["img"] = [self._one(i) for i in results["img"]]
        return results


@PIPELINES.register_module()
class NormalizeMultiviewImage:

    def __init__(self, mean, std, to_rgb: bool = True):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.to_rgb = to_rgb

    def __call__(self, results):
        imgs = []
        for img in results["img"]:
            img = np.asarray(img, np.float32)
            if self.to_rgb and img.shape[-1] == 3:
                img = img[..., ::-1]
            imgs.append((img - self.mean) / self.std)
        results["img"] = imgs
        results["img_norm_cfg"] = dict(mean=self.mean, std=self.std,
                                       to_rgb=self.to_rgb)
        return results


@PIPELINES.register_module()
class PadMultiViewImage:

    def __init__(self, size=None, size_divisor: Optional[int] = None,
                 pad_val: float = 0.0):
        self.size = size
        self.size_divisor = size_divisor
        self.pad_val = pad_val

    def __call__(self, results):
        padded = []
        for img in results["img"]:
            h, w = img.shape[:2]
            if self.size_divisor:
                th = int(np.ceil(h / self.size_divisor) *
                         self.size_divisor)
                tw = int(np.ceil(w / self.size_divisor) *
                         self.size_divisor)
            else:
                th, tw = self.size
            out = np.full((th, tw) + img.shape[2:], self.pad_val,
                          img.dtype)
            out[:h, :w] = img
            padded.append(out)
        results["img"] = padded
        results["pad_shape"] = [p.shape for p in padded]
        return results


@PIPELINES.register_module()
class LoadMultiViewImageFromFiles:
    """Plain multi-view loader for the BEVFormer path (reference
    loading.py upstream version): results['img_filename'] -> list of
    HWC float arrays + cam metas."""

    def __init__(self, to_float32: bool = False,
                 color_type: str = "unchanged"):
        self.to_float32 = to_float32

    def __call__(self, results):
        from PIL import Image
        imgs = []
        for name in results["img_filename"]:
            img = np.asarray(Image.open(name))
            imgs.append(img.astype(np.float32)
                        if self.to_float32 else img)
        results["img"] = imgs
        results["img_shape"] = [i.shape for i in imgs]
        results["ori_shape"] = [i.shape for i in imgs]
        return results
