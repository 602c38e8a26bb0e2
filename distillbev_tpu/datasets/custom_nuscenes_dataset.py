"""BEVFormer queue dataset.

Capability parity with the reference's ``CustomNuScenesDataset``
(reference: mmdet3d/datasets/custom_nuscenes_dataset.py:18-268 — random
contiguous queue of ``queue_length`` frames ending at the sample,
``union2one`` stacking images and converting can-bus to per-frame deltas
with ``prev_bev_exists`` scene-boundary flags; the hard-coded path
rewrites :48-55 are dropped).

Output protocol matches our BEVFormer detector: imgs [T, N, H, W, 3],
can_bus [T, 18], lidar2img [T, N, 4, 4], prev_bev_exists [T].
"""
from __future__ import annotations

import copy
from typing import Optional

import numpy as np

from .nuscenes_dataset import DATASETS, NuScenesDataset
from ..utils.geometry import quat_to_rotmat, yaw_from_quat


@DATASETS.register_module()
class CustomNuScenesDataset(NuScenesDataset):

    def __init__(self, *args, queue_length: int = 4, bev_size=(200, 200),
                 overlap_test: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        self.queue_length = queue_length
        self.bev_size = bev_size
        self.overlap_test = overlap_test

    def get_data_info(self, index: int) -> dict:
        input_dict = super().get_data_info(index)
        info = self.data_infos[index]
        # can_bus 18-dim: pos(3) quat(4) accel(3) rot_rate(3) vel(3)
        # patch_angle(2) (reference nuscenes devkit convention)
        can_bus = np.array(info.get("can_bus",
                                    np.zeros(18)), np.float64).copy()
        rotation = info["ego2global_rotation"]
        translation = info["ego2global_translation"]
        can_bus[:3] = translation
        can_bus[3:7] = rotation
        patch_angle = yaw_from_quat(rotation) / np.pi * 180
        if patch_angle < 0:
            patch_angle += 360
        can_bus[-2] = patch_angle / 180 * np.pi
        can_bus[-1] = patch_angle
        input_dict["can_bus"] = can_bus
        input_dict["scene_token"] = info.get("scene_token",
                                             info["token"][:8])
        return input_dict

    def prepare_train_data(self, index: int):
        queue = []
        index_list = list(range(index - self.queue_length, index))
        np.random.shuffle(index_list)
        index_list = sorted(index_list[1:])
        index_list.append(index)
        for i in index_list:
            i = max(0, i)
            input_dict = self.get_data_info(i)
            if input_dict is None:
                return None
            example = self.pipeline(input_dict) if self.pipeline else \
                input_dict
            if example is None:
                return None
            if self.filter_empty_gt and \
                    len(np.atleast_1d(example.get("gt_labels",
                                                  [0]))) == 0:
                return None
            queue.append(example)
        return self.union2one(queue)

    def union2one(self, queue):
        """Stack the queue; can-bus becomes per-frame deltas
        (reference :88-113)."""
        prev_scene, prev_pos, prev_angle = None, None, None
        can_bus_list, exists_list = [], []
        for each in queue:
            meta = each["img_metas"] if "img_metas" in each else each
            can_bus = np.array(meta["can_bus"], np.float64).copy()
            scene = meta.get("scene_token")
            if scene != prev_scene:
                exists_list.append(0.0)
                prev_scene = scene
                prev_pos = can_bus[:3].copy()
                prev_angle = can_bus[-1]
                can_bus[:3] = 0
                can_bus[-1] = 0
            else:
                exists_list.append(1.0)
                tmp_pos = can_bus[:3].copy()
                tmp_angle = can_bus[-1]
                can_bus[:3] -= prev_pos
                can_bus[-1] -= prev_angle
                prev_pos, prev_angle = tmp_pos, tmp_angle
            can_bus_list.append(can_bus.astype(np.float32))

        out = dict(queue[-1])
        out["img"] = np.stack([np.asarray(e["img"], np.float32)
                               for e in queue])        # [T, N, H, W, 3]
        out["can_bus"] = np.stack(can_bus_list)
        out["prev_bev_exists"] = np.asarray(exists_list, np.float32)
        l2i = []
        for e in queue:
            meta = e["img_metas"] if "img_metas" in e else e
            l2i.append(np.stack(meta["lidar2img"]).astype(np.float32))
        out["lidar2img"] = np.stack(l2i)               # [T, N, 4, 4]
        return out


@DATASETS.register_module(name="NuScenesDataset_eval_modified")
class NuScenesDatasetEvalModified(CustomNuScenesDataset):
    """Config-compat alias for the reference's plugin dataset
    (referenced by configs/_base_/datasets/custom_nus-3d.py; the class
    itself lives in the external BEVFormer plugin and only adjusts the
    eval wrapper — our self-contained evaluator already covers it)."""
