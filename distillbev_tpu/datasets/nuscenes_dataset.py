"""nuScenes dataset (info-pkl based).

Capability parity with the reference datasets
(reference: mmdet3d/datasets/nuscenes_dataset.py — info loading:120-180,
``img_info_prototype`` in {mmcv, bevdet, bevdet_sequential}, adjacent
frame selection:305-400, ``speed_mode`` velocity target rescaling
:407-430, evaluate/format_results:711-870; custom_3d.py base class).

Design notes: the dataset produces plain numpy sample dicts; the
``Collect3D``-style formatting step (pipelines/formating.py) pads them to
the static shapes the jitted train step consumes — the TPU counterpart of
the reference's DataContainer collation.
"""
from __future__ import annotations

import os.path as osp
import pickle
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from ..core.bbox.structures import LiDARInstance3DBoxes, get_box_type
from ..registry import Registry

DATASETS = Registry("datasets")
PIPELINES = Registry("pipelines")


def compose_pipeline(cfgs: Sequence[dict]):
    from ..registry import build_from_cfg
    transforms = [build_from_cfg(dict(c), PIPELINES) for c in cfgs]

    def run(results):
        for t in transforms:
            results = t(results)
            if results is None:
                return None
        return results

    run.transforms = transforms
    return run


@DATASETS.register_module()
class NuScenesDataset:
    """10-class nuScenes 3D detection dataset."""

    CLASSES = ("car", "truck", "trailer", "bus", "construction_vehicle",
               "bicycle", "motorcycle", "pedestrian", "traffic_cone",
               "barrier")

    DefaultAttribute = {
        "car": "vehicle.parked", "pedestrian": "pedestrian.moving",
        "trailer": "vehicle.parked", "truck": "vehicle.parked",
        "bus": "vehicle.moving", "motorcycle": "cycle.without_rider",
        "construction_vehicle": "vehicle.parked",
        "bicycle": "cycle.without_rider", "barrier": "",
        "traffic_cone": "",
    }

    def __init__(self,
                 ann_file: str,
                 pipeline: Optional[Sequence[dict]] = None,
                 data_root: Optional[str] = None,
                 classes: Optional[Sequence[str]] = None,
                 load_interval: int = 1,
                 with_velocity: bool = True,
                 modality: Optional[dict] = None,
                 box_type_3d: str = "LiDAR",
                 filter_empty_gt: bool = True,
                 test_mode: bool = False,
                 eval_version: str = "detection_cvpr_2019",
                 use_valid_flag: bool = False,
                 img_info_prototype: str = "mmcv",
                 speed_mode: str = "abs_dis",
                 max_interval: int = 3,
                 min_interval: int = 0,
                 prev_only: bool = False,
                 next_only: bool = False,
                 test_adj: str = "prev",
                 fix_direction: bool = False,
                 test_adj_ids: Optional[Sequence[int]] = None):
        self.ann_file = ann_file
        self.data_root = data_root
        self.CLASSES = tuple(classes) if classes else type(self).CLASSES
        self.load_interval = load_interval
        self.with_velocity = with_velocity
        self.modality = modality or dict(
            use_camera=False, use_lidar=True, use_radar=False,
            use_map=False, use_external=False)
        self.box_type_3d, self.box_mode_3d = get_box_type(box_type_3d)
        self.filter_empty_gt = filter_empty_gt
        self.test_mode = test_mode
        self.eval_version = eval_version
        self.use_valid_flag = use_valid_flag
        self.img_info_prototype = img_info_prototype
        self.speed_mode = speed_mode
        self.max_interval = max_interval
        self.min_interval = min_interval
        self.prev_only = prev_only
        self.next_only = next_only
        self.test_adj = test_adj
        self.fix_direction = fix_direction
        self.test_adj_ids = test_adj_ids
        self.camera_interval = 0.5   # reference default keyframe gap (s)

        self.data_infos = self.load_annotations(ann_file)
        self.pipeline = compose_pipeline(pipeline) if pipeline else None
        if not self.test_mode:
            self._set_group_flag()

    # -- infos -----------------------------------------------------------
    def load_annotations(self, ann_file: str) -> List[dict]:
        with open(ann_file, "rb") as f:
            data = pickle.load(f)
        infos = list(
            sorted(data["infos"], key=lambda e: e["timestamp"]))
        infos = infos[::self.load_interval]
        self.metadata = data.get("metadata", {})
        self.version = self.metadata.get("version", "v1.0-trainval")
        return infos

    def __len__(self) -> int:
        return len(self.data_infos)

    def _set_group_flag(self):
        self.flag = np.zeros(len(self), dtype=np.uint8)

    def get_cat_ids(self, idx: int) -> List[int]:
        """Category ids present in a sample (CBGS resampling hook,
        reference nuscenes_dataset.py:160-180)."""
        info = self.data_infos[idx]
        if self.use_valid_flag:
            mask = info["valid_flag"]
            gt_names = set(np.asarray(info["gt_names"])[mask])
        else:
            gt_names = set(info["gt_names"])
        return [self.CLASSES.index(n) for n in gt_names
                if n in self.CLASSES]

    # -- per-sample assembly ---------------------------------------------
    def get_ann_info(self, index: int) -> dict:
        info = self.data_infos[index]
        if self.use_valid_flag:
            mask = np.asarray(info["valid_flag"], bool)
        else:
            mask = np.asarray(info["num_lidar_pts"]) > 0
        gt_bboxes_3d = np.asarray(info["gt_boxes"],
                                  np.float32).reshape(-1, 7)[mask]
        gt_names_3d = np.asarray(info["gt_names"])[mask]
        gt_labels_3d = np.array(
            [self.CLASSES.index(n) if n in self.CLASSES else -1
             for n in gt_names_3d], np.int64)
        if self.with_velocity:
            vel = np.asarray(info["gt_velocity"],
                             np.float32).reshape(-1, 2)[mask]
            vel = np.nan_to_num(vel)
            gt_bboxes_3d = np.concatenate([gt_bboxes_3d, vel], axis=-1)
        boxes = LiDARInstance3DBoxes(
            gt_bboxes_3d, box_dim=gt_bboxes_3d.shape[-1],
            origin=(0.5, 0.5, 0.5))
        return dict(gt_bboxes_3d=boxes, gt_labels_3d=gt_labels_3d,
                    gt_names=gt_names_3d)

    def get_data_info(self, index: int) -> dict:
        info = self.data_infos[index]
        input_dict = dict(
            sample_idx=info["token"],
            pts_filename=info["lidar_path"],
            sweeps=info.get("sweeps", []),
            timestamp=info["timestamp"] / 1e6,
            box_type_3d=self.box_type_3d,
        )
        proto = self.img_info_prototype
        if proto == "mmcv" and self.modality.get("use_camera"):
            image_paths, lidar2img_rts = [], []
            for _, cam_info in info["cams"].items():
                l2c_r = np.linalg.inv(cam_info["sensor2lidar_rotation"])
                l2c_t = cam_info["sensor2lidar_translation"] @ l2c_r.T
                rt = np.eye(4)
                rt[:3, :3] = l2c_r.T
                rt[3, :3] = -l2c_t
                viewpad = np.eye(4)
                intr = cam_info["cam_intrinsic"]
                viewpad[:intr.shape[0], :intr.shape[1]] = intr
                lidar2img_rts.append(viewpad @ rt.T)
                image_paths.append(cam_info["data_path"])
            input_dict.update(dict(img_filename=image_paths,
                                   lidar2img=lidar2img_rts))
        elif proto == "bevdet":
            input_dict["img_info"] = info["cams"]
        elif proto == "bevdet_sequential":
            adjacent, info_adj = self._select_adjacent(info)
            input_dict.update(dict(img_info=info["cams"], curr=info,
                                   adjacent=info_adj,
                                   adjacent_type=adjacent))
        if not self.test_mode or "gt_boxes" in info:
            input_dict["ann_info"] = self.get_ann_info(index)
        if not self.test_mode and proto == "bevdet_sequential":
            self._rescale_velocity(input_dict, info)
        return input_dict

    def _select_adjacent(self, info):
        """Adjacent keyframe pick with min/max interval
        (reference nuscenes_dataset.py:305-400)."""
        if (info.get("prev") is None and self.prev_only) or \
                (info.get("next") is None and self.next_only):
            adjacent = "curr"
            info = dict(info)
            info["curr"] = dict(timestamp=info["timestamp"],
                                cams=info["cams"])
            return adjacent, info["curr"]
        if info.get("prev") is None:
            adjacent = "next"
        elif info.get("next") is None:
            adjacent = "prev"
        elif self.prev_only or self.next_only:
            adjacent = "prev" if self.prev_only else "next"
        elif self.test_mode:
            adjacent = self.test_adj
        else:
            adjacent = np.random.choice(["prev", "next"])
        cand = info[adjacent]
        if isinstance(cand, list):
            if self.test_mode:
                if self.test_adj_ids is not None:
                    return adjacent, [
                        cand[min(i, len(cand) - 1)]
                        for i in self.test_adj_ids]
                sid = min((self.max_interval + self.min_interval) // 2,
                          len(cand) - 1)
                return adjacent, cand[sid]
            if len(cand) <= self.min_interval:
                sid = len(cand) - 1
            else:
                lo = min(self.min_interval, len(cand))
                hi = min(self.max_interval, len(cand))
                sid = int(np.random.choice(range(lo, max(hi, lo + 1))))
            return adjacent, cand[sid]
        return adjacent, cand

    def _rescale_velocity(self, input_dict, info):
        """speed_mode abs/rel x dis/time velocity target rescale
        (reference nuscenes_dataset.py:407-430)."""
        ann = input_dict.get("ann_info")
        if ann is None:
            return
        bbox = ann["gt_bboxes_3d"].tensor
        if bbox.shape[-1] < 9:
            return
        if "abs" in self.speed_mode and "velo" in info:
            bbox[:, 7:9] += np.asarray(info["velo"],
                                       np.float32).reshape(1, 2)
        if input_dict["adjacent_type"] == "next" and not \
                self.fix_direction:
            bbox[:, 7:9] = -bbox[:, 7:9]
        if "dis" in self.speed_mode:
            adj = input_dict["adjacent"]
            adj_ts = (adj[0] if isinstance(adj, list) else
                      adj)["timestamp"] / 1e6
            time = abs(input_dict["timestamp"] - adj_ts)
            if input_dict["adjacent_type"] == "curr" or time == 0:
                time = self.camera_interval
            bbox[:, 7:9] *= time
        ann["gt_bboxes_3d"] = LiDARInstance3DBoxes(
            bbox, box_dim=bbox.shape[-1])

    # -- iteration -------------------------------------------------------
    def prepare_train_data(self, index: int):
        input_dict = self.get_data_info(index)
        if input_dict is None:
            return None
        results = self.pipeline(input_dict) if self.pipeline else \
            input_dict
        if results is None:
            return None
        if self.filter_empty_gt and "gt_labels_3d" in results and \
                len(np.atleast_1d(results["gt_labels_3d"])) == 0:
            return None
        return results

    def prepare_test_data(self, index: int):
        input_dict = self.get_data_info(index)
        return self.pipeline(input_dict) if self.pipeline else input_dict

    def __getitem__(self, idx: int):
        if self.test_mode:
            return self.prepare_test_data(idx)
        while True:
            data = self.prepare_train_data(idx)
            if data is not None:
                return data
            idx = np.random.randint(len(self))

    # -- output formatting / evaluation ---------------------------------
    def output_to_nusc_annos(self, det, token: str) -> List[dict]:
        """One sample's DecodedBoxes -> nuScenes result dicts
        (reference output_to_nusc_box:812-870 + lidar_nusc_box_to_global).
        ``det`` has numpy boxes [K, 9], scores, labels, valid.
        """
        from ..utils.geometry import quat_to_rotmat, rotmat_to_quat
        info = {i["token"]: i for i in self.data_infos}[token]
        l2e = np.eye(4)
        l2e[:3, :3] = quat_to_rotmat(info["lidar2ego_rotation"])
        l2e[:3, 3] = info["lidar2ego_translation"]
        e2g = np.eye(4)
        e2g[:3, :3] = quat_to_rotmat(info["ego2global_rotation"])
        e2g[:3, 3] = info["ego2global_translation"]
        tm = e2g @ l2e
        annos = []
        boxes, scores, labels, valid = det
        for k in range(len(scores)):
            if not valid[k]:
                continue
            b = boxes[k]
            center = tm[:3, :3] @ np.array(
                [b[0], b[1], b[2] + b[5] / 2]) + tm[:3, 3]
            yaw = float(b[6])
            # box frame -> global: compose heading with transform yaw
            c, s = np.cos(yaw), np.sin(yaw)
            rot = tm[:3, :3] @ np.array(
                [[c, -s, 0], [s, c, 0], [0, 0, 1]])
            vel = tm[:3, :3] @ np.array([b[7], b[8], 0.0])
            name = self.CLASSES[int(labels[k])]
            attr = self.DefaultAttribute.get(name, "")
            if np.linalg.norm(vel[:2]) > 0.2:
                if name in ("car", "construction_vehicle", "bus",
                            "truck", "trailer"):
                    attr = "vehicle.moving"
                elif name in ("bicycle", "motorcycle"):
                    attr = "cycle.with_rider"
            annos.append(dict(
                sample_token=token,
                translation=center.tolist(),
                size=[float(b[4]), float(b[3]), float(b[5])],  # wlh
                rotation=rotmat_to_quat(rot).tolist(),
                velocity=vel[:2].tolist(),
                detection_name=name,
                detection_score=float(scores[k]),
                attribute_name=attr))
        return annos

    def format_results(self, results: Dict[str, Any],
                       jsonfile_prefix: Optional[str] = None):
        """results: {token: DecodedBoxes-like tuple} -> nusc submission
        dict (+ optional json dump)."""
        import json
        nusc_annos = {}
        for token, det in results.items():
            nusc_annos[token] = self.output_to_nusc_annos(det, token)
        submission = dict(
            meta=dict(use_camera=self.modality.get("use_camera", False),
                      use_lidar=self.modality.get("use_lidar", True),
                      use_radar=False, use_map=False, use_external=False),
            results=nusc_annos)
        if jsonfile_prefix:
            import os
            os.makedirs(osp.dirname(jsonfile_prefix) or ".",
                        exist_ok=True)
            path = f"{jsonfile_prefix}_nusc.json"
            with open(path, "w") as f:
                json.dump(submission, f)
            return submission, path
        return submission, None

    def evaluate(self, results: Dict[str, Any],
                 jsonfile_prefix: Optional[str] = None,
                 **kwargs) -> Dict[str, float]:
        """nuScenes detection metrics.  Uses the official devkit when
        importable, else the self-contained evaluator
        (core/evaluation/nuscenes_metrics.py)."""
        submission, _ = self.format_results(results, jsonfile_prefix)
        from ..core.evaluation.nuscenes_metrics import evaluate_nuscenes
        gt = self._gt_for_eval()
        # devkit filter_eval_boxes: per-class range filtering around
        # the ego position of each sample
        ego_xy = {info["token"]: list(
            info["ego2global_translation"][:2])
            for info in self.data_infos}
        return evaluate_nuscenes(submission["results"], gt,
                                 class_names=list(self.CLASSES),
                                 ego_xy_by_token=ego_xy)

    def _gt_for_eval(self):
        """Ground truth in global frame keyed by token."""
        from ..utils.geometry import quat_to_rotmat
        gt = {}
        for info in self.data_infos:
            l2e = np.eye(4)
            l2e[:3, :3] = quat_to_rotmat(info["lidar2ego_rotation"])
            l2e[:3, 3] = info["lidar2ego_translation"]
            e2g = np.eye(4)
            e2g[:3, :3] = quat_to_rotmat(info["ego2global_rotation"])
            e2g[:3, 3] = info["ego2global_translation"]
            tm = e2g @ l2e
            boxes = np.asarray(info["gt_boxes"], np.float64).reshape(-1, 7)
            names = list(info["gt_names"])
            vels = np.asarray(info.get(
                "gt_velocity", np.zeros((len(names), 2)))).reshape(-1, 2)
            # per-box attribute names when the pkls carry them
            # (tools/data_converter/nuscenes_converter.py gt_attrs);
            # None -> evaluator flags aae_unavailable
            attrs = info.get("gt_attrs")
            entries = []
            for i, (b, n, v) in enumerate(
                    zip(boxes, names, np.nan_to_num(vels))):
                if n not in self.CLASSES:
                    continue
                # info-pkl gt_boxes store gravity-center z already
                # (get_ann_info uses origin=(0.5, 0.5, 0.5))
                center = tm[:3, :3] @ b[:3] + tm[:3, 3]
                c, s = np.cos(b[6]), np.sin(b[6])
                rot = tm[:3, :3] @ np.array(
                    [[c, -s, 0], [s, c, 0], [0, 0, 1]])
                yaw = float(np.arctan2(rot[1, 0], rot[0, 0]))
                gvel = tm[:3, :3] @ np.array([v[0], v[1], 0.0])
                entry = dict(
                    translation=center.tolist(),
                    size=[float(b[4]), float(b[3]), float(b[5])],
                    yaw=yaw, velocity=gvel[:2].tolist(),
                    detection_name=n)
                if attrs is not None:
                    entry["attribute_name"] = str(attrs[i])
                entries.append(entry)
            gt[info["token"]] = entries
        return gt
