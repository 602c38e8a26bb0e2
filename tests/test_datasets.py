"""Dataset + pipeline tests over a synthetic mini nuScenes on disk."""
import os
import os.path as osp
import pickle

import numpy as np
import pytest
from PIL import Image

from distillbev_tpu.datasets import (NuScenesDataset, build_dataset,
                                     build_dataloader, CBGSDataset)
from distillbev_tpu.datasets.nuscenes_dataset import PIPELINES
from distillbev_tpu.registry import build_from_cfg

CAMS = ["CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
        "CAM_BACK_LEFT", "CAM_BACK", "CAM_BACK_RIGHT"]


def make_mini_nuscenes(root, n_samples=4, img_hw=(90, 160)):
    """Write a synthetic info pkl + images + lidar bins."""
    rng = np.random.RandomState(0)
    os.makedirs(osp.join(root, "samples"), exist_ok=True)
    infos = []
    for i in range(n_samples):
        lidar_path = osp.join(root, "samples", f"lidar_{i}.bin")
        pts = rng.uniform(-30, 30, (2000, 5)).astype(np.float32)
        pts[:, 2] = rng.uniform(-3, 2, 2000)
        pts.tofile(lidar_path)
        cams = {}
        for ci, cam in enumerate(CAMS):
            img_path = osp.join(root, "samples", f"img_{i}_{cam}.jpg")
            Image.fromarray(
                rng.randint(0, 255, img_hw + (3,), dtype=np.uint8)
            ).save(img_path)
            yaw = 2 * np.pi * ci / 6
            s2l_rot = np.array(
                [[np.cos(yaw), 0, np.sin(yaw)],
                 [np.sin(yaw), 0, -np.cos(yaw)], [0, -1, 0]])
            cams[cam] = dict(
                data_path=img_path,
                cam_intrinsic=np.array([[100.0, 0, 80], [0, 100.0, 45],
                                        [0, 0, 1]]),
                sensor2lidar_rotation=s2l_rot,
                sensor2lidar_translation=np.array([0.0, 0.0, 1.5]),
                sensor2ego_rotation=[1, 0, 0, 0],
                sensor2ego_translation=[0, 0, 1.5],
                ego2global_rotation=[1, 0, 0, 0],
                ego2global_translation=[i * 2.0, 0, 0])
        n_box = 5
        boxes = np.zeros((n_box, 7))
        boxes[:, :2] = rng.uniform(-20, 20, (n_box, 2))
        boxes[:, 2] = rng.uniform(-1, 0, n_box)
        boxes[:, 3:6] = rng.uniform(1, 4, (n_box, 3))
        boxes[:, 6] = rng.uniform(-np.pi, np.pi, n_box)
        names = rng.choice(["car", "truck", "pedestrian"], n_box)
        info = dict(
            token=f"tok_{i}", lidar_path=lidar_path,
            timestamp=1e6 * i, sweeps=[], cams=cams,
            lidar2ego_rotation=[1, 0, 0, 0],
            lidar2ego_translation=[0, 0, 1.8],
            ego2global_rotation=[1, 0, 0, 0],
            ego2global_translation=[i * 2.0, 0, 0],
            gt_boxes=boxes, gt_names=names,
            gt_velocity=rng.uniform(-2, 2, (n_box, 2)),
            num_lidar_pts=np.full(n_box, 10),
            valid_flag=np.ones(n_box, bool),
            velo=np.zeros(2),
            prev=None, next=None)
        infos.append(info)
    # chain prev/next adjacency (single adjacent dict form)
    for i in range(n_samples):
        if i > 0:
            infos[i]["prev"] = dict(
                timestamp=infos[i - 1]["timestamp"],
                cams=infos[i - 1]["cams"],
                ego2global_rotation=[1, 0, 0, 0],
                ego2global_translation=[(i - 1) * 2.0, 0, 0])
        if i < n_samples - 1:
            infos[i]["next"] = dict(
                timestamp=infos[i + 1]["timestamp"],
                cams=infos[i + 1]["cams"],
                ego2global_rotation=[1, 0, 0, 0],
                ego2global_translation=[(i + 1) * 2.0, 0, 0])
    ann = osp.join(root, "infos.pkl")
    with open(ann, "wb") as f:
        pickle.dump(dict(infos=infos,
                         metadata=dict(version="v1.0-mini")), f)
    return ann


DATA_CONFIG = {
    "cams": CAMS, "Ncams": 6, "input_size": (64, 128),
    "src_size": (90, 160), "resize": (-0.06, 0.11), "rot": (-5.4, 5.4),
    "flip": True, "crop_h": (0.0, 0.0), "resize_test": 0.0,
}

PCR = [-40.0, -40.0, -5.0, 40.0, 40.0, 3.0]


def bevdepth_pipeline(is_train=True):
    return [
        dict(type="LoadMultiViewImageFromFiles_BEVDet",
             data_config=DATA_CONFIG, is_train=is_train, sequential=True,
             aligned=True, trans_only=False),
        dict(type="LoadPointsFromFile", load_dim=5, use_dim=[0, 1, 2, 3,
                                                             4]),
        dict(type="LoadAnnotations3D"),
        dict(type="PointToMultiViewDepth", downsample=16,
             grid_config={"dbound": [1.0, 60.0, 1.0]}),
        dict(type="GlobalRotScaleTrans", rot_range=[-0.4, 0.4],
             scale_ratio_range=[0.95, 1.05], update_img2lidar=True),
        dict(type="RandomFlip3D", flip_ratio_bev_horizontal=0.5,
             update_img2lidar=True),
        dict(type="PointsRangeFilter", point_cloud_range=PCR),
        dict(type="ObjectRangeFilter", point_cloud_range=PCR),
        dict(type="Collect3D",
             keys=["points", "gt_bboxes_3d", "img_inputs"],
             max_points=4096, max_objs=16),
    ]


@pytest.fixture(scope="module")
def mini_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mini_nusc"))
    ann = make_mini_nuscenes(root)
    return root, ann


class TestDataset:

    def test_sample_shapes(self, mini_root):
        root, ann = mini_root
        ds = NuScenesDataset(
            ann_file=ann, pipeline=bevdepth_pipeline(),
            img_info_prototype="bevdet_sequential",
            speed_mode="abs_dis", max_interval=9, min_interval=2)
        s = ds[1]
        imgs, rots, trans, intrins, post_rots, post_trans, depth = \
            s["img_inputs"]
        assert imgs.shape == (12, 64, 128, 3)
        assert rots.shape == (2, 6, 3, 3)
        assert trans.shape == (2, 6, 3)
        assert depth.shape == (6, 4, 8)
        assert s["points"].shape == (4096, 5)
        assert s["gt_boxes"].shape == (16, 9)
        assert s["gt_mask"].sum() > 0

    def test_projection_consistency(self, mini_root):
        """A lidar point projected with tracked post_rot/post_tran must
        land on the augmented image plane consistently: the full chain
        undo-aug -> unproject used by the view transformer must invert
        the aug -> project chain here."""
        root, ann = mini_root
        ds = NuScenesDataset(
            ann_file=ann, pipeline=bevdepth_pipeline(is_train=True),
            img_info_prototype="bevdet_sequential", speed_mode="abs_dis")
        s = ds[1]
        _, rots, trans, intrins, post_rots, post_trans, _ = \
            s["img_inputs"]
        # take cam 0 frame 0; pick a point in front of the camera
        r, t = rots[0, 0], trans[0, 0]
        k, pr, pt = intrins[0, 0], post_rots[0, 0], post_trans[0, 0]
        p_lidar = r @ np.array([0.0, 0.0, 10.0]) + t  # 10m along optical
        # project: lidar -> cam -> img -> aug
        p_cam = np.linalg.inv(r) @ (p_lidar - t)
        uv = (k @ p_cam)[:2] / p_cam[2]
        uvd = pr[:2, :2] @ uv + pt[:2]
        # invert with the view-transformer math: undo aug then unproject
        undo = np.linalg.inv(pr)[:2, :2] @ (uvd - pt[:2])
        assert np.allclose(undo, uv, atol=1e-3)

    def test_dataloader_batches(self, mini_root):
        root, ann = mini_root
        ds = NuScenesDataset(
            ann_file=ann, pipeline=bevdepth_pipeline(),
            img_info_prototype="bevdet_sequential", speed_mode="abs_dis")
        loader = build_dataloader(ds, samples_per_gpu=2,
                                  workers_per_gpu=1, seed=3)
        batches = list(loader)
        assert len(batches) == 2
        b = batches[0]
        assert b["points"].shape == (2, 4096, 5)
        assert b["img_inputs"][0].shape == (2, 12, 64, 128, 3)
        assert len(b["img_metas"]) == 2

    def test_epoch_shuffling_deterministic(self, mini_root):
        root, ann = mini_root
        ds = NuScenesDataset(ann_file=ann, pipeline=None,
                             img_info_prototype="bevdet")
        from distillbev_tpu.datasets import EpochSampler
        s = EpochSampler(10, shuffle=True, seed=1)
        a, b = s.indices(0), s.indices(0)
        assert (a == b).all()
        assert not (s.indices(0) == s.indices(1)).all()
        sh = EpochSampler(10, shuffle=False, num_shards=2, shard_index=1)
        assert len(sh.indices(0)) == 5

    def test_cbgs_wrapper(self, mini_root):
        root, ann = mini_root
        ds = NuScenesDataset(ann_file=ann, pipeline=None,
                             img_info_prototype="bevdet")
        cbgs = CBGSDataset(ds)
        assert len(cbgs) > 0
        _ = cbgs[0]

    def test_velocity_speed_mode(self, mini_root):
        """dis mode multiplies velocity targets by the frame gap."""
        root, ann = mini_root
        ds_time = NuScenesDataset(
            ann_file=ann, pipeline=None,
            img_info_prototype="bevdet_sequential",
            speed_mode="rel_time", prev_only=True, fix_direction=True)
        ds_dis = NuScenesDataset(
            ann_file=ann, pipeline=None,
            img_info_prototype="bevdet_sequential",
            speed_mode="rel_dis", prev_only=True, fix_direction=True)
        np.random.seed(0)
        d_time = ds_time.get_data_info(2)
        np.random.seed(0)
        d_dis = ds_dis.get_data_info(2)
        v_time = d_time["ann_info"]["gt_bboxes_3d"].tensor[:, 7:9]
        v_dis = d_dis["ann_info"]["gt_bboxes_3d"].tensor[:, 7:9]
        # frame gap is 1s in the synthetic data
        assert np.allclose(v_dis, v_time * 1.0, atol=1e-5)

    def test_format_results_and_eval_selfconsistent(self, mini_root):
        """Feeding GT back as predictions yields ~perfect mAP/NDS."""
        root, ann = mini_root
        ds = NuScenesDataset(ann_file=ann, pipeline=None,
                             img_info_prototype="bevdet")
        results = {}
        for info in ds.data_infos:
            boxes = np.asarray(info["gt_boxes"], np.float32)
            vels = np.asarray(info["gt_velocity"], np.float32)
            n = len(boxes)
            full = np.concatenate(
                [boxes[:, :2], (boxes[:, 2] - boxes[:, 5] / 2)[:, None],
                 boxes[:, 3:7], vels], -1)
            labels = np.array([ds.CLASSES.index(n_) for n_ in
                               info["gt_names"]], np.int32)
            results[info["token"]] = (
                full, np.ones(n, np.float32) * 0.9, labels,
                np.ones(n, bool))
        metrics = ds.evaluate(results)
        # devkit semantics: every configured class scores, so classes
        # absent from the mini GT contribute AP=0 / TP-err=1.0 and
        # perfect predictions give mAP = n_present / n_classes
        present = {n_ for info in ds.data_infos
                   for n_ in info["gt_names"] if n_ in ds.CLASSES}
        for cls in present:
            assert metrics[f"pts_bbox_NuScenes/{cls}_AP"] > 0.99, cls
        assert metrics["pts_bbox_NuScenes/mAP"] == pytest.approx(
            len(present) / len(ds.CLASSES), abs=0.01)
        absent = len(ds.CLASSES) - len(present)
        assert metrics["pts_bbox_NuScenes/mTRANS_ERR"] == pytest.approx(
            absent / len(ds.CLASSES), abs=0.05)


class _RandDrawDataset:
    """Each sample records the worker's np.random draw — a stand-in for
    an augmentation transform (regression for the round-1 advisor
    finding: forked workers inheriting one identical RNG state)."""

    def __len__(self):
        return 16

    def __getitem__(self, i):
        return {"idx": np.array([i], np.int64),
                "draw": np.random.uniform(size=(1, 4)).astype(
                    np.float32),
                "img_metas": {"sample_idx": i}}


class TestLoaderWorkerRNG:
    def _epoch_draws(self, loader, epoch):
        loader.set_epoch(epoch)
        batches = list(loader)
        order = np.concatenate([b["idx"][:, 0] for b in batches])
        assert (order == np.arange(16)).all()
        return np.concatenate([b["draw"] for b in batches])

    def test_process_workers_diverse_and_reproducible(self):
        from distillbev_tpu.datasets.builder import DataLoader
        loader = DataLoader(_RandDrawDataset(), batch_size=2,
                            shuffle=False, num_workers=2, seed=7,
                            use_processes=True)
        d0 = self._epoch_draws(loader, 0)
        d1 = self._epoch_draws(loader, 1)
        assert not np.allclose(d0, d1)          # epochs differ
        uniq = {tuple(r) for r in np.round(d0, 6).reshape(16, 4)}
        assert len(uniq) == 16                  # workers differ
        again = self._epoch_draws(loader, 0)    # (seed, epoch) determin.
        assert np.allclose(d0, again)
