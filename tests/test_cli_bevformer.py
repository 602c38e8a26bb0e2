"""BEVFormer family through the config-driven CLIs (round-2 VERDICT #2):
tools/train.py trains lidarformer->bevformer distillation on synthetic
mini data, and tools/test.py evaluates it with the scene-token
``prev_frame_info`` state machine (reference tools/train.py:234-242
custom_train dispatch; bevformer.py:233-266 test-time state)."""
import os.path as osp
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from test_datasets import make_mini_nuscenes
from test_model_bevformer import tiny_lidarformer_cfg, PCR

REPO = osp.abspath(osp.join(osp.dirname(__file__), ".."))
BASE_CFG = osp.join(
    REPO, "configs/lidar2camera_bev_distillation/teacher_to_bevformer",
    "lidarformer_to_bevformer_nus_1x1conv_r50.py")


def _add_scene_tokens(ann):
    """Two scenes of two frames each — exercises the eval-time scene
    reset."""
    with open(ann, "rb") as f:
        data = pickle.load(f)
    for i, info in enumerate(data["infos"]):
        info["scene_token"] = "scene_a" if i < 2 else "scene_b"
    with open(ann, "wb") as f:
        pickle.dump(data, f)


def _write_tiny_cfg(tmp_path, ann):
    teacher_path = str(tmp_path / "teacher_tiny.py")
    with open(teacher_path, "w") as f:
        f.write("model = " + repr(tiny_lidarformer_cfg()) + "\n")
    cfg_path = str(tmp_path / "tiny_bevformer_distill.py")
    with open(cfg_path, "w") as f:
        f.write(f'''
_base_ = ["{BASE_CFG}"]
point_cloud_range = {PCR}
model = dict(
    teacher_config="{teacher_path}",
    distill_params=dict(student_channels=[32], teacher_channels=[32],
                        teacher_adaptation_type="identity",
                        teacher_adaptation_params=dict(kernel_size=1,
                                                       stride=1)),
    img_backbone=dict(depth=18, base_channels=8, out_indices=(2, 3),
                      with_cp=False),
    img_neck=dict(in_channels=[32, 64], out_channels=32, num_outs=2),
    pts_bbox_head=dict(
        bev_h=8, bev_w=8, num_query=12, embed_dims=32,
        pc_range=point_cloud_range, real_h=16.0, real_w=16.0,
        positional_encoding=dict(num_feats=16, row_num_embed=8,
                                 col_num_embed=8),
        transformer=dict(
            embed_dims=32, num_feature_levels=2,
            encoder=dict(num_layers=1, pc_range=point_cloud_range,
                         embed_dims=32, num_heads=4,
                         feedforward_channels=64, num_levels=2,
                         with_cp=False),
            decoder=dict(num_layers=1, embed_dims=32, num_heads=4,
                         feedforward_channels=64)),
        bbox_coder=dict(post_center_range=[-10, -10, -10, 10, 10, 10],
                        pc_range=point_cloud_range, max_num=10)),
    train_cfg=dict(pts=dict(
        grid_size=[8, 8, 1], voxel_size=[2.0, 2.0, 8],
        point_cloud_range=point_cloud_range, out_size_factor=1)),
)
train_pipeline = [
    dict(type="LoadMultiViewImageFromFiles", to_float32=True),
    dict(type="LoadPointsFromFile", coord_type="LIDAR", load_dim=5,
         use_dim=[0, 1, 2, 3]),
    dict(type="LoadAnnotations3D"),
    dict(type="NormalizeMultiviewImage",
         mean=[103.530, 116.280, 123.675], std=[1.0, 1.0, 1.0],
         to_rgb=False),
    dict(type="PadMultiViewImage", size_divisor=32),
    dict(type="DefaultFormatBundle3D"),
    dict(type="CustomCollect3D",
         keys=["gt_bboxes_3d", "gt_labels_3d", "img", "points"],
         max_points=2048, max_objs=16),
]
test_pipeline = [
    dict(type="LoadMultiViewImageFromFiles", to_float32=True),
    dict(type="NormalizeMultiviewImage",
         mean=[103.530, 116.280, 123.675], std=[1.0, 1.0, 1.0],
         to_rgb=False),
    dict(type="PadMultiViewImage", size_divisor=32),
    dict(type="CustomCollect3D", keys=["img"]),
]
data = dict(
    samples_per_gpu=1, workers_per_gpu=1,
    train=dict(ann_file="{ann}", data_root="", pipeline=train_pipeline,
               queue_length=2, bev_size=(8, 8), test_mode=False,
               use_valid_flag=False),
    val=dict(ann_file="{ann}", data_root="", pipeline=test_pipeline,
             bev_size=(8, 8), test_mode=True),
    test=dict(ann_file="{ann}", data_root="", pipeline=test_pipeline,
              bev_size=(8, 8), test_mode=True),
)
runner = dict(type="EpochBasedRunner", max_epochs=1)
evaluation = dict(interval=0)
''')
    return cfg_path


@pytest.mark.slow
def test_bevformer_train_and_test_cli(tmp_path, monkeypatch):
    root = str(tmp_path / "data")
    ann = make_mini_nuscenes(root, n_samples=4, img_hw=(64, 64))
    _add_scene_tokens(ann)
    cfg_path = _write_tiny_cfg(tmp_path, ann)
    work_dir = str(tmp_path / "work")

    import importlib.util

    def load_cli(name):
        spec = importlib.util.spec_from_file_location(
            f"cli_{name}", osp.join(REPO, "tools", f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    train_cli = load_cli("train")
    monkeypatch.setattr(sys, "argv", [
        "train.py", cfg_path, "--work-dir", work_dir,
        "--max-steps-per-epoch", "2"])
    train_cli.main()

    ckpt_dir = osp.join(work_dir, "ckpt")
    assert osp.isdir(ckpt_dir)

    test_cli = load_cli("test")
    monkeypatch.setattr(sys, "argv", [
        "test.py", cfg_path, ckpt_dir, "--eval", "mAP"])
    test_cli.main()
