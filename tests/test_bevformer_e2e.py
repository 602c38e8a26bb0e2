"""BEVFormer-track E2E: queue dataset -> BEVFormerDistill train step with
a LidarFormer teacher (closes the PARITY round-1 gap)."""
import os.path as osp
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from distillbev_tpu.datasets import (CustomNuScenesDataset,
                                     build_dataloader)
from distillbev_tpu.models import build_detector
from distillbev_tpu.training import (BEVFormerBatch, init_train_state,
                                     make_bevformer_distill_train_step)
from distillbev_tpu.training.optim import build_optimizer

from test_datasets import make_mini_nuscenes
from test_model_bevformer import (tiny_bevformer_cfg,
                                  tiny_lidarformer_cfg, BEV_H, BEV_W,
                                  EMBED, PCR)


def bevformer_pipeline():
    return [
        dict(type="LoadMultiViewImageFromFiles", to_float32=True),
        dict(type="NormalizeMultiviewImage",
             mean=[103.530, 116.280, 123.675],
             std=[1.0, 1.0, 1.0], to_rgb=False),
        dict(type="PadMultiViewImage", size_divisor=32),
        dict(type="LoadAnnotations3D"),
        dict(type="Collect3D",
             keys=["points", "gt_bboxes_3d", "img"],
             meta_keys=["sample_idx", "timestamp", "can_bus",
                        "lidar2img", "scene_token"],
             max_points=2048, max_objs=16),
        # points not loaded in this pipeline -> drop the key
    ]


class _PointsStub:
    """Adds empty points so Collect3D emits the key (the BEVFormer
    pipeline itself is camera-only; the distill batch carries lidar for
    the teacher separately)."""

    def __call__(self, results):
        from distillbev_tpu.core.points import LiDARPoints
        pts = np.fromfile(results["pts_filename"],
                          dtype=np.float32).reshape(-1, 5)[:, :4]
        results["points"] = LiDARPoints(pts, points_dim=4)
        return results


@pytest.mark.slow
def test_bevformer_distill_e2e(tmp_path):
    root = str(tmp_path / "data")
    ann = make_mini_nuscenes(root, n_samples=4, img_hw=(64, 64))
    from distillbev_tpu.datasets.nuscenes_dataset import PIPELINES
    if "PointsStub" not in PIPELINES.module_dict:
        PIPELINES.register_module(name="PointsStub", module=_PointsStub)
    pipeline = bevformer_pipeline()
    pipeline.insert(3, dict(type="PointsStub"))
    ds = CustomNuScenesDataset(
        ann_file=ann, pipeline=pipeline, queue_length=2,
        img_info_prototype="mmcv",
        modality=dict(use_camera=True, use_lidar=True),
        bev_size=(BEV_H, BEV_W))
    sample = ds.prepare_train_data(2)
    assert sample is not None
    t, n = sample["img"].shape[:2]
    assert t == 2 and n == 6
    assert sample["can_bus"].shape == (2, 18)
    assert sample["lidar2img"].shape[:2] == (2, 6)
    assert sample["prev_bev_exists"].shape == (2,)

    # build student (2 cams to keep it small: slice the sample)
    s_cfg = tiny_bevformer_cfg()
    s_cfg["type"] = "BEVFormerDistill"
    s_cfg["distill_type"] = "fgd"
    s_cfg["distill_params"] = dict(
        student_channels=[EMBED], teacher_channels=[EMBED],
        spatial_t=0.5, spatial_student_ratio=1.0, channel_t=0.5,
        fg_feat_loss_weights=[3e-3], bg_feat_loss_weights=[4e-2],
        channel_loss_weights=[0.25], spatial_loss_weights=[1e-3],
        adaptation_type="1x1conv", teacher_adaptation_type="identity",
        spatial_attentions=["teacher"],
        feat_criterion=dict(type="MSELoss", reduction="none"),
        spatial_criterion=dict(type="L1Loss", reduction="none"),
        channel_criterion=dict(type="L1Loss", reduction="none"),
        foreground_mask="gt", background_mask="logical_not",
        scale_mask="combine_gt", spatial_mask=True, channel_mask=True,
        student_feat_pos=["head"], teacher_feat_pos=["head"],
        affinity_weights=[0], affinity_mode="none",
        fp_as_foreground="none", fp_weight=0, fp_epoch=0,
        output_threshold=0.1, non_empty_weight=0, multi_scale_epoch=-1,
        two_stage_epoch=-1, context_length=0, context_weight=0,
        hs_weight=0.0, query_weight=0.0)
    s_cfg["train_cfg"] = dict(pts=dict(
        grid_size=[BEV_H, BEV_W, 1], voxel_size=[2.0, 2.0, 8],
        point_cloud_range=PCR, out_size_factor=1))
    student = build_detector(s_cfg)
    teacher = build_detector(tiny_lidarformer_cfg())

    imgs = np.stack([sample["img"][:, :2]])[..., :3]     # [1,2,2,H,W,3]
    can_bus = sample["can_bus"][None]
    l2i = sample["lidar2img"][None][:, :, :2]
    prev = sample["prev_bev_exists"][None]
    pts = np.zeros((1, 512, 4), np.float32)
    pts[0, :, :3] = np.random.RandomState(0).uniform(-7, 7, (512, 3))
    pmask = np.ones((1, 512), bool)
    gt = sample["gt_boxes"][None]
    labels = np.clip(sample["gt_labels"][None], 0, 3)
    gmask = sample["gt_mask"][None]
    batch = BEVFormerBatch(*[jnp.asarray(a) for a in (
        imgs, can_bus, l2i, prev, pts, pmask, gt, labels, gmask)])

    tvars = teacher.init(jax.random.PRNGKey(1), batch.points,
                         batch.point_mask)
    _, t_bundle = teacher.apply(tvars, batch.points, batch.point_mask)
    svars = student.init(jax.random.PRNGKey(0), batch.imgs,
                         batch.can_bus, batch.lidar2img,
                         batch.prev_exists, t_bundle.bev_feat,
                         method="init_with_teacher")
    tx = build_optimizer(dict(type="AdamW", lr=2e-4, weight_decay=0.01),
                         lambda s: 2e-4, svars["params"],
                         grad_clip=dict(max_norm=35))
    state = init_train_state(svars["params"],
                             svars.get("batch_stats", {}), tx)
    step_fn = jax.jit(make_bevformer_distill_train_step(
        student, teacher, tx, BEV_H, BEV_W))
    state1, metrics = step_fn(state, tvars, batch, jnp.float32(1.0))
    assert np.isfinite(float(metrics["total_loss"]))
    assert any(k.startswith("kd_") for k in metrics)
    assert "loss_cls" in metrics
    assert float(metrics["grad_norm"]) > 0

    # split-compile mode (two jits; the full-size single-chip escape
    # hatch) computes the identical step
    from distillbev_tpu.training import make_bevformer_distill_split_steps
    teacher_fn, student_fn = make_bevformer_distill_split_steps(
        student, teacher, tx, BEV_H, BEV_W)
    t_outs, t_bev, t_dec = jax.jit(teacher_fn)(tvars, batch)
    assert t_dec is None    # fp_as_foreground="none" in this recipe
    _, metrics2 = jax.jit(student_fn)(state, t_outs, t_bev, t_dec,
                                      batch, jnp.float32(1.0))
    for k, v in metrics.items():
        np.testing.assert_allclose(
            float(metrics2[k]), float(v), rtol=1e-5, atol=1e-6,
            err_msg=f"split-step mismatch on {k}")
