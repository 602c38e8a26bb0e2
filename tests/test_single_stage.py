"""SingleStage3DDetector / TwoStage3DDetector composition bases.

Parity target: reference mmdet3d/models/detectors/single_stage.py:25-71
(extract_feat = backbone(+neck), forward_dummy, head delegation) and
two_stage.py:1-16 (rpn/roi composition; proposal-only when no roi head).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from distillbev_tpu.models import build_detector


def _head_cfg():
    voxel_size = (0.5, 0.5, 4)
    pcr = (-8, -8, -3, 8, 8, 1)
    return dict(
        type="CenterHead",
        in_channels=32,
        tasks=[dict(num_class=1, class_names=["car"])],
        common_heads=dict(reg=(2, 2), height=(1, 2), dim=(3, 2),
                          rot=(2, 2)),
        share_conv_channel=16,
        bbox_coder=dict(type="CenterPointBBoxCoder",
                        post_center_range=[-8, -8, -10, 8, 8, 10],
                        max_num=10, score_threshold=0.0,
                        out_size_factor=2, pc_range=pcr[:2],
                        voxel_size=voxel_size[:2], code_size=7),
        separate_head=dict(type="SeparateHead", init_bias=-2.19,
                           final_kernel=3),
        loss_cls=dict(type="GaussianFocalLoss", reduction="mean"),
        loss_bbox=dict(type="L1Loss", reduction="mean",
                       loss_weight=0.25),
        norm_bbox=True)


def _cfg(detector_type):
    voxel_size = (0.5, 0.5, 4)
    pcr = (-8, -8, -3, 8, 8, 1)
    common = dict(
        backbone=dict(type="SECOND", in_channels=16,
                      out_channels=[16, 32], layer_nums=[1, 1],
                      layer_strides=[2, 2],
                      norm_cfg=dict(type="BN", eps=1e-3,
                                    momentum=0.01)),
        neck=dict(type="SECONDFPN", in_channels=[16, 32],
                  out_channels=[16, 16], upsample_strides=[1, 2],
                  norm_cfg=dict(type="BN", eps=1e-3, momentum=0.01)),
        test_cfg=dict(
            post_center_limit_range=[-8, -8, -10, 8, 8, 10],
            max_per_img=10, score_threshold=0.1, min_radius=[4],
            pre_max_size=20, post_max_size=10, nms_thr=0.2,
            nms_type="rotate", nms_rescale_factor=[1.0],
            pc_range=pcr[:2], out_size_factor=2,
            voxel_size=voxel_size[:2]),
        train_cfg=dict(
            grid_size=[32, 32, 1], voxel_size=voxel_size,
            point_cloud_range=pcr, out_size_factor=2,
            gaussian_overlap=0.1, max_objs=8, min_radius=2,
            code_weights=[1.0] * 8),
    )
    if detector_type == "SingleStage3DDetector":
        return dict(type=detector_type, bbox_head=_head_cfg(), **common)
    # two-stage: head as rpn, proposal-only (no roi head) — the
    # composition the reference shell supports out of the box
    common["train_cfg"] = dict(rpn=common.pop("train_cfg"))
    common["test_cfg"] = dict(rpn=common.pop("test_cfg"))
    return dict(type=detector_type, rpn_head=_head_cfg(), **common)


def test_single_stage_forward_loss_decode(rng):
    model = build_detector(_cfg("SingleStage3DDetector"))
    x = jnp.asarray(rng.randn(2, 32, 32, 16).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    preds = model.apply(variables, x)
    assert len(preds) == 1
    assert preds[0]["heatmap"].shape == (2, 16, 16, 1)
    assert preds[0]["reg"].shape == (2, 16, 16, 2)

    # forward_dummy (FLOPs entry, reference single_stage.py:42-53)
    dummy = model.apply(variables, x, method=model.forward_dummy)
    np.testing.assert_allclose(np.asarray(dummy[0]["heatmap"]),
                               np.asarray(preds[0]["heatmap"]))

    gt = np.zeros((2, 8, 7), np.float32)
    gt[..., :2] = rng.uniform(-5, 5, (2, 8, 2))
    gt[..., 3:6] = rng.uniform(1, 3, (2, 8, 3))
    labels = np.zeros((2, 8), np.int32)
    gmask = np.zeros((2, 8), bool)
    gmask[:, :3] = True
    losses = model.apply(variables, preds, jnp.asarray(gt),
                         jnp.asarray(labels), jnp.asarray(gmask),
                         method=model.loss)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    dec = model.apply(variables, preds, method=model.get_bboxes)
    assert dec.bboxes.shape == (2, 10, 7)


def test_two_stage_proposal_only(rng):
    model = build_detector(_cfg("TwoStage3DDetector"))
    x = jnp.asarray(rng.randn(1, 32, 32, 16).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    rpn_outs, roi_outs = model.apply(variables, x)
    assert roi_outs is None
    assert rpn_outs[0]["heatmap"].shape == (1, 16, 16, 1)

    feats = model.apply(variables, x, method=model.extract_feat)
    assert feats.shape == (1, 16, 16, 32)
