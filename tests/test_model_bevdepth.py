"""End-to-end BEVDepth4D student on tiny shapes (SURVEY.md §7 stage 4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from distillbev_tpu.models import build_detector
from distillbev_tpu.models.detectors.bevdet import ImgInputs

GRID = {"xbound": [-8.0, 8.0, 1.0], "ybound": [-8.0, 8.0, 1.0],
        "zbound": [-10.0, 10.0, 20.0], "dbound": [1.0, 9.0, 1.0]}
DATA = {"input_size": (64, 64)}


def tiny_bevdepth4d_cfg():
    pcr = [-8.0, -8.0, -5.0, 8.0, 8.0, 3.0]
    return dict(
        type="BEVDepth4D",
        img_backbone=dict(type="ResNet", depth=18, out_indices=(2, 3),
                          norm_cfg=dict(type="BN"), base_channels=16),
        img_neck=dict(type="FPNForBEVDet", in_channels=[64, 128],
                      out_channels=32, num_outs=1),
        img_view_transformer=dict(
            type="ViewTransformerLSSBEVDepth", loss_depth_weight=100.0,
            grid_config=GRID, data_config=DATA, numC_input=32,
            numC_Trans=8, downsample=16,
            extra_depth_net=dict(type="ResNetForBEVDet", numC_input=16,
                                 num_layer=[1], num_channels=[16],
                                 stride=[1])),
        img_bev_encoder_backbone=dict(type="ResNetForBEVDet", numC_input=16,
                                      num_channels=[16, 32, 64]),
        img_bev_encoder_neck=dict(type="FPN_LSS", in_channels=16 + 64,
                                  out_channels=32),
        pre_process=dict(type="ResNetForBEVDet", numC_input=8,
                         num_layer=[1], num_channels=[8], stride=[1],
                         backbone_output_ids=[0]),
        pts_bbox_head=dict(
            type="CenterHead", in_channels=32,
            tasks=[dict(num_class=1, class_names=["car"])],
            common_heads=dict(reg=(2, 2), height=(1, 2), dim=(3, 2),
                              rot=(2, 2), vel=(2, 2)),
            share_conv_channel=16,
            bbox_coder=dict(type="CenterPointBBoxCoder",
                            post_center_range=[-10, -10, -10, 10, 10, 10],
                            max_num=10, score_threshold=0.0,
                            out_size_factor=1, pc_range=pcr[:2],
                            voxel_size=[1.0, 1.0], code_size=9),
            separate_head=dict(type="SeparateHead", init_bias=-2.19,
                               final_kernel=3),
            loss_cls=dict(type="GaussianFocalLoss", reduction="mean"),
            loss_bbox=dict(type="L1Loss", reduction="mean",
                           loss_weight=0.25),
            norm_bbox=True),
        train_cfg=dict(pts=dict(
            grid_size=[16, 16, 1], voxel_size=[1.0, 1.0, 8],
            point_cloud_range=pcr, out_size_factor=1,
            gaussian_overlap=0.1, max_objs=8, min_radius=2,
            code_weights=[1.0] * 8 + [0.2, 0.2])),
        test_cfg=dict(pts=dict(
            post_center_limit_range=[-10, -10, -10, 10, 10, 10],
            max_per_img=10, score_threshold=0.1, min_radius=[4],
            pre_max_size=20, post_max_size=10, nms_thr=0.2,
            nms_type="rotate", pc_range=pcr[:2], out_size_factor=1,
            voxel_size=[1.0, 1.0])),
    )


def make_inputs(rng, b=1, n=2):
    imgs = rng.rand(b, 2 * n, 64, 64, 3).astype(np.float32)
    intrins = np.tile(np.array([[30.0, 0, 32], [0, 30.0, 32], [0, 0, 1]],
                               np.float32), (b, 2, n, 1, 1))
    rots = np.tile(np.eye(3, dtype=np.float32), (b, 2, n, 1, 1))
    # cam z forward -> rotate cam into ego looking +x
    trans = np.zeros((b, 2, n, 3), np.float32)
    trans[:, :, 1, 0] = 0.5
    post_rots = np.tile(np.eye(3, dtype=np.float32), (b, 2, n, 1, 1))
    post_trans = np.zeros((b, 2, n, 3), np.float32)
    depth_gt = np.zeros((b, n, 4, 4), np.float32)
    depth_gt[:, :, 1, 1] = 4.0
    return ImgInputs(*[jnp.asarray(a) for a in
                       (imgs, rots, trans, intrins, post_rots, post_trans,
                        depth_gt)])


class TestBEVDepth4D:

    def test_forward_shapes(self, rng):
        model = build_detector(tiny_bevdepth4d_cfg())
        inputs = make_inputs(rng)
        variables = model.init(jax.random.PRNGKey(0), inputs)
        preds, bundle, depth = model.apply(variables, inputs)
        assert bundle.lss_feat.shape == (1, 16, 16, 16)   # 2 frames x 8ch
        assert bundle.neck_feat.shape == (1, 16, 16, 32)
        assert depth.shape == (1, 2, 4, 4, 8)             # D=8 bins
        assert preds[0]["heatmap"].shape == (1, 16, 16, 1)

    def test_losses_and_grads(self, rng):
        model = build_detector(tiny_bevdepth4d_cfg())
        inputs = make_inputs(rng)
        variables = model.init(jax.random.PRNGKey(0), inputs)
        gt = jnp.asarray([[[1.0, 2.0, 0.0, 2.0, 3.0, 1.5, 0.2, 0, 0]]])
        labels = jnp.zeros((1, 1), jnp.int32)
        gmask = jnp.ones((1, 1), bool)

        def loss_fn(params):
            (preds, bundle, depth), _ = model.apply(
                {"params": params,
                 "batch_stats": variables.get("batch_stats", {})},
                inputs, train=True, mutable=["batch_stats"])
            losses = model.apply(variables, preds, gt, labels, gmask,
                                 method=model.head_loss)
            d_loss = model.apply(variables, depth, inputs.depth_gt,
                                 method=model.depth_loss)
            return sum(jax.tree_util.tree_leaves(losses)) + d_loss

        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        assert np.isfinite(float(loss))
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)
        total = sum(float(jnp.abs(g).sum()) for g in flat)
        assert total > 0


class TestShiftFeature:

    def test_identity_motion_is_noop(self, rng):
        model = build_detector(tiny_bevdepth4d_cfg())
        inputs = make_inputs(rng)
        variables = model.init(jax.random.PRNGKey(0), inputs)
        bev = jnp.asarray(rng.randn(1, 16, 16, 4).astype(np.float32))
        rots = jnp.tile(jnp.eye(3), (1, 2, 2, 1, 1))
        trans = jnp.zeros((1, 2, 2, 3))
        out = model.apply(variables, bev, trans, rots,
                          method=model.shift_feature)
        assert np.allclose(np.asarray(out), np.asarray(bev), atol=1e-5)

    def test_translation_shifts_content(self, rng):
        model = build_detector(tiny_bevdepth4d_cfg())
        inputs = make_inputs(rng)
        variables = model.init(jax.random.PRNGKey(0), inputs)
        bev = jnp.zeros((1, 16, 16, 1)).at[0, 8, 8, 0].set(1.0)
        rots = jnp.tile(jnp.eye(3), (1, 2, 2, 1, 1))
        trans = jnp.zeros((1, 2, 2, 3))
        # adjacent ego 2m behind along x (grid res 1.0 -> shift 2 cells)
        trans = trans.at[:, 1, :, 0].set(-2.0)
        out = np.asarray(model.apply(variables, bev, trans, rots,
                                     method=model.shift_feature))
        peak = np.unravel_index(out[0, :, :, 0].argmax(), (16, 16))
        assert abs(out[0, peak[0], peak[1], 0] - 1.0) < 1e-4
        assert peak != (8, 8)
