"""End-to-end CenterPoint teacher slice: build from config, init, forward,
loss, decode — on tiny shapes (SURVEY.md §7 stage 3 milestone)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from distillbev_tpu.models import build_detector


def tiny_centerpoint_cfg(dynamic=False):
    voxel_size = [0.4, 0.4, 8]
    pcr = [-6.4, -6.4, -5.0, 6.4, 6.4, 3.0]   # 32x32 grid
    common = dict(
        pts_voxel_layer=dict(max_num_points=8, voxel_size=voxel_size,
                             point_cloud_range=pcr, max_voxels=(128, 128)),
        pts_middle_encoder=dict(type="PointPillarsScatter", in_channels=16,
                                output_shape=(32, 32)),
        pts_backbone=dict(type="SECOND", in_channels=16,
                          out_channels=[16, 32], layer_nums=[1, 1],
                          layer_strides=[2, 2],
                          norm_cfg=dict(type="BN", eps=1e-3, momentum=0.01)),
        pts_neck=dict(type="SECONDFPN", in_channels=[16, 32],
                      out_channels=[16, 16], upsample_strides=[1, 2],
                      norm_cfg=dict(type="BN", eps=1e-3, momentum=0.01)),
        pts_bbox_head=dict(
            type="CenterHead",
            in_channels=32,
            tasks=[dict(num_class=1, class_names=["car"]),
                   dict(num_class=2, class_names=["truck", "bus"])],
            common_heads=dict(reg=(2, 2), height=(1, 2), dim=(3, 2),
                              rot=(2, 2), vel=(2, 2)),
            share_conv_channel=16,
            bbox_coder=dict(type="CenterPointBBoxCoder",
                            post_center_range=[-8, -8, -10, 8, 8, 10],
                            max_num=20, score_threshold=0.0,
                            out_size_factor=2,
                            pc_range=pcr[:2],
                            voxel_size=voxel_size[:2], code_size=9),
            separate_head=dict(type="SeparateHead", init_bias=-2.19,
                               final_kernel=3),
            loss_cls=dict(type="GaussianFocalLoss", reduction="mean"),
            loss_bbox=dict(type="L1Loss", reduction="mean",
                           loss_weight=0.25),
            norm_bbox=True),
        train_cfg=dict(pts=dict(
            grid_size=[32, 32, 1], voxel_size=voxel_size,
            point_cloud_range=pcr, out_size_factor=2,
            gaussian_overlap=0.1, max_objs=16, min_radius=2,
            code_weights=[1.0] * 8 + [0.2, 0.2])),
        test_cfg=dict(pts=dict(
            post_center_limit_range=[-8, -8, -10, 8, 8, 10],
            max_per_img=20, score_threshold=0.1,
            min_radius=[4, 10], pre_max_size=50, post_max_size=20,
            nms_thr=0.2, nms_type="rotate",
            nms_rescale_factor=[1.0, [0.7, 0.55]],
            pc_range=pcr[:2], out_size_factor=2,
            voxel_size=voxel_size[:2])),
    )
    if dynamic:
        return dict(type="DynamicCenterPoint",
                    pts_voxel_encoder=dict(
                        type="DynamicPillarFeatureNet", in_channels=4,
                        feat_channels=[16], voxel_size=voxel_size,
                        point_cloud_range=pcr,
                        norm_cfg=dict(type="BN1d", eps=1e-3,
                                      momentum=0.01)),
                    max_voxels=128, **common)
    return dict(type="CenterPoint",
                pts_voxel_encoder=dict(
                    type="PillarFeatureNet", in_channels=4,
                    feat_channels=[16], with_distance=False,
                    voxel_size=voxel_size, point_cloud_range=pcr,
                    norm_cfg=dict(type="BN1d", eps=1e-3, momentum=0.01),
                    legacy=False),
                **common)


def make_batch(rng, b=2, n=256):
    pts = rng.uniform(-6, 6, (b, n, 4)).astype(np.float32)
    pts[..., 2] = rng.uniform(-2, 1, (b, n))
    mask = rng.rand(b, n) > 0.1
    gt = np.zeros((b, 16, 9), np.float32)
    gt[..., :2] = rng.uniform(-5, 5, (b, 16, 2))
    gt[..., 2] = 0.0
    gt[..., 3:6] = rng.uniform(1, 3, (b, 16, 3))
    gt[..., 6] = rng.uniform(-np.pi, np.pi, (b, 16))
    labels = rng.randint(0, 3, (b, 16))
    gmask = np.zeros((b, 16), bool)
    gmask[:, :5] = True
    return (jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(gt),
            jnp.asarray(labels), jnp.asarray(gmask))


@pytest.mark.parametrize("dynamic", [False, True])
def test_centerpoint_end_to_end(rng, dynamic):
    model = build_detector(tiny_centerpoint_cfg(dynamic))
    pts, mask, gt, labels, gmask = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), pts, mask)
    preds, bundle = model.apply(variables, pts, mask)
    assert len(preds) == 2
    assert preds[0]["heatmap"].shape == (2, 16, 16, 1)
    assert preds[1]["heatmap"].shape == (2, 16, 16, 2)
    assert preds[0]["reg"].shape == (2, 16, 16, 2)
    assert bundle.canvas.shape == (2, 32, 32, 16)
    assert bundle.neck_feat.shape == (2, 16, 16, 32)

    losses = model.apply(variables, preds, gt, labels, gmask,
                         method=model.loss)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    assert any("loss_heatmap" in k for k in losses)
    assert any("loss_bbox" in k for k in losses)

    dec = model.apply(variables, preds, method=model.get_bboxes)
    assert dec.bboxes.shape == (2, 20, 9)
    assert dec.scores.shape == (2, 20)
    assert dec.labels.shape == (2, 20)


def test_centerpoint_train_gradients(rng):
    model = build_detector(tiny_centerpoint_cfg())
    pts, mask, gt, labels, gmask = make_batch(rng)
    variables = model.init(jax.random.PRNGKey(0), pts, mask)
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def loss_fn(p):
        (preds, _), new_stats = model.apply(
            {"params": p, "batch_stats": stats}, pts, mask, train=True,
            mutable=["batch_stats"])
        losses = model.apply({"params": p, "batch_stats": stats},
                             preds, gt, labels, gmask, method=model.loss)
        return sum(jax.tree_util.tree_leaves(losses))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gnorm = jax.tree_util.tree_reduce(
        lambda a, g: a + float(jnp.abs(g).sum()), grads, 0.0)
    assert gnorm > 0


def test_target_generation_heatmap_peaks(rng):
    """GT centers must produce heatmap==1 at their cell."""
    model = build_detector(tiny_centerpoint_cfg())
    head_cfgs = tiny_centerpoint_cfg()
    gt = jnp.asarray([[[2.0, -1.2, 0.0, 1.6, 2.4, 1.5, 0.3, 0, 0]]])
    labels = jnp.asarray([[0]])
    gmask = jnp.asarray([[True]])
    pts = jnp.zeros((1, 8, 4))
    mask = jnp.ones((1, 8), bool)
    variables = model.init(jax.random.PRNGKey(0), pts, mask)
    heatmaps, anno, inds, masks = model.apply(
        variables, gt, labels, gmask,
        method=lambda m, *a: m.bbox_head.get_targets(*a))
    hm = np.asarray(heatmaps[0])  # [1, 1, 16, 16]
    # center cell: x=(2.0+6.4)/0.4/2=10.5 -> 10 ; y=(-1.2+6.4)/0.4/2=6.5 -> 6
    assert hm[0, 0, 6, 10] == 1.0
    assert int(np.asarray(masks[0]).sum()) == 1
    assert int(np.asarray(inds[0])[0, 0]) == 6 * 16 + 10
    a = np.asarray(anno[0])[0, 0]
    assert abs(a[0] - 0.5) < 1e-5 and abs(a[1] - 0.5) < 1e-5
    assert np.allclose(a[3:6], np.log([1.6, 2.4, 1.5]), atol=1e-5)


def test_fused_pillar_path_matches_dense(rng):
    """The sorted-pillar fast path (no [V, P, C] materialization) must be
    numerically identical to hard_voxelize + PillarFeatureNet."""
    cfg = tiny_centerpoint_cfg()
    fused = build_detector(dict(cfg, fused_pillars=True))
    dense = build_detector(dict(cfg, fused_pillars=False))
    pts, mask, *_ = make_batch(rng)
    variables = fused.init(jax.random.PRNGKey(0), pts, mask,
                           method=fused.extract_pts_feat)
    b1 = fused.apply(variables, pts, mask, method=fused.extract_pts_feat)
    b2 = dense.apply(variables, pts, mask, method=dense.extract_pts_feat)
    np.testing.assert_allclose(np.asarray(b1.canvas), np.asarray(b2.canvas),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(b1.neck_feat),
                               np.asarray(b2.neck_feat), atol=1e-4)


def test_multibranch_centerpoint(rng):
    """Temporal multi-branch fusion variant (reference
    dynamic_centerpoint.py:99): split by time channel, fused canvases."""
    cfg = dict(tiny_centerpoint_cfg(dynamic=True),
               type="DynamicMultiBranchCenterPoint",
               time_thres=0.05, max_multi_sweeps=10, fuse="cat")
    det = build_detector(cfg)
    pts = rng.uniform(-5, 5, (2, 256, 4)).astype(np.float32)
    tlag = (rng.rand(2, 256, 1) * 0.1).astype(np.float32)
    pts = jnp.asarray(np.concatenate([pts, tlag], -1))
    mask = jnp.ones((2, 256), bool)
    v = det.init(jax.random.PRNGKey(0), pts, mask)
    preds, bundle = det.apply(v, pts, mask)
    # cat fuse doubles canvas channels
    assert bundle.canvas.shape == (2, 32, 32, 32)
    assert preds[0]["heatmap"].shape == (2, 16, 16, 1)
