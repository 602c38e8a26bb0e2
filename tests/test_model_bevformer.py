"""Transformer track tests: BEVFormer student, LidarFormer teacher,
BEVFormerDistill (SURVEY.md §7 stage 7) on tiny shapes."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from distillbev_tpu.models import build_detector

PCR = [-8.0, -8.0, -5.0, 8.0, 8.0, 3.0]
BEV_H = BEV_W = 8
EMBED = 32


def tiny_bevformer_cfg():
    return dict(
        type="BEVFormer",
        use_grid_mask=False,
        img_backbone=dict(type="ResNet", depth=18, out_indices=(2, 3),
                          base_channels=8),
        img_neck=dict(type="FPN", in_channels=[32, 64], out_channels=EMBED,
                      start_level=0, num_outs=2),
        pts_bbox_head=dict(
            type="BEVFormerHead",
            num_classes=4, embed_dims=EMBED, num_query=12,
            bev_h=BEV_H, bev_w=BEV_W, pc_range=PCR,
            real_h=16.0, real_w=16.0,
            code_weights=[1.0] * 8 + [0.2, 0.2],
            positional_encoding=dict(num_feats=EMBED // 2,
                                     row_num_embed=BEV_H,
                                     col_num_embed=BEV_W),
            transformer=dict(
                type="PerceptionTransformer", embed_dims=EMBED,
                num_cams=2, num_feature_levels=2,
                encoder=dict(num_layers=2, pc_range=PCR,
                             embed_dims=EMBED, num_heads=4,
                             feedforward_channels=64, num_levels=2,
                             num_cams=2),
                decoder=dict(num_layers=2, embed_dims=EMBED,
                             num_heads=4, feedforward_channels=64)),
            bbox_coder=dict(type="NMSFreeCoder",
                            post_center_range=[-10, -10, -10, 10, 10, 10],
                            pc_range=PCR, max_num=10, num_classes=4),
            loss_cls=dict(type="FocalLoss", use_sigmoid=True, gamma=2.0,
                          alpha=0.25, reduction="mean", loss_weight=2.0),
            loss_bbox=dict(type="L1Loss", reduction="mean",
                           loss_weight=0.25)),
    )


def tiny_lidarformer_cfg():
    return dict(
        type="LidarFormer",
        pts_voxel_layer=dict(max_num_points=4,
                             voxel_size=[0.25, 0.25, 0.25],
                             point_cloud_range=PCR, max_voxels=(512,
                                                                512)),
        pts_voxel_encoder=dict(type="HardSimpleVFE", num_features=4),
        pts_middle_encoder=dict(
            type="SparseEncoder", in_channels=4,
            sparse_shape=[33, 64, 64], base_channels=8,
            output_channels=16,
            encoder_channels=((8,), (8, 8), (16, 16), (16, 16)),
            encoder_paddings=((1,), (1, 1), (1, 1), ((0, 1, 1), 1)),
            max_active=2048),
        pts_backbone=dict(type="SECOND", in_channels=96,
                          out_channels=[32, 64], layer_nums=[1, 1],
                          layer_strides=[1, 2]),
        pts_neck=dict(type="FPN", in_channels=[32, 64],
                      out_channels=EMBED, num_outs=2),
        pts_bbox_head=dict(
            type="DGCNN3DHead", num_classes=4, embed_dims=EMBED,
            num_query=12, pc_range=PCR, bev_h=16, bev_w=16,
            code_weights=[1.0] * 8 + [0.2, 0.2],
            transformer=dict(type="DeformableDetrTransformerDistill",
                             embed_dims=EMBED, num_encoder_layers=1,
                             feedforward_channels=64,
                             num_feature_levels=2,
                             decoder=dict(num_layers=2,
                                          embed_dims=EMBED, num_heads=4,
                                          feedforward_channels=64)),
            bbox_coder=dict(type="NMSFreeCoder",
                            post_center_range=[-10, -10, -10, 10, 10, 10],
                            pc_range=PCR, max_num=10, num_classes=4),
            loss_cls=dict(type="FocalLoss", use_sigmoid=True,
                          reduction="mean", loss_weight=2.0),
            loss_bbox=dict(type="L1Loss", reduction="mean",
                           loss_weight=0.25)),
    )


def cam_inputs(rng, b=1, t=2, n=2, hw=(32, 32)):
    imgs = rng.rand(b, t, n, *hw, 3).astype(np.float32)
    can_bus = rng.randn(b, t, 18).astype(np.float32)
    l2i = np.tile(np.eye(4, dtype=np.float32), (b, t, n, 1, 1))
    l2i[..., 0, 0] = 20.0
    l2i[..., 1, 1] = 20.0
    l2i[..., 0, 2] = hw[1] / 2
    l2i[..., 1, 2] = hw[0] / 2
    prev_exists = np.ones((b, t), np.float32)
    return (jnp.asarray(imgs), jnp.asarray(can_bus), jnp.asarray(l2i),
            jnp.asarray(prev_exists))


def gt(rng, b=1, m=6):
    boxes = np.zeros((b, m, 9), np.float32)
    boxes[..., :2] = rng.uniform(-6, 6, (b, m, 2))
    boxes[..., 2] = rng.uniform(-2, 0, (b, m))
    boxes[..., 3:6] = rng.uniform(0.5, 3, (b, m, 3))
    boxes[..., 6] = rng.uniform(-np.pi, np.pi, (b, m))
    labels = rng.randint(0, 4, (b, m))
    mask = np.ones((b, m), bool)
    mask[:, 4:] = False
    return jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(mask)


class TestBEVFormer:

    def test_forward_loss_decode(self, rng):
        model = build_detector(tiny_bevformer_cfg())
        inputs = cam_inputs(rng)
        variables = model.init(jax.random.PRNGKey(0), *inputs)
        outs, bundle = model.apply(variables, *inputs)
        assert outs["bev_embed"].shape == (1, BEV_H * BEV_W, EMBED)
        assert outs["all_cls_scores"].shape == (2, 1, 12, 4)
        assert outs["all_bbox_preds"].shape == (2, 1, 12, 10)
        boxes, labels, mask = gt(rng)
        losses = model.apply(variables, outs, boxes, labels, mask,
                             method=model.loss)
        assert "loss_cls" in losses and "loss_bbox" in losses
        assert "loss_cls.d0" in losses
        for k, v in losses.items():
            assert np.isfinite(float(v)), k
        dec = model.apply(variables, outs, method=model.get_bboxes)
        assert dec.bboxes.shape == (1, 10, 9)

    def test_history_stops_gradient(self, rng):
        model = build_detector(tiny_bevformer_cfg())
        inputs = cam_inputs(rng)
        variables = model.init(jax.random.PRNGKey(0), *inputs)
        boxes, labels, mask = gt(rng)

        def loss_fn(params):
            v = {"params": params,
                 "batch_stats": variables.get("batch_stats", {})}
            outs, _ = model.apply(v, *inputs)
            losses = model.apply(v, outs, boxes, labels, mask,
                                 method=model.loss)
            return sum(jax.tree_util.tree_leaves(losses))

        grads = jax.grad(loss_fn)(variables["params"])
        total = sum(float(jnp.abs(g).sum())
                    for g in jax.tree_util.tree_leaves(grads))
        assert np.isfinite(total) and total > 0


class TestLidarFormer:

    def test_forward_loss(self, rng):
        model = build_detector(tiny_lidarformer_cfg())
        pts = rng.uniform(-7, 7, (1, 512, 4)).astype(np.float32)
        pts[..., 2] = rng.uniform(-4, 2, (1, 512))
        mask = np.ones((1, 512), bool)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                               jnp.asarray(mask))
        outs, bundle = model.apply(variables, jnp.asarray(pts),
                                   jnp.asarray(mask))
        assert outs["all_cls_scores"].shape == (2, 1, 12, 4)
        assert bundle.bev_feat.shape[0] == 1
        boxes, labels, gmask = gt(rng)
        losses = model.apply(variables, outs, boxes, labels, gmask,
                             method=model.loss)
        for k, v in losses.items():
            assert np.isfinite(float(v)), k


class TestBEVFormerDistill:

    def test_distill_losses(self, rng):
        cfg = tiny_bevformer_cfg()
        cfg["type"] = "BEVFormerDistill"
        cfg["distill_type"] = "fgd"
        cfg["distill_params"] = dict(
            student_channels=[EMBED], teacher_channels=[EMBED],
            spatial_t=0.5, spatial_student_ratio=1.0, channel_t=0.5,
            fg_feat_loss_weights=[1e-3], bg_feat_loss_weights=[4e-2],
            channel_loss_weights=[0.25], spatial_loss_weights=[2.5e-3],
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
            output_threshold=1.0, non_empty_weight=0,
            multi_scale_epoch=-1, two_stage_epoch=-1,
            context_length=0, context_weight=0,
            hs_weight=0.1, query_weight=0.1)
        cfg["train_cfg"] = dict(pts=dict(
            grid_size=[BEV_H, BEV_W, 1], voxel_size=[2.0, 2.0, 8],
            point_cloud_range=PCR, out_size_factor=1))
        model = build_detector(cfg)
        inputs = cam_inputs(rng)
        t_bev = jnp.asarray(rng.randn(1, BEV_H, BEV_W,
                                      EMBED).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), *inputs, t_bev,
                               method="init_with_teacher")
        outs, bundle = model.apply(variables, *inputs)
        boxes, labels, mask = gt(rng)
        t_outs = {"hs": outs["hs"], "query_embed": outs["query_embed"]}
        losses = model.apply(
            variables, outs, t_outs, t_bev, boxes, labels, mask,
            jnp.float32(1.0), BEV_H, BEV_W,
            method="distill_losses_bevformer")
        assert "kd_fg_feat_loss_bev" in losses
        assert "kd_hs_loss_bev" in losses
        for k, v in losses.items():
            assert np.isfinite(float(v)), k


def test_encoder_with_cp_matches(rng):
    """with_cp (remat) changes memory, not values or grads."""
    import jax
    import jax.numpy as jnp
    from distillbev_tpu.models.transformer.encoder import BEVFormerEncoder

    bev_h = bev_w = 8
    b, ncam, c = 1, 2, 32
    hw = 16 * 44 // 44  # dummy
    sshapes = ((4, 11),)
    val = jnp.asarray(rng.randn(b, ncam, 44, c).astype(np.float32))
    q = jnp.asarray(rng.randn(b, bev_h * bev_w, c).astype(np.float32))
    l2i = jnp.tile(jnp.eye(4), (b, ncam, 1, 1)).astype(jnp.float32)

    def run(with_cp):
        enc = BEVFormerEncoder(num_layers=2, pc_range=[-8, -8, -3, 8, 8,
                                                       3],
                               embed_dims=c, num_heads=4,
                               feedforward_channels=64, num_levels=1,
                               num_cams=ncam, with_cp=with_cp)
        vars_ = enc.init(jax.random.PRNGKey(0), q, val, bev_h, bev_w,
                         lidar2img=l2i, img_shape=(64, 176),
                         spatial_shapes=sshapes, train=False)

        def loss(v):
            out = enc.apply(v, q, val, bev_h, bev_w, lidar2img=l2i,
                            img_shape=(64, 176),
                            spatial_shapes=sshapes, train=True,
                            rngs={"dropout": jax.random.PRNGKey(1)})
            return (out ** 2).sum()

        g = jax.grad(loss)(vars_)
        return loss(vars_), g

    l0, g0 = run(False)
    l1, g1 = run(True)
    assert np.allclose(float(l0), float(l1), rtol=1e-5)
    f0 = jax.tree_util.tree_leaves(g0)
    f1 = jax.tree_util.tree_leaves(g1)
    for a, b_ in zip(f0, f1):
        assert np.allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_encoder_scan_layers_matches(rng):
    """scan_layers (nn.scan over ONE stacked layer) is the same math as
    the unrolled loop: identical outputs and grads once the per-layer
    params are stacked (training.param_utils.stack_layer_params)."""
    import jax
    import jax.numpy as jnp
    from distillbev_tpu.models.transformer.encoder import BEVFormerEncoder
    from distillbev_tpu.training.param_utils import stack_layer_params

    bev_h = bev_w = 8
    b, ncam, c = 1, 2, 32
    sshapes = ((4, 11),)
    val = jnp.asarray(rng.randn(b, ncam, 44, c).astype(np.float32))
    q = jnp.asarray(rng.randn(b, bev_h * bev_w, c).astype(np.float32))
    l2i = jnp.tile(jnp.eye(4), (b, ncam, 1, 1)).astype(jnp.float32)

    def enc_of(scan, with_cp=False):
        return BEVFormerEncoder(
            num_layers=2, pc_range=[-8, -8, -3, 8, 8, 3], embed_dims=c,
            num_heads=4, feedforward_channels=64, num_levels=1,
            num_cams=ncam, dropout=0.0, scan_layers=scan,
            with_cp=with_cp)

    enc0 = enc_of(False)
    v0 = enc0.init(jax.random.PRNGKey(0), q, val, bev_h, bev_w,
                   lidar2img=l2i, img_shape=(64, 176),
                   spatial_shapes=sshapes, train=False)
    v1 = {"params": stack_layer_params(v0["params"])}
    # stacked leaves carry a leading [L] axis
    leaf = v1["params"]["layers"]["tsa"]["sampling_offsets"]["kernel"]
    assert leaf.shape[0] == 2

    def loss(enc, v):
        out = enc.apply(v, q, val, bev_h, bev_w, lidar2img=l2i,
                        img_shape=(64, 176), spatial_shapes=sshapes,
                        train=True,
                        rngs={"dropout": jax.random.PRNGKey(1)})
        return (out ** 2).sum()

    for with_cp in (False, True):
        enc1 = enc_of(True, with_cp=with_cp)
        l0, g0 = jax.value_and_grad(lambda v: loss(enc0, v))(v0)
        l1, g1 = jax.value_and_grad(lambda v: loss(enc1, v))(v1)
        assert np.allclose(float(l0), float(l1), rtol=1e-5)
        g0s = stack_layer_params(g0["params"])
        for a, b_ in zip(jax.tree_util.tree_leaves(g0s),
                         jax.tree_util.tree_leaves(g1["params"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=2e-4)


def test_map_params_into_scanned_layers():
    """The torch converter's per-layer names land in row i of a stacked
    layers/... leaf (param_utils._scanned_path routing)."""
    import numpy as np
    from distillbev_tpu.training.param_utils import map_params

    target = {"encoder": {"layers": {"fc": {
        "kernel": np.zeros((3, 4, 5), np.float32)}}}}
    nm = {f"enc.layers.{i}.fc.weight":
          ("encoder", f"layer_{i}", "fc", "kernel") for i in range(3)}
    torch_flat = {f"enc.layers.{i}.fc.weight":
                  np.full((5, 4), float(i + 1), np.float32)
                  for i in range(3)}
    out, missing, mismatched = map_params(torch_flat, nm, target)
    assert not missing and not mismatched
    got = out["encoder"]["layers"]["fc"]["kernel"]
    for i in range(3):
        np.testing.assert_array_equal(got[i],
                                      np.full((4, 5), float(i + 1)))


class TestGridMask:
    """Rotated-mask parity (reference grid_mask.py:107-111: integer
    degree angle in [0, rotate); the shipped recipe rotate=1 never
    rotates)."""

    def _mask_of(self, imgs, out):
        return (np.asarray(out)[0, :, :, 0] != 0)

    def test_rotate1_is_identity_angle(self):
        from distillbev_tpu.models.utils.grid_mask import grid_mask
        imgs = jnp.ones((1, 32, 32, 3))
        key = jax.random.PRNGKey(3)
        a = grid_mask(key, imgs, prob=1.0, rotate=1)
        # rotate=1 path must not consume a different number of random
        # bits (trace-stable) and must equal the unrotated default
        b = grid_mask(key, imgs, prob=1.0)
        assert np.array_equal(np.asarray(a), np.asarray(b))
        # some pixels dropped, some kept
        m = self._mask_of(imgs, a)
        assert 0 < m.sum() < m.size

    def test_rotation_moves_the_grid(self):
        from distillbev_tpu.models.utils.grid_mask import grid_mask
        imgs = jnp.ones((1, 64, 64, 3))
        # find a key whose angle draw is nonzero
        for s in range(8):
            key = jax.random.PRNGKey(s)
            k1, k2, k3, k4, k5 = jax.random.split(key, 5)
            ang = int(jax.random.randint(k5, (), 0, 90))
            if ang >= 30:
                break
        base = self._mask_of(imgs, grid_mask(key, imgs, prob=1.0,
                                             rotate=1))
        rot = self._mask_of(imgs, grid_mask(key, imgs, prob=1.0,
                                            rotate=90))
        assert not np.array_equal(base, rot)
        # rotation preserves the dropped-area fraction approximately
        # (same stripe geometry evaluated on rotated coordinates)
        assert abs(base.mean() - rot.mean()) < 0.2

    def test_rotated_bands_follow_coordinates(self):
        """The rotated mask equals the unrotated band function evaluated
        at inverse-rotated coordinates (the definition), checked
        explicitly against a numpy reimplementation."""
        from distillbev_tpu.models.utils.grid_mask import grid_mask
        h = w = 48
        imgs = jnp.ones((1, h, w, 1))
        key = jax.random.PRNGKey(11)
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        d = int(jax.random.randint(k1, (), 2, max(min(h, w), 3)))
        off_y = int(jax.random.randint(k2, (), 0, max(min(h, w), 3))) % d
        off_x = int(jax.random.randint(k3, (), 0, max(min(h, w), 3))) % d
        keep = int(np.clip(int(d * 0.5 + 0.5), 1, d - 1))
        ang = int(jax.random.randint(k5, (), 0, 45)) * np.pi / 180.0
        cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
        yy, xx = np.meshgrid(np.arange(h, dtype=np.float64),
                             np.arange(w, dtype=np.float64),
                             indexing="ij")
        ry, rx = yy - cy, xx - cx
        yyr = np.cos(ang) * ry + np.sin(ang) * rx + cy
        xxr = -np.sin(ang) * ry + np.cos(ang) * rx + cx
        ys = (np.floor(yyr).astype(int) + off_y) % d
        xs = (np.floor(xxr).astype(int) + off_x) % d
        expect = (ys >= keep) | (xs >= keep)
        got = self._mask_of(imgs, grid_mask(key, imgs, prob=1.0,
                                            rotate=45))
        # float32 vs float64 trig can flip pixels sitting exactly on a
        # floor boundary — allow a tiny disagreement budget
        assert (got != expect).mean() < 0.01


def nuscenes_like_lidar2img(img_h=900, img_w=1600):
    """Six cameras with nuScenes-like geometry: five ~65deg-FOV cams
    (fx=1266) at yaws 0/±55/±110 deg and one ~90deg back cam (fx=809),
    mounted ~1.5 m from the ego center at 1.6 m height."""
    yaws = np.deg2rad([0.0, 55.0, -55.0, 110.0, -110.0, 180.0])
    fxs = [1266.4, 1266.4, 1266.4, 1266.4, 1266.4, 809.2]
    l2is = []
    for yaw, fx in zip(yaws, fxs):
        zc = np.array([np.cos(yaw), np.sin(yaw), 0.0])   # view dir
        yc = np.array([0.0, 0.0, -1.0])                  # image down
        xc = np.cross(yc, zc)                            # image right
        r_c2l = np.stack([xc, yc, zc], axis=1)
        t = 1.5 * zc + np.array([0.0, 0.0, 1.6])
        l2c = np.eye(4)
        l2c[:3, :3] = r_c2l.T
        l2c[:3, 3] = -r_c2l.T @ t
        k = np.eye(4)
        k[0, 0], k[1, 1] = fx, fx
        k[0, 2], k[1, 2] = img_w / 2.0, img_h / 2.0
        l2is.append(k @ l2c)
    return np.stack(l2is).astype(np.float32)


class TestSCACoverage:
    """The static top-K budget loses zero hit queries on realistic
    6-camera geometry (VERDICT r1 #9; reference dynamic rebatching
    spatial_cross_attention.py:137-166)."""

    PCR = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]

    def _bev_mask(self, bev_h, bev_w):
        from distillbev_tpu.models.transformer.encoder import (
            get_reference_points_3d, point_sampling)
        ref3d = jnp.asarray(
            get_reference_points_3d(bev_h, bev_w, z=8.0,
                                    num_points_in_pillar=4))
        l2i = jnp.asarray(nuscenes_like_lidar2img())[None]
        _, mask = point_sampling(ref3d, self.PCR, l2i, (900, 1600))
        return np.asarray(mask)          # [N_cam, B, Q, P]

    def test_default_budget_covers_every_hit_query(self):
        bev_h = bev_w = 50               # same wedge fractions as 200
        mask = self._bev_mask(bev_h, bev_w)
        q = bev_h * bev_w
        hit_q = (mask.sum(-1) > 0).sum(-1)[:, 0]      # per camera
        frac = hit_q / q
        # every camera must fit the default K = 0.4*Q with real margin
        assert frac.max() <= 0.35, frac
        # sanity: the geometry is real — every camera sees something,
        # and every BEV query is seen by at least one camera
        assert frac.min() > 0.05, frac
        seen = (mask.sum(-1) > 0).any(0)
        assert seen.mean() > 0.99

    def test_budgeted_equals_dense_sca(self, rng):
        """SCA with the default K=0.4Q budget reproduces the dense K=Q
        result bit-for-bit up to scatter order — i.e. the top-K
        selection drops no contributing query."""
        from distillbev_tpu.models.transformer.attention import \
            SpatialCrossAttention
        bev_h = bev_w = 16
        q = bev_h * bev_w
        c, n_cam, d = 32, 6, 4
        mask = self._bev_mask(bev_h, bev_w)               # [N,1,Q,P]
        from distillbev_tpu.models.transformer.encoder import (
            get_reference_points_3d, point_sampling)
        ref3d = jnp.asarray(get_reference_points_3d(
            bev_h, bev_w, z=8.0, num_points_in_pillar=d))
        l2i = jnp.asarray(nuscenes_like_lidar2img())[None]
        ref_cam, bev_mask = point_sampling(ref3d, self.PCR, l2i,
                                           (900, 1600))
        shapes = ((8, 8),)
        query = jnp.asarray(rng.randn(1, q, c), jnp.float32)
        value = jnp.asarray(rng.randn(1, n_cam, 64, c), jnp.float32)
        da_cfg = dict(num_heads=4, num_levels=1, num_points=4)
        key = jax.random.PRNGKey(0)
        dense = SpatialCrossAttention(
            embed_dims=c, num_cams=n_cam, deformable_attention=da_cfg,
            max_queries_per_cam=q)
        budget = SpatialCrossAttention(
            embed_dims=c, num_cams=n_cam, deformable_attention=da_cfg,
            max_queries_per_cam=2 * q // 5)
        vs = dense.init(key, query, value, ref_cam, bev_mask, shapes)
        out_d = dense.apply(vs, query, value, ref_cam, bev_mask, shapes)
        out_b = budget.apply(vs, query, value, ref_cam, bev_mask,
                             shapes)
        np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_b),
                                   rtol=1e-5, atol=1e-5)


def test_grid_mask_active_in_train_path(rng):
    """use_grid_mask=True must actually mask pixels during training
    (regression: the train path passed no rng, silently disabling the
    flagship recipe's GridMask)."""
    from distillbev_tpu.models import build_detector
    model_on = build_detector({**tiny_bevformer_cfg(),
                               "use_grid_mask": True})
    model_off = build_detector({**tiny_bevformer_cfg(),
                                "use_grid_mask": False})
    b, t, n, h, w = 1, 1, 2, 32, 32
    imgs = jnp.asarray(rng.randn(b, t, n, h, w, 3), jnp.float32)
    can_bus = jnp.zeros((b, t, 18))
    l2i = jnp.tile(jnp.eye(4)[None, None, None], (b, t, n, 1, 1))
    prev = jnp.zeros((b, t))
    key = jax.random.PRNGKey(0)
    vs = model_off.init({"params": key}, imgs, can_bus, l2i, prev)

    def feats(m, seed):
        out, _ = m.apply(
            vs, imgs[:, 0], train=True,
            rngs={"dropout": jax.random.PRNGKey(seed)},
            mutable=["batch_stats"],
            method=m.extract_img_feat)
        return out

    # grid_mask applies with prob 0.7 per draw — try several keys so
    # the test can't be defeated by an unlucky no-apply draw
    diff = 0.0
    for seed in range(6):
        f_on = feats(model_on, seed)
        f_off = feats(model_off, seed)
        diff = max(diff, max(float(jnp.abs(a - b).max())
                             for a, b in zip(f_on, f_off)))
        if diff > 0:
            break
    assert diff > 0, "grid_mask had no effect in the train path"


def test_seq_img_encoder_matches_batched(rng):
    """Camera-scanned image encoding equals the batched pass exactly
    under norm_eval=True (per-camera batches see the same running BN
    statistics)."""
    from distillbev_tpu.models import build_detector
    base = tiny_bevformer_cfg()
    base["img_backbone"]["norm_eval"] = True
    m_batched = build_detector({**base, "seq_img_encoder": False})
    m_seq = build_detector({**base, "seq_img_encoder": True})
    b, n, h, w = 1, 2, 32, 32
    imgs = jnp.asarray(rng.randn(b, n, h, w, 3), jnp.float32)
    vs = m_batched.init(jax.random.PRNGKey(0), imgs[:, None].repeat(
        1, axis=1), jnp.zeros((b, 1, 18)),
        jnp.tile(jnp.eye(4)[None, None, None], (b, 1, n, 1, 1)),
        jnp.zeros((b, 1)))
    f_b = m_batched.apply(vs, imgs, train=True,
                          rngs={"dropout": jax.random.PRNGKey(1)},
                          mutable=["batch_stats"],
                          method=m_batched.extract_img_feat)[0]
    f_s = m_seq.apply(vs, imgs, train=True,
                      rngs={"dropout": jax.random.PRNGKey(1)},
                      mutable=["batch_stats"],
                      method=m_seq.extract_img_feat)[0]
    for a, c in zip(f_b, f_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-5, atol=1e-5)
