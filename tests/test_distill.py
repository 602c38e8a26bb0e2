"""Distillation engine tests: masks (golden values), FGD loss E2E,
teacher-frozen gradients (SURVEY.md §7 stage 5)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from distillbev_tpu.models import build_detector
from distillbev_tpu.models.distill import masks as M
from distillbev_tpu.models.detectors.bevdet import ImgInputs

from test_model_centerpoint import tiny_centerpoint_cfg, make_batch
from test_model_bevdepth import tiny_bevdepth4d_cfg, make_inputs


class TestMasks:

    def test_foreground_mask_golden(self):
        """Axis-aligned box covering known cells; grid 8x8, voxel 1, osf 1,
        pc_range starts at 0 -> pixel (row y, col x) covers [x, y]."""
        gt = jnp.asarray([[[2.5, 4.5, 0.0, 2.0, 1.0, 1.5, 0.0, 0, 0]]])
        mask = jnp.ones((1, 1), bool)
        fg, fg_scale, bg_scale = M.foreground_scale_mask(
            gt, mask, 8, 8, (1.0, 1.0, 4.0), (0.0, 0.0, -5, 8.0, 8.0, 3),
            (8, 8, 1))
        fg = np.asarray(fg)[0]
        # box x in [1.5, 3.5], y in [4, 5]; pixel coords are corners
        # (offset 0): pixel (y=4..5 rows? coords y=4,5), x=2,3
        on = np.argwhere(fg > 0)
        assert set(map(tuple, on)) == {(4, 2), (4, 3), (5, 2), (5, 3)}
        # fg_scale = sqrt(cell/box) = sqrt(1 / 2)
        assert abs(float(np.asarray(fg_scale)[0, 4, 2]) -
                   np.sqrt(0.5)) < 1e-5
        # bg_scale = 1 / (64 - 4)
        assert abs(float(np.asarray(bg_scale)[0, 0, 0]) - 1 / 60) < 1e-6

    def test_first_box_owns_pixel(self):
        """Overlapping boxes: scale comes from the lower-index box."""
        gt = jnp.asarray([[
            [2.0, 2.0, 0.0, 4.0, 4.0, 1.0, 0.0, 0, 0],   # area 16
            [2.0, 2.0, 0.0, 2.0, 2.0, 1.0, 0.0, 0, 0],   # area 4
        ]])
        mask = jnp.ones((1, 2), bool)
        _, fg_scale, _ = M.foreground_scale_mask(
            gt, mask, 8, 8, (1.0, 1.0, 4.0), (0.0, 0.0, -5, 8.0, 8.0, 3),
            (8, 8, 1))
        # pixel (2,2) inside both -> scale from box 0: sqrt(1/16)
        assert abs(float(np.asarray(fg_scale)[0, 2, 2]) - 0.25) < 1e-5

    def test_spatial_attention_normalized(self, rng):
        feat = jnp.asarray(rng.randn(2, 4, 4, 8).astype(np.float32))
        att = M.spatial_attention(feat, 0.5)
        assert att.shape == (2, 4, 4)
        # softmax * H*W sums to H*W
        assert np.allclose(np.asarray(att.sum(axis=(1, 2))), 16.0,
                           atol=1e-4)

    def test_channel_attention_normalized(self, rng):
        feat = jnp.asarray(rng.randn(2, 4, 4, 8).astype(np.float32))
        att = M.channel_attention(feat, 0.5)
        assert att.shape == (2, 8)
        assert np.allclose(np.asarray(att.sum(axis=1)), 8.0, atol=1e-4)

    def test_resize_mask_roundtrip(self):
        m = jnp.zeros((1, 4, 4)).at[0, 1, 2].set(1.0)
        up = M.resize_mask(m, (8, 8))
        assert float(up[0, 2, 4]) == 1.0 and float(up[0, 3, 5]) == 1.0
        down = M.resize_mask(up, (4, 4))
        assert np.allclose(np.asarray(down), np.asarray(m))

    def test_connected_components(self):
        fp = np.zeros((1, 8, 8), np.float32)
        fp[0, 1, 1:4] = 1          # component of 3
        fp[0, 5:7, 6] = 1          # component of 2
        scale = np.asarray(M.connected_component_scale(jnp.asarray(fp)))
        assert abs(scale[0, 1, 2] - 1 / 3) < 1e-6
        assert abs(scale[0, 5, 6] - 1 / 2) < 1e-6
        assert scale[0, 0, 0] == 0

    def test_fp_modes(self):
        fg = jnp.zeros((1, 4, 4))
        gt_hm = jnp.zeros((1, 4, 4))
        t_hm = jnp.zeros((1, 4, 4)).at[0, 1, 1].set(0.9)
        s_hm = jnp.zeros((1, 4, 4)).at[0, 2, 2].set(0.9)
        fp_t = M.fp_mask_from_heatmaps("teacher", fg, gt_hm, t_hm, s_hm,
                                       0.5)
        assert float(fp_t[0, 1, 1]) == 1.0 and float(fp_t[0, 2, 2]) == 0.0
        fp_ts = M.fp_mask_from_heatmaps("teacher_selected_student", fg,
                                        gt_hm, t_hm, s_hm, 0.5)
        assert float(fp_ts[0, 2, 2]) == 1.0 and float(fp_ts[0, 1, 1]) == 0.0


def distill_cfg():
    cfg = tiny_bevdepth4d_cfg()
    cfg["type"] = "BEVDepth4DDistill"
    cfg["distill_type"] = "fgd"
    cfg["distill_params"] = dict(
        student_channels=[32], teacher_channels=[32],
        spatial_t=0.5, spatial_student_ratio=1.0, channel_t=0.5,
        fg_feat_loss_weights=[1.5e-3], bg_feat_loss_weights=[4e-2],
        channel_loss_weights=[0.25], spatial_loss_weights=[2.5e-3],
        adaptation_type="1x1conv",
        student_adaptation_params=dict(kernel_size=1, stride=1,
                                       upsample_factor=4),
        teacher_adaptation_type="identity",
        teacher_adaptation_params=dict(kernel_size=4, stride=4),
        spatial_attentions=["teacher"],
        feat_criterion=dict(type="MSELoss", reduction="none"),
        spatial_criterion=dict(type="L1Loss", reduction="none"),
        channel_criterion=dict(type="L1Loss", reduction="none"),
        transpose_mask=False, foreground_mask="gt",
        background_mask="logical_not", scale_mask="combine_gt",
        spatial_mask=True, channel_mask=True,
        student_feat_pos=["head"], teacher_feat_pos=["head"],
        two_stage_epoch=-1, affinity_weights=[0], affinity_mode="none",
        affinity_criterion=dict(type="SmoothL1Loss"), affinity_split=1,
        non_empty_weight=0, output_threshold=1.0,
        groundtruth_threshold=None, fp_as_foreground="none",
        fp_weight=0, fp_epoch=0, multi_scale_epoch=-1,
        fp_scale_mode="dfs", gauss_fg_weight=-1e10,
        context_length=0, context_weight=0)
    return cfg


class TestFGDDistill:

    def _setup(self, rng, fp_mode="none", non_empty=0.0):
        # teacher: tiny centerpoint with 32ch neck output to match student
        tcfg = tiny_centerpoint_cfg()
        teacher = build_detector(tcfg)
        pts, mask, gt, labels, gmask = make_batch(rng, b=1)
        tvars = teacher.init(jax.random.PRNGKey(1), pts, mask)
        t_preds, t_bundle = teacher.apply(tvars, pts, mask)

        cfg = distill_cfg()
        if fp_mode != "none":
            cfg["distill_params"]["fp_as_foreground"] = fp_mode
            cfg["distill_params"]["fp_weight"] = 1e-3
            cfg["distill_params"]["output_threshold"] = 0.3
        if non_empty:
            cfg["distill_params"]["non_empty_weight"] = non_empty
        # teacher neck 32ch at 16x16 == student head 32ch at 16x16
        model = build_detector(cfg)
        inputs = make_inputs(rng)
        variables = model.init(jax.random.PRNGKey(0), inputs, t_bundle,
                               method="init_with_teacher")
        return (model, variables, inputs, teacher, tvars, t_preds,
                t_bundle, gt, labels, gmask)

    def test_distill_losses_finite(self, rng):
        (model, variables, inputs, teacher, tvars, t_preds, t_bundle,
         gt, labels, gmask) = self._setup(rng)
        preds, bundle, depth = model.apply(variables, inputs)
        heatmaps, _, _, _ = model.apply(
            variables, gt, labels, gmask,
            method=lambda m, *a: m.bbox_head.get_targets(*a))
        losses = model.apply(
            variables, bundle, preds, t_bundle, t_preds, gt, labels,
            gmask, heatmaps, jnp.float32(5.0),
            method="distill_losses")
        expected = {"kd_fg_feat_loss_head_head",
                    "kd_bg_feat_loss_head_head",
                    "kd_channel_loss_head_head",
                    "kd_spatial_loss_head_head"}
        assert expected <= set(losses)
        for k, v in losses.items():
            assert np.isfinite(float(v)), k

    def test_grads_flow_to_student_and_adaptations_not_teacher(self, rng):
        (model, variables, inputs, teacher, tvars, t_preds, t_bundle,
         gt, labels, gmask) = self._setup(rng)

        def loss_fn(params, teacher_params):
            t_preds2, t_bundle2 = teacher.apply(
                {"params": teacher_params,
                 "batch_stats": tvars.get("batch_stats", {})},
                *make_batch(np.random.RandomState(0), b=1)[:2])
            v = {"params": params,
                 "batch_stats": variables.get("batch_stats", {})}
            preds, bundle, _ = model.apply(v, inputs)
            heatmaps, _, _, _ = model.apply(
                v, gt, labels, gmask,
                method=lambda m, *a: m.bbox_head.get_targets(*a))
            losses = model.apply(
                v, bundle, preds, t_bundle2, t_preds2, gt, labels,
                gmask, heatmaps, jnp.float32(5.0),
                method="distill_losses")
            return sum(jax.tree_util.tree_leaves(losses))

        g_student, g_teacher = jax.grad(loss_fn, argnums=(0, 1))(
            variables["params"], tvars["params"])
        s_norm = sum(float(jnp.abs(g).sum())
                     for g in jax.tree_util.tree_leaves(g_student))
        t_norm = sum(float(jnp.abs(g).sum())
                     for g in jax.tree_util.tree_leaves(g_teacher))
        assert s_norm > 0
        assert t_norm == 0.0          # stop_gradient wall
        # adaptation params received gradient
        adapt = g_student["distiller"]
        a_norm = sum(float(jnp.abs(g).sum())
                     for g in jax.tree_util.tree_leaves(adapt))
        assert a_norm > 0

    def test_fp_and_nonempty_branches(self, rng):
        (model, variables, inputs, teacher, tvars, t_preds, t_bundle,
         gt, labels, gmask) = self._setup(rng, fp_mode="teacher",
                                          non_empty=0.1)
        preds, bundle, _ = model.apply(variables, inputs)
        heatmaps, _, _, _ = model.apply(
            variables, gt, labels, gmask,
            method=lambda m, *a: m.bbox_head.get_targets(*a))
        losses = model.apply(
            variables, bundle, preds, t_bundle, t_preds, gt, labels,
            gmask, heatmaps, jnp.float32(5.0),
            method="distill_losses")
        assert "kd_fp_bg_feat_loss_head_head" in losses
        assert "kd_non_empty_bg_feat_loss_head_head" in losses
        for k, v in losses.items():
            assert np.isfinite(float(v)), k

    def test_fp_epoch_gating(self, rng):
        (model, variables, inputs, teacher, tvars, t_preds, t_bundle,
         gt, labels, gmask) = self._setup(rng, fp_mode="teacher")
        # set fp_epoch high: with epoch below it the fp loss must be 0
        preds, bundle, _ = model.apply(variables, inputs)
        heatmaps, _, _, _ = model.apply(
            variables, gt, labels, gmask,
            method=lambda m, *a: m.bbox_head.get_targets(*a))

        def run(epoch):
            return model.apply(
                variables, bundle, preds, t_bundle, t_preds, gt, labels,
                gmask, heatmaps, jnp.float32(epoch),
                method="distill_losses")

        # model was built with fp_epoch=0 so both run; rebuild with gate
        cfg = distill_cfg()
        cfg["distill_params"]["fp_as_foreground"] = "teacher"
        cfg["distill_params"]["fp_weight"] = 1e-3
        cfg["distill_params"]["output_threshold"] = 0.3
        cfg["distill_params"]["fp_epoch"] = 10
        model2 = build_detector(cfg)
        v2 = model2.init(jax.random.PRNGKey(0), inputs, t_bundle,
                         method="init_with_teacher")
        lo = model2.apply(v2, bundle, preds, t_bundle, t_preds, gt,
                          labels, gmask, heatmaps, jnp.float32(5.0),
                          method="distill_losses")
        hi = model2.apply(v2, bundle, preds, t_bundle, t_preds, gt,
                          labels, gmask, heatmaps, jnp.float32(15.0),
                          method="distill_losses")
        assert float(lo["kd_fp_bg_feat_loss_head_head"]) == 0.0
        # gated-on epoch may still be 0 if no FPs, but must be >= gated-off
        assert float(hi["kd_fp_bg_feat_loss_head_head"]) >= 0.0


class TestCameraTeacherDistill:
    """Camera(4D)->camera distill variants (reference
    bevdet_distill_more.py:624-807)."""

    def test_bevdepth4d_to_bevdet_step(self, rng):
        from distillbev_tpu.training import (DistillBatch,
                                             init_train_state,
                                             make_camera_distill_train_step)
        from distillbev_tpu.training.optim import build_optimizer
        from distillbev_tpu.training.schedules import build_lr_schedule

        teacher = build_detector(tiny_bevdepth4d_cfg())
        inputs = make_inputs(rng)
        tvars = teacher.init(jax.random.PRNGKey(1), inputs)
        t_preds, t_bundle, _ = teacher.apply(tvars, inputs)

        cfg = distill_cfg()
        cfg["type"] = "BEVDepth4DtoBEVDetDistill"
        # single-frame BEVDet student: plain LSS transformer (one bev
        # output), bev encoder consumes one frame's channels
        vt = dict(cfg["img_view_transformer"])
        vt["type"] = "ViewTransformerLiftSplatShoot"
        vt.pop("extra_depth_net", None)
        vt.pop("loss_depth_weight", None)
        cfg["img_view_transformer"] = vt
        cfg["img_bev_encoder_backbone"] = dict(
            cfg["img_bev_encoder_backbone"], numC_input=8)
        cfg.pop("pre_process", None)
        student = build_detector(cfg)
        svars = student.init(jax.random.PRNGKey(0), inputs, t_bundle,
                             method="init_with_teacher")

        lr = build_lr_schedule(dict(policy="step", step=[4]), 1e-3,
                               total_steps=10, steps_per_epoch=2)
        tx = build_optimizer(dict(type="AdamW", lr=1e-3), lr,
                             svars["params"])
        state = init_train_state(svars["params"],
                                 svars.get("batch_stats", {}), tx)
        pts, mask, gt, labels, gmask = make_batch(rng, b=1)
        batch = DistillBatch(inputs, pts, mask, gt, labels, gmask)
        step = jax.jit(make_camera_distill_train_step(
            student, teacher, tx, use_depth_loss=False))
        state, metrics = step(state, tvars, batch, jnp.float32(1.0))
        assert np.isfinite(float(metrics["total_loss"]))
        assert any(k.startswith("kd_") for k in metrics)


class TestParityTail:
    """Round-2 parity tail: transpose_mask, bbox FP-as-FG,
    selector-based inheritance, unknown-key rejection."""

    def test_transpose_mask(self):
        gt = jnp.asarray([[[2.5, 4.5, 0.0, 2.0, 1.0, 1.5, 0.0, 0, 0]]])
        mask = jnp.ones((1, 1), bool)
        args = (gt, mask, 8, 8, (1.0, 1.0, 4.0),
                (0.0, 0.0, -5, 8.0, 8.0, 3), (8, 8, 1))
        fg, fgs, bgs = M.foreground_scale_mask(*args)
        fg_t, fgs_t, bgs_t = M.foreground_scale_mask(
            *args, transpose=True)
        assert np.allclose(np.asarray(fg_t)[0],
                           np.asarray(fg)[0].T)
        assert np.allclose(np.asarray(fgs_t)[0],
                           np.asarray(fgs)[0].T)

    def test_fp_bbox_masks(self):
        """Confident teacher box outside GT -> FP pixels; inside GT or
        low-score -> none (reference add_fp_as_fg_bbox:573-647)."""
        vs = (1.0, 1.0, 4.0)
        pcr = (0.0, 0.0, -5, 8.0, 8.0, 3)
        gt = jnp.asarray([[[2.0, 2.0, 0.0, 2.0, 2.0, 1.0, 0.0, 0, 0]]])
        gm = jnp.ones((1, 1), bool)
        tb = jnp.asarray([[
            [6.0, 6.0, 0.0, 2.0, 2.0, 1.0, 0.0, 0, 0],  # FP (conf)
            [2.0, 2.0, 0.0, 2.0, 2.0, 1.0, 0.0, 0, 0],  # inside GT
            [6.0, 2.0, 0.0, 2.0, 2.0, 1.0, 0.0, 0, 0],  # low score
        ]])
        ts = jnp.asarray([[0.9, 0.9, 0.05]])
        tv = jnp.ones((1, 3), bool)
        fp, fps, n = M.fp_bbox_masks(tb, ts, tv, gt, gm, 8, 8, vs, pcr,
                                     (8, 8, 1), output_threshold=0.1,
                                     center_offset=0.5)
        fp = np.asarray(fp)[0]
        on = set(map(tuple, np.argwhere(fp > 0)))
        # box at (6,6) size 2: covers cell centers x,y in {5.5, 6.5}
        assert on == {(5, 5), (5, 6), (6, 5), (6, 6)}, on
        assert float(n[0]) == 4
        assert abs(float(np.asarray(fps)[0, 5, 5]) - 0.25) < 1e-6
        # GT-covered cells are never FP
        assert fp[1, 1] == 0 and fp[2, 2] == 0
        # low-score box contributed nothing
        assert fp[1, 5] == 0 and fp[2, 6] == 0

    def test_inherit_selectors(self):
        from distillbev_tpu.training.param_utils import \
            inherit_params_by_selectors
        t = {"head": {"decoder": {"layer_0": {"kernel":
                                              np.ones((3, 3))}},
                      "query_embedding": np.full((4, 8), 2.0),
                      "cls_0_out": {"kernel": np.full((3, 2), 3.0)}}}
        s = {"bbox_head": {"transformer": {"decoder": {"layer_0": {
            "kernel": np.zeros((3, 3))}}},
            "query_embedding": np.zeros((4, 8)),
            "cls_0_out": {"kernel": np.zeros((3, 2))},
            "other": np.zeros(5)}}
        out = inherit_params_by_selectors(
            s, t, [r"decoder", r"query_embedding", r"cls_\d+_.*"])
        assert np.all(np.asarray(
            out["bbox_head"]["transformer"]["decoder"]["layer_0"]
            ["kernel"]) == 1)
        assert np.all(np.asarray(
            out["bbox_head"]["query_embedding"]) == 2)
        assert np.all(np.asarray(
            out["bbox_head"]["cls_0_out"]["kernel"]) == 3)
        assert np.all(np.asarray(out["bbox_head"]["other"]) == 0)

    def test_unknown_distill_key_rejected(self):
        from distillbev_tpu.models.distill.fgd import Distiller
        d = Distiller(
            distill_type="fgd",
            distill_params=dict(
                student_channels=[8], teacher_channels=[8],
                adaptation_type="1x1conv",
                teacher_adaptation_type="identity",
                transposed_mask=True),   # typo'd key
            train_cfg_pts=dict(grid_size=[8, 8, 1],
                               voxel_size=[1, 1, 8],
                               point_cloud_range=[0, 0, -5, 8, 8, 3]))
        with pytest.raises(ValueError, match="transposed_mask"):
            d.init(jax.random.PRNGKey(0),
                   [jnp.zeros((1, 8, 8, 8))], [jnp.zeros((1, 8, 8, 8))])
