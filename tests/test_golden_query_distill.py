"""Torch-golden parity for the hs/query similarity distillation
(reference: mmdet3d/models/detectors/bevformer_distill.py:364-385).

The reference functions are transcribed verbatim in torch below and fed
the SAME random inputs as the repo's JAX implementations
(distillbev_tpu/models/distill/query_distill.py); values must agree to
fp32 tolerance.  The layout difference (reference [B, C, H, W] vs repo
[B, H, W, C]) is bridged by an explicit transpose of the shared input.
"""
import os.path as osp
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from distillbev_tpu.models.distill.query_distill import (  # noqa: E402
    hs_distill_loss, query_distill_loss)


# -- reference transcription (torch) -------------------------------------

def ref_query_distill_loss(teacher_feat, teacher_query, teacher_hs,
                           student_feat, student_query, student_hs,
                           criterion, weight):
    """bevformer_distill.py:364-374, with build_loss(query_criterion)
    passed in as ``criterion``."""
    teacher_feat = teacher_feat.reshape(
        teacher_feat.shape[0], teacher_feat.shape[1], -1).permute(0, 2, 1)
    student_feat = student_feat.reshape(
        student_feat.shape[0], student_feat.shape[1], -1).permute(0, 2, 1)
    teacher_query_sim = (
        teacher_feat @ teacher_query[:, teacher_query.shape[1] // 2:].T
    ).sum(dim=-1)
    student_query_sim = (
        student_feat @ student_query[:, student_query.shape[1] // 2:].T
    ).sum(dim=-1)
    teacher_hs_sim = torch.einsum(
        'bij,bjkl->bikl', teacher_feat,
        teacher_hs.permute(1, 3, 0, 2)).sum(dim=-1)
    student_hs_sim = torch.einsum(
        'bij,bjkl->bikl', student_feat,
        student_hs.permute(1, 3, 0, 2)).sum(dim=-1)
    query_loss = criterion(teacher_query_sim, student_query_sim) + \
        criterion(teacher_hs_sim, student_hs_sim)
    return {'query_loss': query_loss * weight}


def ref_hs_distill_loss(teacher_feat, student_feat, criterion, weight):
    """bevformer_distill.py:376-385."""
    student_B, student_C, _ = student_feat.size()
    hs_feat_loss = criterion(student_feat, teacher_feat).sum() \
        * weight / student_B
    return {'hs_feat_loss': hs_feat_loss}


def _inputs(seed=0, B=2, C=32, H=10, W=10, Q=24, L=6):
    rng = np.random.RandomState(seed)
    return dict(
        t_feat=rng.randn(B, H, W, C).astype(np.float32),
        s_feat=rng.randn(B, H, W, C).astype(np.float32),
        t_query=rng.randn(Q, 2 * C).astype(np.float32),
        s_query=rng.randn(Q, 2 * C).astype(np.float32),
        t_hs=rng.randn(L, B, Q, C).astype(np.float32),
        s_hs=rng.randn(L, B, Q, C).astype(np.float32))


@pytest.mark.parametrize("crit", [
    dict(type="L1Loss"), dict(type="MSELoss"),
    dict(type="SmoothL1Loss", beta=1.0)])
def test_query_distill_golden(crit):
    d = _inputs()
    w = 0.7
    got = query_distill_loss(
        jnp.asarray(d["t_feat"]), jnp.asarray(d["t_query"]),
        jnp.asarray(d["t_hs"]), jnp.asarray(d["s_feat"]),
        jnp.asarray(d["s_query"]), jnp.asarray(d["s_hs"]),
        query_criterion=crit, query_loss_weight=w)

    tf = torch.nn.functional
    torch_crit = {
        "L1Loss": tf.l1_loss, "MSELoss": tf.mse_loss,
        "SmoothL1Loss": tf.smooth_l1_loss}[crit["type"]]
    # reference layout is channels-second
    ref = ref_query_distill_loss(
        torch.from_numpy(d["t_feat"]).permute(0, 3, 1, 2),
        torch.from_numpy(d["t_query"]),
        torch.from_numpy(d["t_hs"]),
        torch.from_numpy(d["s_feat"]).permute(0, 3, 1, 2),
        torch.from_numpy(d["s_query"]),
        torch.from_numpy(d["s_hs"]),
        criterion=torch_crit, weight=w)
    np.testing.assert_allclose(
        float(got["query_loss"]), float(ref["query_loss"]),
        rtol=2e-5, atol=2e-4)


def test_hs_distill_golden():
    d = _inputs(seed=3)
    w = 1.3
    # squeezed decoder stacks at B=1 (the reference's only working
    # shape: its 3-value unpack requires a 3-dim squeezed tensor)
    t_hs = d["t_hs"][:, :1].squeeze(1)     # [L, Q, C]
    s_hs = d["s_hs"][:, :1].squeeze(1)
    got = hs_distill_loss(
        jnp.asarray(t_hs)[:, None], jnp.asarray(s_hs)[:, None],
        feat_criterion=dict(type="L1Loss", reduction="none"),
        hs_feat_loss_weights=w)
    ref = ref_hs_distill_loss(
        torch.from_numpy(t_hs), torch.from_numpy(s_hs),
        criterion=lambda a, b: torch.nn.functional.l1_loss(
            a, b, reduction="none"), weight=w)
    np.testing.assert_allclose(
        float(got["hs_feat_loss"]), float(ref["hs_feat_loss"]),
        rtol=2e-5, atol=2e-4)


def test_detector_gating_produces_reference_keys():
    """query_criterion != 'none' in distill_params turns the similarity
    losses on inside BEVFormerDistill's loss dict, and ('hs','hs') feat
    positions dispatch to hs_distill_loss (reference gates
    bevformer_distill.py:835-837, :898-918)."""
    import jax
    from test_model_bevformer import (tiny_bevformer_cfg, BEV_H, BEV_W,
                                      EMBED, PCR)
    from distillbev_tpu.models import build_detector

    rng = np.random.RandomState(0)
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
        student_feat_pos=["head", "hs"],
        teacher_feat_pos=["head", "hs"],
        affinity_weights=[0], affinity_mode="none",
        fp_as_foreground="none", fp_weight=0, fp_epoch=0,
        output_threshold=1.0, non_empty_weight=0,
        multi_scale_epoch=-1, two_stage_epoch=-1,
        context_length=0, context_weight=0,
        query_criterion=dict(type="L1Loss"), query_loss_weight=0.5,
        hs_feat_loss_weights=2.0)
    cfg["train_cfg"] = dict(pts=dict(
        grid_size=[BEV_H, BEV_W, 1], voxel_size=[2.0, 2.0, 8],
        point_cloud_range=PCR, out_size_factor=1))
    model = build_detector(cfg)

    B, N, H, W = 1, 2, 32, 32
    imgs = jnp.asarray(rng.randn(B, 1, N, H, W, 3).astype(np.float32))
    can_bus = jnp.zeros((B, 1, 18), jnp.float32)
    l2i = jnp.tile(jnp.eye(4), (B, 1, N, 1, 1)).astype(jnp.float32)
    prev_exists = jnp.zeros((B, 1), jnp.float32)
    inputs = (imgs, can_bus, l2i, prev_exists)
    t_bev = jnp.asarray(rng.randn(B, BEV_H, BEV_W,
                                  EMBED).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), *inputs, t_bev,
                           method="init_with_teacher")
    outs, _ = model.apply(variables, *inputs)
    boxes = jnp.zeros((B, 3, 9), jnp.float32)
    labels = jnp.zeros((B, 3), jnp.int32)
    mask = jnp.zeros((B, 3), bool)
    t_outs = {"hs": outs["hs"] * 0.9,
              "query_embed": outs["query_embed"] * 1.1}
    losses = model.apply(
        variables, outs, t_outs, t_bev, boxes, labels, mask,
        jnp.float32(1.0), BEV_H, BEV_W,
        method="distill_losses_bevformer")
    assert any(k.startswith("query_loss") for k in losses), \
        list(losses)
    assert any("hs_feat_loss_hs_hs" in k for k in losses), list(losses)
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
