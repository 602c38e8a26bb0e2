"""Torch-golden parity for the alternative distill types (VERDICT r4 #2:
s2m2_ssd_*, linfengzhang, gauss_focal_heatmap previously validated only
as 'finite').

Each reference loss is transcribed verbatim in torch —
``dist2``/``linfengzhang_distill_loss`` (reference
bevdet_distill.py:34-46, 379-494), ``all_distill_loss`` (:494-505),
``s2m2_ssd_mask``/``s2m2_ssd_heatmap_distill_loss`` (:506-573),
``s2m2_ssd_feature_distill_loss`` (:620-690),
``gauss_focal_heatmap_distill_loss`` (:573-610),
``non_local_distill_loss`` (:677-700) — and compared value-level
against the repo's ``Distiller`` with copied adaptation weights.
"""
import os.path as osp
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))

torch = pytest.importorskip("torch")
F = torch.nn.functional

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from distillbev_tpu.models.distill.fgd import Distiller  # noqa: E402

H = W = 12
C_T, C_S = 8, 6
B = 2
TRAIN_CFG = dict(grid_size=[12, 12, 1], voxel_size=[0.5, 0.5, 8],
                 point_cloud_range=[-3, -3, -5, 3, 3, 3],
                 out_size_factor=1)


def clip_sigmoid_t(x):
    return torch.clamp(x.sigmoid(), min=1e-4, max=1 - 1e-4)


def to_t(x):
    return torch.from_numpy(np.ascontiguousarray(np.moveaxis(x, -1, 1)))


def torch_crit_str(name):
    return {"l1": lambda a, b: F.l1_loss(a, b, reduction="none"),
            "smoothl1": lambda a, b: F.smooth_l1_loss(
                a, b, reduction="none"),
            "mse": lambda a, b: F.mse_loss(a, b, reduction="none")}[name]


def conv_w(params, *path):
    node = params
    for p in path:
        node = node[p]
    k = np.asarray(node["kernel"])
    if k.ndim == 4:
        return (torch.from_numpy(k.transpose(3, 2, 0, 1).copy()),
                torch.from_numpy(np.asarray(node["bias"]).copy()))
    return (torch.from_numpy(k.T.copy()),
            torch.from_numpy(np.asarray(node["bias"]).copy()))


def make_feats(seed=0, hm_tasks=(2, 1)):
    rng = np.random.RandomState(seed)
    d = dict(
        t_feat=rng.randn(B, H, W, C_T).astype(np.float32),
        s_feat=rng.randn(B, H, W, C_S).astype(np.float32),
        gt_hms=[rng.uniform(0, 1, (B, k, H, W)).astype(np.float32)
                for k in hm_tasks],
        t_preds=[dict(heatmap=rng.randn(B, H, W, k)
                      .astype(np.float32) * 2) for k in hm_tasks],
        s_preds=[dict(heatmap=rng.randn(B, H, W, k)
                      .astype(np.float32) * 2) for k in hm_tasks])
    # plant exact-1 peaks so gauss_focal num_pos is nonzero
    for hm in d["gt_hms"]:
        hm[:, :, 3, 4] = 1.0
    return d


def run_repo(distill_type, params, d, gt_boxes=None, gt_mask=None):
    dist = Distiller(distill_type=distill_type, distill_params=params,
                     train_cfg_pts=TRAIN_CFG)
    t = jnp.asarray(d["t_feat"])
    s = jnp.asarray(d["s_feat"])
    variables = dist.init(jax.random.PRNGKey(0), [t], [s])
    losses = dist.apply(
        variables, 0, t, s,
        jnp.zeros((B, 1, 9)) if gt_boxes is None else
        jnp.asarray(gt_boxes),
        jnp.zeros((B, 1), bool) if gt_mask is None else
        jnp.asarray(gt_mask),
        None,
        [jnp.asarray(h) for h in d["gt_hms"]],
        [{k: jnp.asarray(v) for k, v in p.items()}
         for p in d["t_preds"]],
        [{k: jnp.asarray(v) for k, v in p.items()}
         for p in d["s_preds"]],
        jnp.float32(5.0), method="distill_loss")
    return {k: float(np.asarray(v).mean()) for k, v in losses.items()}, \
        variables


# -- linfengzhang --------------------------------------------------------

def ref_dist2(a, b, mask=None):
    diff = (a - b) ** 2
    if mask is not None:
        diff = diff * mask
    diff = torch.sum(diff, dim=tuple(range(1, diff.dim()))) ** 0.5
    return diff.mean()


def test_linfengzhang_golden():
    params = dict(
        student_channels=[C_S], teacher_channels=[C_T],
        spatial_t=0.1, channel_t=0.1, spatial_student_ratio=1.0,
        feat_loss_weights=[6e-5], channel_loss_weights=[4e-3],
        spatial_loss_weights=[4e-3])
    d = make_feats(0)
    got, variables = run_repo("linfengzhang", params, d)
    p = variables["params"]

    t_feat, s_feat = to_t(d["t_feat"]), to_t(d["s_feat"])
    S_T, C_Temp = 0.1, 0.1
    t_att = torch.mean(torch.abs(t_feat), [1], keepdim=True)
    t_att = (torch.softmax(t_att.view(B, -1) / S_T, dim=1) *
             H * W).view(B, 1, H, W)
    c_t_att = torch.mean(torch.abs(t_feat), [2, 3], keepdim=True)
    c_t_att = (torch.softmax(c_t_att.view(B, -1) / C_Temp, dim=1) *
               C_T).view(B, C_T, 1, 1)
    aw, ab = conv_w(p, "adapt_0", "conv")
    adapted = F.conv2d(s_feat, aw, ab)
    kd_feat = ref_dist2(t_feat, adapted,
                        mask=t_att.detach() * c_t_att.detach()) * 6e-5
    cw, cb = conv_w(p, "channel_adapt_0")
    kd_channel = torch.dist(
        torch.mean(t_feat, [2, 3]),
        torch.mean(s_feat, [2, 3]) @ cw.T + cb) * 4e-3
    sw, sb = conv_w(p, "spatial_adapt_0")
    t_pool = torch.mean(t_feat, [1], keepdim=True)
    s_pool = torch.mean(s_feat, [1], keepdim=True)
    kd_spatial = torch.dist(
        t_pool, F.conv2d(s_pool, sw, sb, padding=1)) * 4e-3

    np.testing.assert_allclose(got["kd_feat_loss"], float(kd_feat),
                               rtol=2e-4)
    np.testing.assert_allclose(got["kd_channel_loss"], float(kd_channel),
                               rtol=2e-4)
    np.testing.assert_allclose(got["kd_spatial_loss"], float(kd_spatial),
                               rtol=2e-4)


# -- all -----------------------------------------------------------------

@pytest.mark.parametrize("p_norm", [1, 2])
def test_all_distill_golden(p_norm):
    params = dict(student_channels=[C_S], teacher_channels=[C_T],
                  feat_loss_weights=[0.7], p=p_norm,
                  adaptation_type="1x1conv")
    d = make_feats(1)
    got, variables = run_repo("all", params, d)
    aw, ab = conv_w(variables["params"], "adapt_0", "conv")
    adapted = F.conv2d(to_t(d["s_feat"]), aw, ab)
    if p_norm == 1:
        ref = F.l1_loss(adapted, to_t(d["t_feat"])) * 0.7
    else:
        ref = F.mse_loss(adapted, to_t(d["t_feat"])) * 0.7
    np.testing.assert_allclose(got["kd_feat_loss"], float(ref),
                               rtol=2e-4)


# -- s2m2 ----------------------------------------------------------------

def ref_s2m2_masks(gt_hms, s_preds, thres):
    gt = torch.cat(gt_hms, dim=1).max(dim=1, keepdim=True)[0]
    s = torch.cat([clip_sigmoid_t(p[0]["heatmap"]) for p in s_preds],
                  dim=1).max(dim=1, keepdim=True)[0].detach()
    tp = (gt > thres) & (s > thres)
    fp = (gt < thres) & (s > thres)
    fn = (gt > thres) & (s < thres)
    return tp, fp, fn


def test_s2m2_heatmap_golden():
    params = dict(student_channels=[C_S], teacher_channels=[C_T],
                  output_threshold=0.5, tp_weight=1.0, fpfn_weight=2.0,
                  criterion="l1")
    d = make_feats(2)
    got, _ = run_repo("s2m2_ssd_heatmap", params, d)

    gt_hms = [torch.from_numpy(h) for h in d["gt_hms"]]
    t_preds = [[dict(heatmap=to_t(p["heatmap"]))] for p in d["t_preds"]]
    s_preds = [[dict(heatmap=to_t(p["heatmap"]))] for p in d["s_preds"]]
    tp, fp, fn = ref_s2m2_masks(gt_hms, s_preds, 0.5)
    crit = torch_crit_str("l1")
    t_hm = torch.cat([clip_sigmoid_t(p[0]["heatmap"])
                      for p in t_preds], dim=1).max(1, keepdim=True)[0]
    s_hm = torch.cat([clip_sigmoid_t(p[0]["heatmap"])
                      for p in s_preds], dim=1).max(1, keepdim=True)[0]
    fpfn = torch.logical_or(fp, fn)
    tp_e = tp.expand_as(s_hm)
    fpfn_e = fpfn.expand_as(s_hm)
    tp_loss = (crit(s_hm * tp_e, t_hm * tp_e).sum(dim=(1, 2, 3)) * 1.0 /
               torch.sum(tp_e, dim=(1, 2, 3))).mean()
    fpfn_loss = (crit(s_hm * fpfn_e, t_hm).sum(dim=(1, 2, 3)) * 2.0 /
                 torch.sum(fpfn_e, dim=(1, 2, 3))).mean()
    np.testing.assert_allclose(
        got["s2m2_ssd_heatmap_kd_loss"], float(tp_loss + fpfn_loss),
        rtol=2e-4)


@pytest.mark.parametrize("mode", ["new", "old"])
def test_s2m2_feature_golden(mode):
    params = dict(student_channels=[C_S], teacher_channels=[C_T],
                  output_threshold=0.5, criterion="mse", mode=mode,
                  tp_weights=[1.0], fp_weights=[0.6], fn_weights=[0.8],
                  fpfn_weights=[0.7], adaptation_type="1x1conv")
    d = make_feats(3)
    got, variables = run_repo("s2m2_ssd_feature", params, d)
    aw, ab = conv_w(variables["params"], "adapt_0", "conv")

    gt_hms = [torch.from_numpy(h) for h in d["gt_hms"]]
    s_preds = [[dict(heatmap=to_t(p["heatmap"]))] for p in d["s_preds"]]
    tp, fp, fn = ref_s2m2_masks(gt_hms, s_preds, 0.5)
    crit = torch_crit_str("mse")
    t_feat = to_t(d["t_feat"])
    adapted = F.conv2d(to_t(d["s_feat"]), aw, ab)
    if mode == "old":
        fpfn = torch.logical_or(fp, fn)
        tp_e = tp.expand_as(t_feat)
        fpfn_e = fpfn.expand_as(t_feat)
        tp_loss = (crit(adapted * tp_e, t_feat * tp_e).sum(
            dim=(1, 2, 3)) * 1.0 / torch.sum(tp_e, dim=(1, 2, 3))).mean()
        fpfn_loss = (crit(adapted * fpfn_e, t_feat * fpfn_e).sum(
            dim=(1, 2, 3)) * 0.7 /
            torch.sum(fpfn_e, dim=(1, 2, 3))).mean()
        np.testing.assert_allclose(
            got["s2m2_ssd_feature_kd_loss"], float(tp_loss + fpfn_loss),
            rtol=2e-4)
    else:
        loss = crit(adapted, t_feat)

        def nanmean_masked(m, w_):
            m_e = m.expand_as(t_feat)
            per = (loss * m_e).sum(dim=(1, 2, 3)) * w_ / \
                torch.sum(m_e, dim=(1, 2, 3))
            keep = per[per.isnan().logical_not()]
            return keep.mean() if len(keep) else torch.zeros(())

        np.testing.assert_allclose(
            got["s2m2_ssd_feature_kd_tp_loss"],
            float(nanmean_masked(tp, 1.0)), rtol=2e-4)
        np.testing.assert_allclose(
            got["s2m2_ssd_feature_kd_fp_loss"],
            float(nanmean_masked(fp, 0.6)), rtol=2e-4)
        np.testing.assert_allclose(
            got["s2m2_ssd_feature_kd_fn_loss"],
            float(nanmean_masked(fn, 0.8)), rtol=2e-4)


def test_s2m2_feature_empty_mask_nan_skip():
    """A sample with an empty tp mask drops out of the mean (reference
    nan-filter) instead of diluting it with a zero."""
    params = dict(student_channels=[C_S], teacher_channels=[C_T],
                  output_threshold=0.5, criterion="mse", mode="new",
                  tp_weights=[1.0], fp_weights=[0.6], fn_weights=[0.8],
                  fpfn_weights=[0.7], adaptation_type="1x1conv")
    d = make_feats(4)
    # sample 1: gt heatmaps all zero -> tp and fn empty there
    for hm in d["gt_hms"]:
        hm[1] = 0.0
    got, variables = run_repo("s2m2_ssd_feature", params, d)
    aw, ab = conv_w(variables["params"], "adapt_0", "conv")
    gt_hms = [torch.from_numpy(h) for h in d["gt_hms"]]
    s_preds = [[dict(heatmap=to_t(p["heatmap"]))] for p in d["s_preds"]]
    tp, _, _ = ref_s2m2_masks(gt_hms, s_preds, 0.5)
    assert tp[1].sum() == 0 and tp[0].sum() > 0
    crit = torch_crit_str("mse")
    t_feat = to_t(d["t_feat"])
    adapted = F.conv2d(to_t(d["s_feat"]), aw, ab)
    loss = crit(adapted, t_feat)
    tp_e = tp.expand_as(t_feat)
    per0 = float((loss * tp_e)[0].sum() / tp_e[0].sum())
    np.testing.assert_allclose(
        got["s2m2_ssd_feature_kd_tp_loss"], per0, rtol=2e-4)


# -- gauss focal heatmap -------------------------------------------------

def test_gauss_focal_heatmap_golden():
    params = dict(student_channels=[C_S], teacher_channels=[C_T],
                  criterion=dict(type="GaussianFocalLoss",
                                 reduction="mean", loss_weight=1.0),
                  heatmap=True)
    d = make_feats(5)
    got, _ = run_repo("gauss_focal_heatmap", params, d)

    # reference: GaussianFocalLoss(student_hm, teacher_hm,
    #   avg_factor=num_pos) per task (bevdet_distill.py:573-610)
    def gauss_focal(pred, target, avg_factor, alpha=2.0, gamma=4.0):
        eps = 1e-12
        pos_w = target.eq(1).float()
        neg_w = (1 - target).pow(gamma)
        pos = -(pred + eps).log() * (1 - pred).pow(alpha) * pos_w
        neg = -(1 - pred + eps).log() * pred.pow(alpha) * neg_w
        return (pos + neg).sum() / avg_factor

    for tid in range(2):
        num_pos = float(torch.from_numpy(
            d["gt_hms"][tid]).eq(1).float().sum())
        t_hm = clip_sigmoid_t(to_t(d["t_preds"][tid]["heatmap"]))
        s_hm = clip_sigmoid_t(to_t(d["s_preds"][tid]["heatmap"]))
        ref = gauss_focal(s_hm, t_hm, max(num_pos, 1))
        np.testing.assert_allclose(
            got[f"task{tid}_kd_heatmap_loss"], float(ref), rtol=2e-3,
            err_msg=f"task {tid}")


# -- non_local -----------------------------------------------------------

def test_non_local_golden():
    params = dict(student_channels=[C_S], teacher_channels=[C_T],
                  nonlocal_weights=[0.9], criterion="l1",
                  adaptation_type="1x1conv")
    d = make_feats(6)
    got, variables = run_repo("non_local", params, d)
    p = variables["params"]

    def ref_non_local(x, scope):
        tw, tb = conv_w(p, scope, "theta")
        pw, pb = conv_w(p, scope, "phi")
        gw, gb = conv_w(p, scope, "g")
        ww, wb = conv_w(p, scope, "out")
        b, c, h, w = x.shape
        inter = tw.shape[0]
        theta = F.conv2d(x, tw, tb).reshape(b, inter, h * w)
        phi = F.conv2d(x, pw, pb).reshape(b, inter, h * w)
        g = F.conv2d(x, gw, gb).reshape(b, inter, h * w)
        attn = torch.softmax(
            torch.einsum("bcq,bck->bqk", theta, phi), dim=-1)
        y = torch.einsum("bqk,bck->bcq", attn, g).reshape(b, inter, h, w)
        return x + F.conv2d(y, ww, wb)

    s_rel = ref_non_local(to_t(d["s_feat"]), "student_nl_0")
    t_rel = ref_non_local(to_t(d["t_feat"]), "teacher_nl_0")
    aw, ab = conv_w(p, "adapt_0", "conv")
    crit = torch_crit_str("l1")
    ref = (crit(F.conv2d(s_rel, aw, ab), t_rel) * 0.9).mean()
    np.testing.assert_allclose(got["kd_nonlocal_loss"], float(ref),
                               rtol=2e-4)
