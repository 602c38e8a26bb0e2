"""Distillation loss engine — FGD and the alternative distill types.

Capability parity with the reference's distillation core
(reference: mmdet3d/models/detectors/bevdet_distill.py —
dist2:34, linfengzhang_distill_loss:379, all_distill_loss:494,
s2m2_ssd_mask:512, s2m2_ssd_heatmap/feature:531/620, gauss_focal:573,
non_local:677, affinity:703, fgd_distill_loss:973-1324,
distill_loss dispatch:1365-1409).

TPU-native notes:
* every mask is computed on device (see masks.py);
* epoch gates (fp_epoch / multi_scale_epoch / two_stage_epoch,
  reference tools/epoch_based_runner_modified.py:49-52) take the epoch as
  a *traced scalar* and gate by multiplying with 0/1 — no recompilation
  at epoch boundaries and no python control flow in the jit graph;
* the affinity loss selects a *fixed* top-K pixel set (masked Gram
  matrices) instead of the reference's dynamic boolean gather — padded
  rows are zeroed in both teacher and student so they cancel; the
  normalizer uses the true valid count.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builder import build_loss
from ..losses import clip_sigmoid
from . import masks as M
from .adaptations import StudentAdaptation, TeacherAdaptation


def _per_index(val, index):
    """Reference pattern: list param indexed when len>1 else [0]."""
    if isinstance(val, (list, tuple)):
        return val[index] if len(val) > 1 else val[0]
    return val


def _dist2(a, b, mask=None):
    """mean over batch of sqrt(sum masked squared diff) (reference
    dist2:34-46)."""
    diff = jnp.square(a - b)
    if mask is not None:
        diff = diff * mask
    per = jnp.sqrt(jnp.maximum(
        diff.reshape(diff.shape[0], -1).sum(axis=-1), 1e-12))
    return per.mean()


def _frob(a, b):
    """torch.dist(a, b): global L2 norm of the difference."""
    return jnp.sqrt(jnp.maximum(jnp.square(a - b).sum(), 1e-12))


class Distiller(nn.Module):
    """Holds all trainable adaptation layers + computes distill losses.

    Feature maps are channels-last [B, H, W, C].
    """
    distill_type: str
    distill_params: Any
    train_cfg_pts: Any                 # dict with grid_size/voxel_size/pc_range
    center_offset: float = 0.0         # 0.5 for the BEVFormer variant

    def _p(self, key, default=None):
        d = dict(self.distill_params)
        return d.get(key, default)

    # Every distill_params key any consumer reads.  An unknown key in a
    # config is a hard error: silently ignoring a knob the user set
    # (e.g. a typo'd transpose_mask) is the worst failure mode —
    # SURVEY §7 lists these as the details that "silently decide mAP".
    KNOWN_KEYS = frozenset({
        "adaptation_type", "affinity_attention_topk",
        "affinity_criterion", "affinity_max_pixels", "affinity_mode",
        "affinity_split", "affinity_weights", "avg_fg_scale_mask",
        "background_mask", "bg_feat_loss_weights", "channel_criterion",
        "channel_loss_weights", "channel_mask", "channel_t",
        "context_length", "context_weight", "criterion",
        "custom_radius_func", "custom_radius_scale", "feat_criterion",
        "feat_loss_weights", "fg_feat_loss_weights", "fn_weights",
        "foreground_mask", "fp_as_foreground", "fp_epoch",
        "fp_scale_mode", "fp_weight", "fp_weights", "fpfn_weight",
        "fpfn_weights", "gauss_fg_weight", "groundtruth_threshold",
        "heatmap", "hs_feat_loss_weights", "hs_weight", "mode",
        "multi_scale_epoch",
        "non_empty_weight", "nonlocal_weights", "output_threshold",
        "p", "query_criterion", "query_loss_weight", "query_weight",
        "scale_mask", "spatial_attentions",
        "spatial_criterion", "spatial_loss_weights", "spatial_mask",
        "spatial_student_ratio", "spatial_t",
        "student_adaptation_params", "student_channels",
        "student_feat_pos", "teacher_adaptation_params",
        "teacher_adaptation_type", "teacher_channels",
        "teacher_feat_pos", "tp_weight", "tp_weights",
        "transpose_mask", "two_stage_epoch",
    })

    def setup(self):
        p = dict(self.distill_params)
        unknown = sorted(set(p) - self.KNOWN_KEYS)
        if unknown:
            raise ValueError(
                f"unknown distill_params keys {unknown} — these would "
                "be silently ignored; remove them or add support")
        sc = list(p.get("student_channels", []))
        tc = list(p.get("teacher_channels", []))
        n = len(sc)

        if self.distill_type == "fgd":
            at = p["adaptation_type"]
            at = [at] * n if isinstance(at, str) else list(at)
            tat = p["teacher_adaptation_type"]
            tat = [tat] * n if isinstance(tat, str) else list(tat)
            self.channel_wise_adaptations = [
                StudentAdaptation(at[i], tc[i],
                                  p.get("student_adaptation_params"),
                                  name=f"student_adapt_{i}")
                for i in range(n)]
            self.teacher_adaptations = [
                TeacherAdaptation(tat[i], sc[i],
                                  p.get("teacher_adaptation_params"),
                                  name=f"teacher_adapt_{i}")
                for i in range(n)]
            if p.get("spatial_mask", True):
                self.spatial_wise_adaptations = [
                    nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)),
                            name=f"spatial_adapt_{i}") for i in range(n)]
        elif self.distill_type == "linfengzhang":
            self.adaptation_layers = [
                StudentAdaptation("1x1conv", tc[i], None,
                                  name=f"adapt_{i}") for i in range(n)]
            self.channel_wise_adaptations = [
                nn.Dense(tc[i], name=f"channel_adapt_{i}")
                for i in range(n)]
            self.spatial_wise_adaptations = [
                nn.Conv(1, (3, 3), padding=((1, 1), (1, 1)),
                        name=f"spatial_adapt_{i}") for i in range(n)]
        elif self.distill_type in ("all", "foreground_background",
                                   "s2m2_ssd_feature", "non_local"):
            at = p.get("adaptation_type", "1x1conv")
            at = [at] * n if isinstance(at, str) else list(at)
            self.adaptation_layers = [
                StudentAdaptation(at[i], tc[i],
                                  p.get("student_adaptation_params"),
                                  name=f"adapt_{i}") for i in range(n)]
            if self.distill_type == "non_local":
                from ..utils.non_local import NonLocalBlock
                self.student_non_locals = [
                    NonLocalBlock(name=f"student_nl_{i}")
                    for i in range(n)]
                self.teacher_non_locals = [
                    NonLocalBlock(name=f"teacher_nl_{i}")
                    for i in range(n)]

    # -- called by init to create all params ---------------------------
    def __call__(self, teacher_feats: Sequence[jnp.ndarray],
                 student_feats: Sequence[jnp.ndarray],
                 train: bool = False):
        outs = []
        for i, (t, s) in enumerate(zip(teacher_feats, student_feats)):
            if hasattr(self, "channel_wise_adaptations") and \
                    self.distill_type == "fgd":
                tt = self.teacher_adaptations[i](t, train=train)
                ss = self.channel_wise_adaptations[i](s, train=train)
                if hasattr(self, "spatial_wise_adaptations"):
                    sp = self.spatial_wise_adaptations[i](
                        ss.mean(axis=-1, keepdims=True))
                    outs.append((tt, ss, sp))
                else:
                    outs.append((tt, ss))
            elif hasattr(self, "adaptation_layers"):
                outs.append(self.adaptation_layers[i](s, train=train))
                if self.distill_type == "linfengzhang":
                    self.channel_wise_adaptations[i](s.mean(axis=(1, 2)))
                    self.spatial_wise_adaptations[i](
                        s.mean(axis=-1, keepdims=True))
                if self.distill_type == "non_local":
                    self.student_non_locals[i](s)
                    self.teacher_non_locals[i](t)
        return outs

    # ------------------------------------------------------------------
    def distill_loss(self, index: int,
                     teacher_feat: jnp.ndarray,
                     student_feat: jnp.ndarray,
                     gt_boxes: jnp.ndarray,
                     gt_mask: jnp.ndarray,
                     canvas_feat: Optional[jnp.ndarray],
                     gt_heatmaps: Optional[List[jnp.ndarray]],
                     teacher_preds: Optional[List[Dict]],
                     student_preds: Optional[List[Dict]],
                     epoch: jnp.ndarray,
                     train: bool = False,
                     fp_override=None,
                     return_maps: bool = False) -> Dict[str, jnp.ndarray]:
        """Dispatch one (student_pos, teacher_pos) pairing's losses
        (reference distill_loss:1365-1409).  ``fp_override`` is a
        precomputed (fp_mask, fp_scale, fp_count) triple — the
        transformer path mines FPs from decoded teacher boxes instead
        of heatmaps (reference add_fp_as_fg_bbox).

        ``return_maps=True`` additionally returns the intermediate
        mask/attention maps for the ``--save_attention`` debug dump
        (reference tools/test.py:163 + bevdet_distill.py:1193-1249);
        only the fgd type produces maps."""
        t = self.distill_type
        if t == "fgd":
            return self.fgd_loss(index, teacher_feat, student_feat,
                                 gt_boxes, gt_mask, canvas_feat,
                                 gt_heatmaps, teacher_preds, student_preds,
                                 epoch, train=train,
                                 fp_override=fp_override,
                                 return_maps=return_maps)
        if t == "all":
            losses = self.all_loss(index, teacher_feat, student_feat,
                                   train)
        elif t == "foreground_background":
            losses = self.fg_bg_loss(index, teacher_feat, student_feat,
                                     gt_boxes, gt_mask, train)
        elif t == "linfengzhang":
            losses = self.linfengzhang_loss(index, teacher_feat,
                                            student_feat, train)
        elif t == "s2m2_ssd_heatmap":
            losses = self.s2m2_heatmap_loss(gt_heatmaps, teacher_preds,
                                            student_preds)
        elif t == "s2m2_ssd_feature":
            losses = self.s2m2_feature_loss(index, teacher_feat,
                                            student_feat, gt_heatmaps,
                                            student_preds, train)
        elif t == "gauss_focal_heatmap":
            losses = self.gauss_focal_loss(gt_heatmaps, teacher_preds,
                                           student_preds)
        elif t == "non_local":
            losses = self.non_local_loss(index, teacher_feat,
                                         student_feat, train)
        elif t == "affinity":
            losses = self.affinity_loss(index, teacher_feat, student_feat)
        else:
            raise NotImplementedError(t)
        return (losses, {}) if return_maps else losses

    # -- fgd (the headline recipe) -------------------------------------
    def fgd_loss(self, index, teacher_feat, student_feat, gt_boxes,
                 gt_mask, canvas_feat, gt_heatmaps, teacher_preds,
                 student_preds, epoch, train=False, fp_override=None,
                 return_maps=False):
        p = dict(self.distill_params)
        s_t = p["spatial_t"]
        s_ratio = p["spatial_student_ratio"]
        c_t = p["channel_t"]
        w_fg = _per_index(p["fg_feat_loss_weights"], index)
        w_bg = _per_index(p["bg_feat_loss_weights"], index)
        w_ch = _per_index(p["channel_loss_weights"], index)
        w_sp = _per_index(p["spatial_loss_weights"], index)
        spatial_att = _per_index(p["spatial_attentions"], index)
        feat_crit = build_loss(dict(p["feat_criterion"]))
        sp_crit = build_loss(dict(p["spatial_criterion"]))
        ch_crit = build_loss(dict(p["channel_criterion"]))
        losses: Dict[str, jnp.ndarray] = {}

        teacher_feat = self.teacher_adaptations[index](teacher_feat,
                                                       train=train)
        student_feat = self.channel_wise_adaptations[index](student_feat,
                                                            train=train)
        b, h, w, c_s = student_feat.shape
        tb, th, tw, c_tch = teacher_feat.shape
        assert (b, h, w) == (tb, th, tw), (student_feat.shape,
                                           teacher_feat.shape)

        tc = dict(self.train_cfg_pts)
        fg_mask, fg_scale, bg_scale = M.foreground_scale_mask(
            gt_boxes, gt_mask, h, w, tc["voxel_size"],
            tc["point_cloud_range"], tc["grid_size"],
            avg_fg_scale_mask=p.get("avg_fg_scale_mask", False),
            context_length=p.get("context_length", 0),
            context_weight=p.get("context_weight", 0),
            center_offset=self.center_offset,
            transpose=p.get("transpose_mask", False))
        fg_mode = p.get("foreground_mask", "gt")
        fg_scale2 = None
        if fg_mode != "gt":
            # gauss-family extended FG masks (reference
            # bevdet_distill.py:1019-1078)
            rf = {"centerpoint1": "centerpoint1",
                  "centerpoint2": "centerpoint2",
                  "centerpoint3": "centerpoint3",
                  "maxwh": "maxwh"}.get(
                p.get("custom_radius_func", "centerpoint2"),
                "centerpoint2")
            fg2, fg_scale2 = M.extended_foreground_masks(
                gt_boxes, gt_mask, h, w, tc["voxel_size"],
                tc["point_cloud_range"], tc["grid_size"],
                radius_func=rf,
                radius_scale=p.get("custom_radius_scale", 1.0),
                gaussian_overlap=tc.get("gaussian_overlap", 0.1),
                min_radius=tc.get("min_radius", 2))
            if fg_mode == "gauss":
                fg_mask = fg2
            elif fg_mode == "extended_binary":
                fg_mask = (fg2 != 0).astype(jnp.float32)
            elif fg_mode == "gauss_plus_extended_binary":
                fg_mask = fg2 + (fg2 != 0).astype(jnp.float32)
            elif fg_mode == "gauss_plus_extended_binary_clamp":
                fg_mask = jnp.clip(
                    fg2 + (fg2 != 0).astype(jnp.float32), 0.0, 1.0)
            elif fg_mode == "gauss_plus_binary_clamp":
                fg_mask = jnp.clip(
                    p.get("gauss_fg_weight", 1.0) * fg2 +
                    (fg_mask != 0).astype(jnp.float32), 0.0, 1.0)
            elif fg_mode == "gauss_in_gt":
                fg_mask = fg_mask * fg2
            elif fg_mode == "negative_linear_gauss_in_gt":
                fg2b = fg2 + w_bg / w_fg * (1 - fg2)
                fg_mask = fg_mask * fg2b
            else:
                raise NotImplementedError(fg_mode)
            fg_mask = jax.lax.stop_gradient(fg_mask)

        t_att = M.spatial_attention(teacher_feat, s_t)
        s_att = M.spatial_attention(student_feat, s_t)
        c_t_att = M.channel_attention(teacher_feat, c_t)
        if spatial_att == "teacher":
            sum_att = t_att
        elif spatial_att == "teacher_student":
            sum_att = (t_att + s_att * s_ratio) / (1 + s_ratio)
        else:
            raise NotImplementedError(spatial_att)
        sum_att = jax.lax.stop_gradient(sum_att)

        if p.get("background_mask", "logical_not") == "logical_not":
            bg_mask = (fg_mask == 0).astype(jnp.float32)
        elif p["background_mask"] == "1minus":
            bg_mask = 1.0 - fg_mask
        else:
            raise NotImplementedError(p["background_mask"])

        # -- FP-as-FG mining, epoch gated ------------------------------
        fp_mode = _per_index(p.get("fp_as_foreground", "none"), index)
        fp_gate = (epoch >= p.get("fp_epoch", 0)).astype(jnp.float32)
        fp_mask = jnp.zeros_like(fg_mask)
        fp_scale = jnp.zeros_like(fg_mask)
        fp_count = jnp.zeros((b,), jnp.float32)
        if fp_mode != "none" and fp_override is not None:
            # bbox-decoded FPs (transformer path,
            # reference bevformer_distill.py:736-743)
            fp_mask, fp_scale, fp_count = fp_override
            fp_mask = jnp.where(fg_mask == 0, fp_mask, 0.0) * fp_gate
            bg_mask = jnp.where(fp_mask != 0, 0.0, bg_mask)
            bg_n = h * w - fg_mask.sum(axis=(1, 2))
            denom = bg_n - fp_count
            bg_scale_fp = jnp.where(
                denom > 0, 1.0 / jnp.maximum(denom, 1.0), 0.0)
            bg_scale = jnp.where(
                fp_gate > 0, bg_scale_fp[:, None, None], bg_scale)
        elif fp_mode != "none":
            gt_hm_max = jnp.concatenate(gt_heatmaps, axis=1).max(axis=1)
            t_hm_max = M.heatmap_channel_max(teacher_preds, clip=True)
            s_hm_max = M.heatmap_channel_max(student_preds, clip=True)
            common = (t_hm_max.shape[1], t_hm_max.shape[2])
            s_hm_max = M.resize_mask(s_hm_max, common)
            gt_hm_max = M.resize_mask(gt_hm_max, common)
            fp = M.fp_mask_from_heatmaps(
                fp_mode, M.resize_mask(fg_mask, common), gt_hm_max,
                t_hm_max, s_hm_max, p["output_threshold"],
                p.get("groundtruth_threshold"))
            fp = M.resize_mask(fp, (h, w))
            fp = jnp.where(fg_mask == 0, fp, 0.0)
            fp_mask = fp * fp_gate
            if p.get("fp_scale_mode", "average") == "dfs":
                fp_scale = M.connected_component_scale(fp_mask)
            else:
                fp_scale = M.fp_scale_average(fp_mask)
            fp_count = fp_mask.sum(axis=(1, 2))
            # fp pixels leave the background set; bg renormalizes
            bg_mask = jnp.where(fp_mask != 0, 0.0, bg_mask)
            bg_n = h * w - fg_mask.sum(axis=(1, 2))
            denom = bg_n - fp_count
            bg_scale_fp = jnp.where(
                denom > 0, 1.0 / jnp.maximum(denom, 1.0), 0.0)
            bg_scale = jnp.where(
                fp_gate > 0, bg_scale_fp[:, None, None], bg_scale)

        # -- non-empty background boost --------------------------------
        ne_weight = p.get("non_empty_weight", 0)
        ne_mask = None
        ne_scale = None
        if ne_weight != 0:
            assert canvas_feat is not None
            ne_mask = M.non_empty_background(canvas_feat, fg_mask)
            bg_mask = jnp.where(ne_mask != 0, 0.0, bg_mask)
            bg_n = h * w - fg_mask.sum(axis=(1, 2))
            ne_n = ne_mask.sum(axis=(1, 2))
            denom = bg_n - ne_n - (fp_count if fp_mode != "none" else 0.0)
            bg_scale = jnp.where(
                denom > 0, 1.0 / jnp.maximum(denom, 1.0),
                0.0)[:, None, None] * jnp.ones_like(bg_scale)
            ne_scale = jnp.where(
                ne_mask > 0,
                1.0 / jnp.maximum(ne_n, 1.0)[:, None, None], 0.0)

        # -- scale-mask combination ------------------------------------
        scale_mode = p.get("scale_mask", "combine_gt")
        fg_m = fg_mask
        bg_m = bg_mask
        if scale_mode == "combine_gt":
            scale = jnp.maximum(fg_scale, bg_scale)
            fg_m = fg_m * scale
            bg_m = bg_m * scale
        elif scale_mode == "separate_gt":
            fg_m = fg_m * fg_scale
            bg_m = bg_m * bg_scale
        elif scale_mode == "combine_extend":
            scale = jnp.maximum(fg_scale2, bg_scale)
            fg_m = fg_m * scale
            bg_m = bg_m * scale
        elif scale_mode == "separate_extend":
            fg_m = fg_m * fg_scale2
            bg_m = bg_m * bg_scale
        elif scale_mode == "bg_only":
            fg_m = fg_m * bg_scale
            bg_m = bg_m * bg_scale
        elif scale_mode:
            raise NotImplementedError(scale_mode)

        if p.get("spatial_mask", True):
            fg_m = fg_m * sum_att
            bg_m = bg_m * sum_att
        ch_mask = None
        if p.get("channel_mask", True):
            ch_mask = c_t_att[:, None, None, :]    # [B,1,1,C]

        diff = feat_crit(student_feat, teacher_feat)   # elementwise
        fg_w = fg_m[..., None]
        bg_w = bg_m[..., None]
        if ch_mask is not None:
            fg_w = fg_w * ch_mask
            bg_w = bg_w * ch_mask
        losses["kd_fg_feat_loss"] = (diff * fg_w).sum() * w_fg / b
        losses["kd_bg_feat_loss"] = (diff * bg_w).sum() * w_bg / b

        if p.get("channel_mask", True):
            losses["kd_channel_loss"] = ch_crit(
                teacher_feat.mean(axis=(1, 2)),
                student_feat.mean(axis=(1, 2))).sum() * w_ch / b
        if p.get("spatial_mask", True):
            t_pool = teacher_feat.mean(axis=-1, keepdims=True)
            s_pool = student_feat.mean(axis=-1, keepdims=True)
            s_pool = self.spatial_wise_adaptations[index](s_pool)
            losses["kd_spatial_loss"] = sp_crit(
                t_pool, s_pool).sum() * w_sp / b

        if fp_mode != "none":
            fp_w = (fp_mask * fp_scale * sum_att)[..., None]
            if ch_mask is not None:
                fp_w = fp_w * ch_mask
            losses["kd_fp_bg_feat_loss"] = \
                (diff * fp_w).sum() * p["fp_weight"] / b
        if ne_weight != 0:
            ne_w = (ne_mask * ne_scale * sum_att)[..., None]
            if ch_mask is not None:
                ne_w = ne_w * ch_mask
            losses["kd_non_empty_bg_feat_loss"] = \
                (diff * ne_w).sum() * ne_weight / b

        aff_mode = _per_index(p.get("affinity_mode", "none"), index)
        if aff_mode != "none":
            if aff_mode == "foreground":
                sel = fg_mask != 0
            elif aff_mode == "foreground+fp":
                sel = (fg_mask != 0) | (fp_mask != 0)
            elif aff_mode == "attention":
                k = p.get("affinity_attention_topk", 256)
                thr_k = jnp.sort(
                    sum_att.reshape(b, -1), axis=-1)[:, -k][:, None, None]
                sel = sum_att > thr_k
            else:
                raise NotImplementedError(aff_mode)
            losses.update(self._affinity_on_mask(
                index, teacher_feat, student_feat, sel))
        if return_maps:
            # debug/visualization surface (reference save_attention /
            # save_foreground_mask, bevdet_distill.py:1076-1082,
            # 1193-1249): every mask the loss saw, plus the adapted
            # feature pair it compared
            maps = dict(
                fg_mask=fg_mask, bg_mask=bg_mask,
                fg_weight=fg_m, bg_weight=bg_m,
                spatial_attention_teacher=t_att,
                spatial_attention_student=s_att,
                spatial_attention=sum_att,
                channel_attention_teacher=c_t_att,
                teacher_feat=teacher_feat, student_feat=student_feat)
            if fp_mode != "none":
                maps["fp_mask"] = fp_mask
                maps["fp_scale"] = fp_scale
            if ne_mask is not None:
                maps["non_empty_bg_mask"] = ne_mask
            return losses, maps
        return losses

    # -- alternative distill types -------------------------------------
    def all_loss(self, index, teacher_feat, student_feat, train):
        p = dict(self.distill_params)
        w = p["feat_loss_weights"][index]
        s = self.adaptation_layers[index](student_feat, train=train)
        if p.get("p", 2) == 1:
            loss = jnp.abs(s - teacher_feat).mean() * w
        else:
            loss = jnp.square(s - teacher_feat).mean() * w
        return {"kd_feat_loss": loss}

    def fg_bg_loss(self, index, teacher_feat, student_feat, gt_boxes,
                   gt_mask, train):
        """'foreground_background' plain masked L2 (reference
        foreground_background_distill_loss:1327-1363)."""
        p = dict(self.distill_params)
        w_fg = _per_index(p["fg_feat_loss_weights"], index)
        w_bg = _per_index(p["bg_feat_loss_weights"], index)
        s = self.adaptation_layers[index](student_feat, train=train)
        b, h, w, _ = s.shape
        tc = dict(self.train_cfg_pts)
        fg, fg_scale, bg_scale = M.foreground_scale_mask(
            gt_boxes, gt_mask, h, w, tc["voxel_size"],
            tc["point_cloud_range"], tc["grid_size"],
            center_offset=self.center_offset)
        diff = jnp.square(s - teacher_feat)
        scale = jnp.maximum(fg_scale, bg_scale)
        fg_w = (fg * scale)[..., None]
        bg_w = ((1 - fg) * scale)[..., None]
        return {
            "kd_fg_feat_loss": (diff * fg_w).sum() * w_fg / b,
            "kd_bg_feat_loss": (diff * bg_w).sum() * w_bg / b,
        }

    def linfengzhang_loss(self, index, teacher_feat, student_feat, train):
        p = dict(self.distill_params)
        s_t, c_t = p["spatial_t"], p["channel_t"]
        w_feat = p["feat_loss_weights"][index]
        w_sp = p["spatial_loss_weights"][index]
        b, h, w, c = teacher_feat.shape
        t_att = M.spatial_attention(teacher_feat, s_t)
        c_t_att = M.channel_attention(teacher_feat, c_t)
        mask = t_att[..., None] * c_t_att[:, None, None, :]
        adapted = self.adaptation_layers[index](student_feat, train=train)
        losses = {
            "kd_feat_loss": _dist2(teacher_feat, adapted,
                                   mask=mask) * w_feat}
        losses["kd_channel_loss"] = _frob(
            teacher_feat.mean(axis=(1, 2)),
            self.channel_wise_adaptations[index](
                student_feat.mean(axis=(1, 2)))) * w_sp
        t_pool = teacher_feat.mean(axis=-1, keepdims=True)
        s_pool = student_feat.mean(axis=-1, keepdims=True)
        losses["kd_spatial_loss"] = _frob(
            t_pool, self.spatial_wise_adaptations[index](s_pool)) * w_sp
        return losses

    def _s2m2_masks(self, gt_heatmaps, student_preds):
        p = dict(self.distill_params)
        thres = p["output_threshold"]
        gt_max = jnp.concatenate(gt_heatmaps, axis=1).max(axis=1)
        s_max = M.heatmap_channel_max(student_preds, clip=True)
        tp = (gt_max > thres) & (s_max > thres)
        fp = (gt_max < thres) & (s_max > thres)
        fn = (gt_max > thres) & (s_max < thres)
        return (tp.astype(jnp.float32), fp.astype(jnp.float32),
                fn.astype(jnp.float32))

    def _crit(self, name):
        name = name.lower()
        if name == "l1":
            return lambda a, b: jnp.abs(a - b)
        if name == "smoothl1":
            return lambda a, b: jnp.where(
                jnp.abs(a - b) < 1.0, 0.5 * jnp.square(a - b),
                jnp.abs(a - b) - 0.5)
        if name == "mse":
            return lambda a, b: jnp.square(a - b)
        raise NotImplementedError(name)

    def s2m2_heatmap_loss(self, gt_heatmaps, teacher_preds, student_preds):
        p = dict(self.distill_params)
        crit = self._crit(p["criterion"])
        t_hm = M.heatmap_channel_max(teacher_preds, clip=True)
        s_hm = M.heatmap_channel_max(student_preds, clip=True)
        tp, fp, fn = self._s2m2_masks(gt_heatmaps, student_preds)
        fpfn = jnp.maximum(fp, fn)
        tp_loss = (crit(s_hm * tp, t_hm * tp).sum(axis=(1, 2)) *
                   p["tp_weight"] /
                   jnp.maximum(tp.sum(axis=(1, 2)), 1.0)).mean()
        fpfn_loss = (crit(s_hm * fpfn, t_hm).sum(axis=(1, 2)) *
                     p["fpfn_weight"] /
                     jnp.maximum(fpfn.sum(axis=(1, 2)), 1.0)).mean()
        return {"s2m2_ssd_heatmap_kd_loss": tp_loss + fpfn_loss}

    def s2m2_feature_loss(self, index, teacher_feat, student_feat,
                          gt_heatmaps, student_preds, train):
        p = dict(self.distill_params)
        crit = self._crit(p["criterion"])
        s = self.adaptation_layers[index](student_feat, train=train)
        tp, fp, fn = self._s2m2_masks(gt_heatmaps, student_preds)
        h, w = s.shape[1:3]
        tp = M.resize_mask(tp, (h, w))[..., None]
        fp = M.resize_mask(fp, (h, w))[..., None]
        fn = M.resize_mask(fn, (h, w))[..., None]
        loss = crit(s, teacher_feat)
        c = s.shape[-1]

        def masked(m, w_):
            # reference 'new' mode nan-skips samples with an empty mask
            # (bevdet_distill.py:676-688: per-sample losses that divide
            # by a zero count become nan and are dropped from the mean;
            # all-empty -> 0)
            cnt = m.sum(axis=(1, 2, 3)) * c
            num = (loss * m).sum(axis=(1, 2, 3)) * w_
            per = num / jnp.maximum(cnt, 1.0)
            valid = (cnt > 0).astype(per.dtype)
            n_valid = valid.sum()
            return jnp.where(
                n_valid > 0,
                (per * valid).sum() / jnp.maximum(n_valid, 1.0), 0.0)

        if p.get("mode", "new") == "old":
            fpfn = jnp.maximum(fp, fn)
            return {"s2m2_ssd_feature_kd_loss":
                    masked(tp, p["tp_weights"][index]) +
                    masked(fpfn, p["fpfn_weights"][index])}
        return {
            "s2m2_ssd_feature_kd_tp_loss": masked(tp,
                                                  p["tp_weights"][index]),
            "s2m2_ssd_feature_kd_fp_loss": masked(fp,
                                                  p["fp_weights"][index]),
            "s2m2_ssd_feature_kd_fn_loss": masked(fn,
                                                  p["fn_weights"][index]),
        }

    def gauss_focal_loss(self, gt_heatmaps, teacher_preds, student_preds):
        p = dict(self.distill_params)
        crit = build_loss(dict(p["criterion"]))
        losses = {}
        for tid, (tp, sp) in enumerate(zip(teacher_preds, student_preds)):
            num_pos = jnp.maximum((gt_heatmaps[tid] == 1.0).sum(), 1.0)
            t_hm = clip_sigmoid(tp["heatmap"])
            s_hm = clip_sigmoid(sp["heatmap"])
            losses[f"task{tid}_kd_heatmap_loss"] = crit(
                s_hm, jax.lax.stop_gradient(t_hm), avg_factor=num_pos)
        return losses

    def non_local_loss(self, index, teacher_feat, student_feat, train):
        p = dict(self.distill_params)
        w = p["nonlocal_weights"][index]
        crit = self._crit(p["criterion"])
        s_rel = self.student_non_locals[index](student_feat)
        t_rel = self.teacher_non_locals[index](teacher_feat)
        adapted = self.adaptation_layers[index](s_rel, train=train)
        return {"kd_nonlocal_loss": (crit(adapted, t_rel) * w).mean()}

    # -- affinity -------------------------------------------------------
    def affinity_loss(self, index, teacher_feat, student_feat):
        """Whole-map affinity (pixels x pixels Gram) distillation."""
        b = teacher_feat.shape[0]
        sel = jnp.ones(teacher_feat.shape[:3], bool)
        return self._affinity_on_mask(index, teacher_feat, student_feat,
                                      sel)

    def _affinity_on_mask(self, index, teacher_feat, student_feat, sel):
        p = dict(self.distill_params)
        weight = _per_index(p["affinity_weights"], index)
        crit = build_loss(dict(p.get("affinity_criterion",
                                     dict(type="SmoothL1Loss"))))
        split = int(p.get("affinity_split", 1))
        k = int(p.get("affinity_max_pixels", 1024))
        b, h, w, c = teacher_feat.shape
        sel_f = sel.reshape(b, h * w).astype(jnp.float32)
        # fixed top-K pixel selection (docstring)
        scores = sel_f + 1e-6 * jax.lax.stop_gradient(
            jnp.abs(teacher_feat).mean(-1).reshape(b, h * w))
        k = min(k, h * w)
        _, idx = jax.lax.top_k(scores, k)
        valid = jnp.take_along_axis(sel_f, idx, axis=1)      # [B, K]
        t = jnp.take_along_axis(
            teacher_feat.reshape(b, h * w, c), idx[..., None], axis=1)
        s = jnp.take_along_axis(
            student_feat.reshape(b, h * w, c), idx[..., None], axis=1)
        t = t * valid[..., None]
        s = s * valid[..., None]
        total = 0.0
        for i in range(split):
            ti, si, vi = t[:, i::split], s[:, i::split], valid[:, i::split]
            t_aff = jnp.einsum("bkc,blc->bkl", ti, ti)
            s_aff = jnp.einsum("bkc,blc->bkl", si, si)
            n_valid = jnp.maximum(vi.sum(axis=1), 1.0)
            per = crit(t_aff, s_aff, avg_factor=1.0) \
                if hasattr(crit, "reduction") and crit.reduction == "none" \
                else crit(t_aff, s_aff)
            if isinstance(per, jnp.ndarray) and per.ndim > 0:
                per = per.sum() / jnp.maximum((n_valid ** 2).sum(), 1.0)
            total = total + per * weight
        return {"kd_affinity_loss": total / split}
