"""BEVDet-family distillation detectors (CNN student path).

Capability parity with the reference's distill engine
(reference: mmdet3d/models/detectors/bevdet_distill.py — BEVDetDistill:156
builds the teacher from ``teacher_config``/``teacher_ckpt`` and hides it
from the optimizer via a __setattr__ override:1599-1610; forward_distill
:1411-1507 pairs (student_pos, teacher_pos) features; and
bevdet_distill_more.py wires the 4D/depth student variants —
BEVDepth4DDistill:334 is the config-used flagship).

TPU-native design: the student + adaptation layers form ONE flax module
(this class); the frozen teacher lives in a separate module/param-tree
applied under ``jax.lax.stop_gradient`` by the train step — the JAX-native
equivalent of the reference's parameter-hiding trick (no optimizer mask
needed; teacher params simply aren't in the grad pytree).  Teacher
checkpoint loading and ``inherit_head`` are param-tree surgery at init
(training/param_utils.py), not module logic.

Epoch gates (fp_epoch / multi_scale_epoch / two_stage_epoch) take a traced
scalar epoch and multiply losses by 0/1 — no retracing at epoch edges.
"""
from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builder import DETECTORS
from ..distill.fgd import Distiller
from .bevdet import BEVDepth4D, BEVDepth, BEVDet, ImgInputs, \
    StudentFeatureBundle
from .centerpoint import FeatureBundle


class _DistillBase:
    """Mixin with the pairing + loss dispatch shared by all variants."""

    def _select_student_feat(self, pos: str,
                             bundle: StudentFeatureBundle) -> jnp.ndarray:
        if pos == "head":
            return bundle.neck_feat
        if pos == "lss":
            return bundle.lss_feat
        if pos.startswith("backbone"):
            return bundle.backbone_feats[int(pos[-1])]
        raise NotImplementedError(pos)

    def _select_teacher_feat(self, pos: str,
                             bundle: FeatureBundle) -> jnp.ndarray:
        # works for both LiDAR teachers (FeatureBundle) and camera
        # teachers (StudentFeatureBundle, used by the BEVDepth4Dto*
        # variants — reference bevdet_distill_more.py:624-807)
        if pos == "head":
            return bundle.neck_feat
        if pos == "canvas":
            return bundle.canvas
        if pos == "lss":
            return bundle.lss_feat
        if pos.startswith("backbone"):
            return bundle.backbone_feats[int(pos[-1])]
        raise NotImplementedError(pos)

    def distill_losses(self,
                       student_bundle: StudentFeatureBundle,
                       student_preds: List[Dict],
                       teacher_bundle: FeatureBundle,
                       teacher_preds: List[Dict],
                       gt_boxes: jnp.ndarray,
                       gt_labels: jnp.ndarray,
                       gt_mask: jnp.ndarray,
                       gt_heatmaps: List[jnp.ndarray],
                       epoch: jnp.ndarray,
                       train: bool = False,
                       return_maps: bool = False) -> Dict[str, jnp.ndarray]:
        """All (student_pos, teacher_pos) pairings -> loss dict
        (reference forward_distill:1411-1507).  ``return_maps=True``
        also returns {f"{s_pos}_{t_pos}": mask-map dict} for the
        ``--save_attention`` debug dump (reference tools/test.py:163)."""
        p = dict(self.distill_params)
        s_pos = list(p["student_feat_pos"])
        t_pos = list(p["teacher_feat_pos"])
        assert len(s_pos) == len(t_pos)
        ms_epoch = p.get("multi_scale_epoch", -1)
        two_stage = p.get("two_stage_epoch", -1)
        losses: Dict[str, jnp.ndarray] = {}
        all_maps: Dict[str, Dict[str, jnp.ndarray]] = {}
        # camera teachers (StudentFeatureBundle) have no scatter canvas
        canvas = getattr(teacher_bundle, "canvas", None)
        if canvas is not None:
            canvas = jax.lax.stop_gradient(canvas)
        for index, (sp, tp) in enumerate(zip(s_pos, t_pos)):
            s_feat = self._select_student_feat(sp, student_bundle)
            t_feat = jax.lax.stop_gradient(
                self._select_teacher_feat(tp, teacher_bundle))
            # FoV alignment assert (reference :1491-1494)
            s_stride = self.distiller.channel_wise_adaptations[
                index].stride if hasattr(
                self.distiller, "channel_wise_adaptations") else 1.0
            t_stride = self.distiller.teacher_adaptations[
                index].stride if hasattr(
                self.distiller, "teacher_adaptations") else 1.0
            assert abs(s_feat.shape[1] / s_stride -
                       t_feat.shape[1] / t_stride) < 1e-6, (
                f"FoV mismatch at index {index}: student "
                f"{s_feat.shape} /{s_stride} vs teacher "
                f"{t_feat.shape} /{t_stride}")
            idx_losses = self.distiller.distill_loss(
                index, t_feat, s_feat, gt_boxes, gt_mask, canvas,
                gt_heatmaps, teacher_preds, student_preds, epoch,
                train=train, return_maps=return_maps)
            if return_maps:
                idx_losses, all_maps[f"{sp}_{tp}"] = idx_losses
            gate = jnp.float32(1.0)
            if sp.startswith("backbone") and ms_epoch > 0:
                gate = gate * (epoch >= ms_epoch).astype(jnp.float32)
            if two_stage > 0:
                gate = gate * (epoch >= two_stage).astype(jnp.float32)
            for k, v in idx_losses.items():
                losses[f"{k}_{sp}_{tp}"] = v * gate
        if return_maps:
            return losses, all_maps
        return losses


@DETECTORS.register_module()
class BEVDepth4DDistill(BEVDepth4D, _DistillBase):
    """Flagship CNN-path distill student (reference
    bevdet_distill_more.py:334 + configs/lidar2camera_bev_distillation/
    centerpoint_pillar_to_bevdepth4d_r50/).

    Teacher-side fields (teacher_config/teacher_ckpt/self_ckpt) are
    consumed by the training assembly, not by this module.
    """
    teacher_config: Any = None
    teacher_ckpt: Any = None
    self_ckpt: Any = None
    distill_type: str = "fgd"
    distill_params: Any = None
    inherit_head: bool = False
    bevdepth_bev_forward: bool = False

    def setup(self):
        super().setup()
        self.distiller = Distiller(
            distill_type=self.distill_type,
            distill_params=self.distill_params,
            train_cfg_pts=(self.train_cfg or {}).get("pts"))

    def init_distiller(self, student_bundle: StudentFeatureBundle,
                       teacher_bundle: FeatureBundle,
                       train: bool = False):
        """Create adaptation params (called once under .init)."""
        p = dict(self.distill_params)
        s_feats = [self._select_student_feat(sp, student_bundle)
                   for sp in p["student_feat_pos"]]
        t_feats = [self._select_teacher_feat(tp, teacher_bundle)
                   for tp in p["teacher_feat_pos"]]
        return self.distiller(t_feats, s_feats, train=train)

    def init_with_teacher(self, inputs: ImgInputs,
                          teacher_bundle: FeatureBundle,
                          train: bool = False):
        """Single init entry touching both student and distiller params."""
        preds, bundle, depth = self(inputs, train=train)
        self.init_distiller(bundle, teacher_bundle, train=train)
        return preds, bundle, depth


@DETECTORS.register_module()
class BEVDepthDistill(BEVDepth, _DistillBase):
    teacher_config: Any = None
    teacher_ckpt: Any = None
    self_ckpt: Any = None
    distill_type: str = "fgd"
    distill_params: Any = None
    inherit_head: bool = False

    def setup(self):
        super().setup()
        self.distiller = Distiller(
            distill_type=self.distill_type,
            distill_params=self.distill_params,
            train_cfg_pts=(self.train_cfg or {}).get("pts"))

    def init_distiller(self, student_bundle, teacher_bundle,
                       train: bool = False):
        p = dict(self.distill_params)
        s_feats = [self._select_student_feat(sp, student_bundle)
                   for sp in p["student_feat_pos"]]
        t_feats = [self._select_teacher_feat(tp, teacher_bundle)
                   for tp in p["teacher_feat_pos"]]
        return self.distiller(t_feats, s_feats, train=train)

    def init_with_teacher(self, inputs, teacher_bundle,
                          train: bool = False):
        preds, bundle, depth = self(inputs, train=train)
        self.init_distiller(bundle, teacher_bundle, train=train)
        return preds, bundle, depth


@DETECTORS.register_module()
class BEVDetDistill(BEVDet, _DistillBase):
    teacher_config: Any = None
    teacher_ckpt: Any = None
    self_ckpt: Any = None
    distill_type: str = "fgd"
    distill_params: Any = None
    inherit_head: bool = False

    def setup(self):
        super().setup()
        self.distiller = Distiller(
            distill_type=self.distill_type,
            distill_params=self.distill_params,
            train_cfg_pts=(self.train_cfg or {}).get("pts"))

    def init_distiller(self, student_bundle, teacher_bundle,
                       train: bool = False):
        p = dict(self.distill_params)
        s_feats = [self._select_student_feat(sp, student_bundle)
                   for sp in p["student_feat_pos"]]
        t_feats = [self._select_teacher_feat(tp, teacher_bundle)
                   for tp in p["teacher_feat_pos"]]
        return self.distiller(t_feats, s_feats, train=train)

    def init_with_teacher(self, inputs, teacher_bundle,
                          train: bool = False):
        preds, bundle, depth = self(inputs, train=train)
        self.init_distiller(bundle, teacher_bundle, train=train)
        return preds, bundle, depth


def _first_frame_inputs(inputs: ImgInputs) -> ImgInputs:
    """4D-formatted (doubled) camera inputs -> key-frame-only inputs
    (the BEVDepth4Dto* students consume only frame 0; the 4D camera
    TEACHER sees both frames — reference bevdet_distill_more.py:626-660)."""
    n = inputs.rots.shape[2]
    return inputs._replace(
        imgs=inputs.imgs[:, :n],
        rots=inputs.rots[:, :1], trans=inputs.trans[:, :1],
        intrins=inputs.intrins[:, :1], post_rots=inputs.post_rots[:, :1],
        post_trans=inputs.post_trans[:, :1])


@DETECTORS.register_module()
class BEVDet4DDistill(BEVDepth4DDistill):
    """4D temporal student distill without depth supervision
    (reference bevdet_distill_more.py:16-166; the depth head presence is
    governed by the view-transformer config here)."""


@DETECTORS.register_module()
class BEVDepth4DReproduceOfficialDistill(BEVDepth4DDistill):
    """BEVDepth4DDistill with the reproduce-official Megvii DepthNet
    view transformer (reference bevdet_distill_more.py:526-621; the
    transformer class is selected by img_view_transformer.type)."""


@DETECTORS.register_module()
class BEVDepth4DtoBEVDetDistill(BEVDetDistill):
    """Camera(4D)->camera(BEVDet) distillation student: inputs arrive in
    doubled 4D format for the teacher; the student runs on the key frame
    (reference bevdet_distill_more.py:624-709)."""

    def extract_img_feat(self, inputs: ImgInputs, train: bool = False):
        return super().extract_img_feat(_first_frame_inputs(inputs),
                                        train=train)


@DETECTORS.register_module()
class BEVDepth4DtoBEVDepthDistill(BEVDepthDistill):
    """Camera(4D)->camera(BEVDepth) distillation student (reference
    bevdet_distill_more.py:712-807)."""

    def extract_img_feat(self, inputs: ImgInputs, train: bool = False):
        return super().extract_img_feat(_first_frame_inputs(inputs),
                                        train=train)
