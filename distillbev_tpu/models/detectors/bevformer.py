"""BEVFormer camera detector + its distillation variant.

Capability parity with the reference
(reference: mmdet3d/models/detectors/bevformer.py:17-290 — grid-mask
image aug, ``obtain_history_bev`` (no-grad BEV over the queue):156-174,
scene-token-aware test-time ``prev_frame_info``:233-266; and
bevformer_distill.py:1-1020 — fgd-only distill engine over bev_embed
pairs:898-905, teacher = LidarFormer/MVPFormer:851-858, bbox-based
FP-as-FG:573-647, hs/query distill:364-385, inherit head/decoder/query
:266-285).

TPU-native input protocol: the dataset queue arrives as
imgs [B, T, N, H, W, 3], can_bus [B, T, 18], lidar2img [B, T, N, 4, 4],
prev_bev_exists [B, T]; history BEV runs under stop_gradient inside the
same jit (the reference uses torch.no_grad + eval()).
"""
from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builder import (DETECTORS, build_backbone, build_head, build_neck)
from ..distill.fgd import Distiller
from ..utils.grid_mask import grid_mask
from .bevdet_distill import _DistillBase


class BEVFormerBundle(NamedTuple):
    bev_embed: jnp.ndarray       # [B, H*W, C]
    outs: Dict


@DETECTORS.register_module()
class BEVFormer(nn.Module):
    img_backbone: Any = None
    img_neck: Any = None
    pts_bbox_head: Any = None
    use_grid_mask: bool = False
    video_test_mode: bool = True
    # scan the image encoder over the camera axis: peak backbone
    # activation/residual memory drops N_cam-fold (exact under the
    # recipe's norm_eval=True — BN uses running stats, so per-camera
    # batches see identical statistics).  The full-size single-chip
    # config enables it (docs/PERF.md BEVFormer track).
    seq_img_encoder: bool = False
    # SCA per-camera query budget for the NO-GRAD history frames only
    # (obtain_history_bev).  None = the encoder default (0.4Q, 14%
    # margin over the measured max hit fraction).  The full-size recipe
    # sets the measured exact-cover budget 0.35Q — identical outputs on
    # every geometry the coverage test sweeps, ~12% fewer sampling rows
    # on 3 of the 4 encoder passes per step (VERDICT r3 #4a).
    history_sca_budget: Any = None
    train_cfg: Any = None
    test_cfg: Any = None
    pretrained: Any = None

    def setup(self):
        self.backbone = build_backbone(dict(self.img_backbone))
        self.neck = build_neck(dict(self.img_neck)) if self.img_neck \
            else None
        head_cfg = dict(self.pts_bbox_head)
        head_cfg.pop("in_channels", None)
        head_cfg.pop("as_two_stage", None)
        head_cfg.setdefault("train_cfg", (self.train_cfg or {}).get(
            "pts"))
        head_cfg.setdefault("test_cfg", (self.test_cfg or {}).get("pts"))
        self.bbox_head = build_head(head_cfg)

    def extract_img_feat(self, imgs, train: bool = False,
                         rng: Optional[jax.Array] = None):
        """imgs [B, N, H, W, 3] -> list of [B, N, h_l, w_l, C]."""
        b, n, h, w, c = imgs.shape
        x = imgs.reshape(b * n, h, w, c)
        if self.use_grid_mask and train:
            if rng is None and self.has_rng("dropout"):
                rng = self.make_rng("dropout")
            if rng is not None:
                x = grid_mask(rng, x)
        if self.seq_img_encoder:
            assert not train or dict(self.img_backbone).get(
                "norm_eval", False), \
                "seq_img_encoder needs norm_eval=True (per-camera " \
                "batches must not change BN statistics)"

            def enc_one(mdl, carry, xc):
                f = mdl.backbone(xc, train=train)
                if mdl.neck is not None:
                    f = mdl.neck(f, train=train)
                return carry, tuple(f)

            scan = nn.scan(enc_one,
                           variable_broadcast=["params", "batch_stats"],
                           split_rngs={"params": False,
                                       "dropout": False},
                           in_axes=0, out_axes=0)
            # [B*N, H, W, 3] -> N chunks of [B, H, W, 3]
            xn = x.reshape(b, n, h, w, c).swapaxes(0, 1)
            _, feats = scan(self, (), xn)
            # each level: [N, B, h_l, w_l, C] -> [B, N, ...]
            return [f.swapaxes(0, 1) for f in feats]
        feats = self.backbone(x, train=train)
        if self.neck is not None:
            feats = self.neck(feats, train=train)
        return [f.reshape((b, n) + f.shape[1:]) for f in feats]

    def _frame_bev(self, imgs, can_bus, lidar2img, prev_bev,
                   prev_valid=None, sca_budget=None,
                   train: bool = False, rng=None):
        feats = self.extract_img_feat(imgs, train=train, rng=rng)
        img_shape = (imgs.shape[2], imgs.shape[3])
        return self.bbox_head(feats, prev_bev=prev_bev, can_bus=can_bus,
                              lidar2img=lidar2img, img_shape=img_shape,
                              only_bev=True, prev_valid=prev_valid,
                              sca_budget=sca_budget, train=train)

    def obtain_history_bev(self, imgs_queue, can_bus_queue,
                           lidar2img_queue, prev_exists):
        """Roll the queue's first T-1 frames into a history BEV under
        stop_gradient (reference bevformer.py:156-174).  Per-sample
        ``prev_exists`` gating reproduces the reference's
        ``prev_bev=None`` semantics at scene boundaries (TSA falls back
        to the current query) instead of attending to a zero BEV.

        The frames share weights and run inference-mode, so the loop is
        an ``nn.scan`` over the time axis: ONE backbone+encoder trace in
        the HLO instead of T-1 unrolled copies — at full size (queue=4,
        900x1600, 6 remat encoder layers) the unrolled graph was big
        enough to kill the compile on this sandbox (docs/PERF.md)."""
        b, t = imgs_queue.shape[:2]
        head_cfg = dict(self.pts_bbox_head)
        bev_hw = int(head_cfg.get("bev_h", 200)) * int(
            head_cfg.get("bev_w", 200))
        embed = int(head_cfg.get("embed_dims", 256))
        # carry in the compute dtype: a fp32 history BEV would promote
        # the final frame's whole encoder under bf16 mixed precision
        carry_dt = imgs_queue.dtype if jnp.issubdtype(
            imgs_queue.dtype, jnp.floating) else jnp.float32
        init_bev = jnp.zeros((b, bev_hw, embed), carry_dt)
        # frame 0 never has history inside the queue (union2one also
        # zeroes its can-bus delta), later frames follow prev_exists
        valid = prev_exists * jnp.asarray(
            [0.0] + [1.0] * (t - 1), prev_exists.dtype)[None, :]

        def body(mdl, prev_bev, xs):
            imgs, can_bus, l2i, v = xs
            bev = mdl._frame_bev(imgs, can_bus, l2i,
                                 jax.lax.stop_gradient(prev_bev),
                                 prev_valid=v,
                                 sca_budget=mdl.history_sca_budget,
                                 train=False)
            return bev.astype(carry_dt), None

        scan = nn.scan(body,
                       variable_broadcast=["params", "batch_stats"],
                       split_rngs={"params": False, "dropout": False},
                       in_axes=1)
        prev_bev, _ = scan(self, init_bev,
                           (imgs_queue, can_bus_queue, lidar2img_queue,
                            valid))
        return jax.lax.stop_gradient(prev_bev)

    def __call__(self, imgs, can_bus, lidar2img, prev_exists,
                 train: bool = False):
        """imgs [B, T, N, H, W, 3]; last frame is the current one."""
        t = imgs.shape[1]
        prev_bev = None
        prev_valid = None
        if t > 1:
            prev_bev = self.obtain_history_bev(
                imgs[:, :-1], can_bus[:, :-1], lidar2img[:, :-1],
                prev_exists[:, :-1])
            prev_valid = prev_exists[:, -1]
        feats = self.extract_img_feat(imgs[:, -1], train=train)
        img_shape = (imgs.shape[3], imgs.shape[4])
        outs = self.bbox_head(
            feats, prev_bev=prev_bev, can_bus=can_bus[:, -1],
            lidar2img=lidar2img[:, -1], img_shape=img_shape,
            prev_valid=prev_valid, train=train)
        return outs, BEVFormerBundle(outs["bev_embed"], outs)

    def forward_test_frame(self, imgs, can_bus, lidar2img, prev_bev,
                           prev_valid):
        """Test-time single-frame forward for the scene-token state
        machine (reference bevformer.py:233-266 keeps
        ``prev_frame_info`` across calls; apis/test.py owns that state
        here).  ``prev_bev`` is always an array [B, H*W, C] (zeros on
        the first call) and ``prev_valid`` [B] gates it, so one trace
        serves both scene starts and continuations."""
        feats = self.extract_img_feat(imgs, train=False)
        img_shape = (imgs.shape[2], imgs.shape[3])
        return self.bbox_head(
            feats, prev_bev=prev_bev, can_bus=can_bus,
            lidar2img=lidar2img, img_shape=img_shape,
            prev_valid=prev_valid, train=False)

    def loss(self, outs, gt_boxes, gt_labels, gt_mask):
        return self.bbox_head.loss(outs, gt_boxes, gt_labels, gt_mask)

    def get_bboxes(self, outs):
        return self.bbox_head.get_bboxes(outs)


@DETECTORS.register_module()
class BEVFormerDistill(BEVFormer, _DistillBase):
    """Transformer-path distillation (fgd only, reference
    bevformer_distill.py:126 assert)."""
    teacher_config: Any = None
    teacher_ckpt: Any = None
    self_ckpt: Any = None
    distill_type: str = "fgd"
    distill_params: Any = None
    inherit_head: bool = False
    inherit_decoder: bool = False
    inherit_query: bool = False

    def setup(self):
        super().setup()
        assert self.distill_type == "fgd"
        self.distiller = Distiller(
            distill_type=self.distill_type,
            distill_params=self.distill_params,
            train_cfg_pts=(self.train_cfg or {}).get("pts"),
            center_offset=0.5)

    def bev_embed_2d(self, bev_embed, bev_h: int, bev_w: int):
        """seq -> [B, H, W, C] (reference bevformer_distill.py:898-905)."""
        b = bev_embed.shape[0]
        return bev_embed.reshape(b, bev_h, bev_w, -1)

    def distill_losses_bevformer(self, student_outs, teacher_outs,
                                 teacher_bev_feat, gt_boxes, gt_labels,
                                 gt_mask, epoch, bev_h: int, bev_w: int,
                                 train: bool = False, teacher_dec=None,
                                 return_maps: bool = False):
        """FGD on the (student bev_embed, teacher bev_feat) pair +
        optional hs/query distillation.  ``teacher_dec`` (DecodedBoxes
        from the teacher's head) feeds the bbox-based FP-as-FG miner
        (reference bevformer_distill.py add_fp_as_fg_bbox:573-647)."""
        from ..distill import masks as M
        p = dict(self.distill_params)
        s_feat = self.bev_embed_2d(student_outs["bev_embed"], bev_h,
                                   bev_w)
        t_feat = jax.lax.stop_gradient(teacher_bev_feat)
        fp_override = None
        fp_mode = p.get("fp_as_foreground", "none")
        fp_mode = fp_mode[0] if isinstance(fp_mode, (list, tuple)) \
            else fp_mode
        if fp_mode != "none" and teacher_dec is not None:
            tc = dict((self.train_cfg or {}).get("pts"))
            fp_override = M.fp_bbox_masks(
                jax.lax.stop_gradient(teacher_dec.bboxes),
                jax.lax.stop_gradient(teacher_dec.scores),
                teacher_dec.valid, gt_boxes, gt_mask, bev_h, bev_w,
                tc["voxel_size"], tc["point_cloud_range"],
                tc["grid_size"], p["output_threshold"])
        losses = self.distiller.distill_loss(
            0, t_feat, s_feat, gt_boxes, gt_mask, None, None, None,
            None, epoch, train=train, fp_override=fp_override,
            return_maps=return_maps)
        maps = {}
        if return_maps:
            losses, maps = losses
        # reference similarity-map query/hs distillation (reference
        # bevformer_distill.py:364-385, gated at :835-837 by
        # query_criterion != 'none' on the index-0 feat pair)
        from ..distill.query_distill import (hs_distill_loss,
                                             query_distill_loss)
        qc = p.get("query_criterion", "none")
        if qc not in (None, "none"):
            t_hs = jax.lax.stop_gradient(teacher_outs["hs"])
            t_query = jax.lax.stop_gradient(teacher_outs["query_embed"])
            losses.update(query_distill_loss(
                t_feat, t_query, t_hs, s_feat,
                student_outs["query_embed"], student_outs["hs"],
                query_criterion=qc,
                query_loss_weight=p["query_loss_weight"]))
        # ('hs', 'hs') feat-position pairs dispatch to hs_distill_loss
        # instead of fgd (reference forward_distill:898-918)
        s_pos = p.get("student_feat_pos", ["head"])
        t_pos = p.get("teacher_feat_pos", ["head"])
        for sp, tp in zip(list(s_pos), list(t_pos)):
            if sp == "hs" or tp == "hs":
                assert sp == tp == "hs", (sp, tp)
                hs_losses = hs_distill_loss(
                    jax.lax.stop_gradient(teacher_outs["hs"]),
                    student_outs["hs"],
                    feat_criterion=p["feat_criterion"],
                    hs_feat_loss_weights=p["hs_feat_loss_weights"])
                losses.update({f"{k}_hs_hs": v
                               for k, v in hs_losses.items()})
        # repo-only plain L1 variants (non-reference keys, kept under
        # their own names; shipped configs set them to 0)
        if p.get("hs_weight", 0):
            hs_s = student_outs["hs"][-1]
            hs_t = jax.lax.stop_gradient(teacher_outs["hs"][-1])
            losses["kd_hs_loss"] = p["hs_weight"] * jnp.abs(
                hs_s - hs_t).mean()
        if p.get("query_weight", 0):
            q_s = student_outs["query_embed"]
            q_t = jax.lax.stop_gradient(teacher_outs["query_embed"])
            if q_s.shape == q_t.shape:
                losses["kd_query_loss"] = p["query_weight"] * jnp.abs(
                    q_s - q_t).mean()
        out = {f"{k}_bev": v for k, v in losses.items()}
        if return_maps:
            return out, {"bev": maps}
        return out

    def init_with_teacher(self, imgs, can_bus, lidar2img, prev_exists,
                          teacher_bev_feat, train: bool = False):
        outs, bundle = self(imgs, can_bus, lidar2img, prev_exists,
                            train=train)
        head_cfg = dict(self.pts_bbox_head or {})
        bev_h = head_cfg.get("bev_h", 200)
        bev_w = head_cfg.get("bev_w", 200)
        s_feat = self.bev_embed_2d(outs["bev_embed"], bev_h, bev_w)
        self.distiller([teacher_bev_feat], [s_feat], train=train)
        return outs, bundle
