#!/usr/bin/env bash
# MVP (virtual-point) teacher -> BEVDepth4D-R50 distill recipe
# (reference: scripts/teacher_to_bevdepth4d/mvp2bevdepth.sh — the
# CUDA env pins, pip install and mmcv file-overwrite hacks at the top
# of the reference script are unnecessary here; epoch gating and
# min-lr schedules are first-class, and the env is pinned by
# requirements.txt).  The --cfg-options block mirrors the reference
# overrides 1:1 on the same config surface.
set -e
cd "$(dirname "$0")"/..
python tools/train.py \
  configs/lidar2camera_bev_distillation/centerpoint_pillar_to_bevdepth4d_r50/centerpoint_02pillar_second_secfpn_circlenms_8x4_cyclic_20e_nus_to_bevdepth4d_r50_virtual.py \
  --cfg-options model.inherit_head=True \
  model.img_bev_encoder_neck.extra_norm_act=True \
  data.val.prev_only=True data.test.prev_only=True \
  model.teacher_config='configs/mvp/mvp_dynamic_centerpoint_02pillar_second_secfpn_4x8_cyclic_20e_nus.py' \
  "model.distill_params.spatial_attentions=['teacher_student']" \
  model.distill_params.foreground_mask='gt' \
  model.distill_params.background_mask='logical_not' \
  model.distill_params.scale_mask='combine_gt' \
  "model.distill_params.adaptation_type=['upsample_3layer','upsample_3layer','1x1conv']" \
  model.distill_params.student_adaptation_params.kernel_size=1 \
  model.distill_params.student_adaptation_params.stride=1 \
  model.distill_params.student_adaptation_params.upsample_factor=4 \
  "model.distill_params.student_channels=[256,512,256]" \
  "model.distill_params.teacher_channels=[128,256,384]" \
  "model.distill_params.student_feat_pos=['backbone1','backbone2','head']" \
  "model.distill_params.teacher_feat_pos=['backbone1','backbone2','head']" \
  "model.distill_params.fp_as_foreground=['none','none','teacher']" \
  model.distill_params.output_threshold=0.1 \
  model.distill_params.fp_weight=6e-2 \
  model.distill_params.fp_scale_mode='average' \
  "model.distill_params.fg_feat_loss_weights=[6e-3]" \
  "model.distill_params.bg_feat_loss_weights=[4e-2]" \
  model.distill_params.channel_mask=False \
  optimizer_config._delete_=True \
  optimizer_config.grad_clip.max_norm=5 \
  optimizer_config.grad_clip.norm_type=2 \
  optimizer.lr=2e-4 \
  checkpoint_config.interval=4 \
  "$@"
