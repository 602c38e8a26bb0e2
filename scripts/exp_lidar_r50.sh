#!/usr/bin/env bash
# LidarFormer teacher -> BEVFormer-R50 distill recipe
# (reference: scripts/teacher_to_bevformer/exp_lidar_r50.sh:10-17 —
# torch.distributed.launch env-var rendezvous becomes tools/train.py
# --distributed, which calls jax.distributed.initialize() from the
# cluster env; --deterministic maps 1:1).
set -e
cd "$(dirname "$0")"/..
python tools/train.py \
  configs/lidar2camera_bev_distillation/teacher_to_bevformer/lidarformer_to_bevformer_nus_1x1conv_r50.py \
  --cfg-options checkpoint_config.interval=4 \
  "model.distill_params.fg_feat_loss_weights=[5e-3]" \
  "model.distill_params.bg_feat_loss_weights=[4e-3]" \
  "model.distill_params.spatial_loss_weights=[5e-4]" \
  --deterministic \
  "$@"
