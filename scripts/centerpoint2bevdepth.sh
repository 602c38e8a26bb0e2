#!/usr/bin/env bash
# Headline distill recipe launcher
# (reference: scripts/teacher_to_bevdepth4d/centerpoint2bevdepth.sh —
# the mmcv file-overwrite hacks at :20-23 are unnecessary here: epoch
# gating and min-lr schedules are first-class).
set -e
cd "$(dirname "$0")"/..
python tools/train.py \
  configs/lidar2camera_bev_distillation/centerpoint_pillar_to_bevdepth4d_r50/centerpoint_02pillar_second_secfpn_circlenms_8x4_cyclic_20e_nus_to_bevdepth4d_r50.py \
  "$@"
