#!/usr/bin/env python
"""Convert reference (torch/mmcv) checkpoints to this framework's
orbax/flax format.

Capability parity requirement (SURVEY.md §5): released reference
checkpoints must reproduce their nuScenes metrics here.  The reference
stores ``{'state_dict': {torch_name: tensor}, 'meta': ...}``
(reference tools/train.py:220-230); this tool maps torch names onto flax
param paths per model family and layout-converts tensors
(Conv OIHW->HWIO, Linear [out,in]->[in,out], BN -> scale/bias + stats).
"""
from __future__ import annotations

import argparse
import os.path as osp
import sys
from typing import Dict, Tuple

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))

from distillbev_tpu.training.param_utils import (bn_name_map, map_params,
                                                 load_torch_checkpoint)


def centerpoint_pillar_name_map(num_tasks: int = 6,
                                pfn_layers: int = 1,
                                second_layers=(3, 5, 5),
                                common_heads=("reg", "height", "dim",
                                              "rot", "vel"),
                                head_convs: int = 2
                                ) -> Tuple[Dict, Dict]:
    """Torch name -> flax path for the CenterPoint-pillar teacher.

    Torch naming (mmdet3d): pts_voxel_encoder.pfn_layers.{i}.linear /
    .norm; pts_backbone.blocks.{i}.{k}; pts_neck.deblocks.{i}.{0,1};
    pts_bbox_head.shared_conv.{conv,bn};
    pts_bbox_head.task_heads.{t}.{key}.{j}.{conv,bn} + final conv.
    """
    pm: Dict = {}
    sm: Dict = {}
    for i in range(pfn_layers):
        pm[f"pts_voxel_encoder.pfn_layers.{i}.linear.weight"] = (
            "voxel_encoder", f"pfn_{i}", "linear", "kernel")
        pm.update(bn_name_map(
            f"pts_voxel_encoder.pfn_layers.{i}.norm",
            ("voxel_encoder", f"pfn_{i}", "norm"), sm))
    # SECOND: each stage i is a Sequential [Conv, BN, ReLU] * (n_i + 1)
    for i, n in enumerate(second_layers):
        for j in range(n + 1):
            conv_idx = j * 3
            bn_idx = j * 3 + 1
            pm[f"pts_backbone.blocks.{i}.{conv_idx}.weight"] = (
                "backbone", f"stage{i}_conv{j}", "conv", "kernel")
            pm.update(bn_name_map(
                f"pts_backbone.blocks.{i}.{bn_idx}",
                ("backbone", f"stage{i}_conv{j}", "norm"), sm))
    # SECONDFPN deblocks: [ConvTranspose|Conv, BN, ReLU]
    for i in range(len(second_layers)):
        pm[f"pts_neck.deblocks.{i}.0.weight"] = (
            "neck", f"deblock_{i}", "deconv", "kernel")
        # stride<=1 variants use a plain conv under the same index
        pm[f"pts_neck.deblocks.{i}.0.weight#conv"] = (
            "neck", f"deblock_{i}", "conv", "kernel")
        pm.update(bn_name_map(
            f"pts_neck.deblocks.{i}.1",
            ("neck", f"deblock_{i}", "norm"), sm))
    # head
    pm["pts_bbox_head.shared_conv.conv.weight"] = (
        "bbox_head", "shared_conv", "conv", "kernel")
    pm.update(bn_name_map("pts_bbox_head.shared_conv.bn",
                          ("bbox_head", "shared_conv", "norm"), sm))
    keys = tuple(common_heads) + ("heatmap",)
    for t in range(num_tasks):
        for key in keys:
            for j in range(head_convs - 1):
                pm[f"pts_bbox_head.task_heads.{t}.{key}.{j}.conv"
                   ".weight"] = ("bbox_head", f"task_{t}",
                                 f"{key}_conv{j}", "conv", "kernel")
                pm.update(bn_name_map(
                    f"pts_bbox_head.task_heads.{t}.{key}.{j}.bn",
                    ("bbox_head", f"task_{t}", f"{key}_conv{j}",
                     "norm"), sm))
            final = head_convs - 1
            pm[f"pts_bbox_head.task_heads.{t}.{key}.{final}.weight"] = (
                "bbox_head", f"task_{t}", f"{key}_out", "kernel")
            pm[f"pts_bbox_head.task_heads.{t}.{key}.{final}.bias"] = (
                "bbox_head", f"task_{t}", f"{key}_out", "bias")
    return pm, sm




def resnet_name_map(depth: int, torch_prefix: str = "",
                    flax_prefix: Tuple[str, ...] = ("backbone",),
                    torchvision_style: bool = True
                    ) -> Tuple[Dict, Dict]:
    """torchvision/mmdet ResNet names -> our flax ResNet paths.

    torchvision: conv1 / bn1 / layer{1..4}.{j}.conv{1..3}/bn{1..3} +
    downsample.0/.1; mmdet prefixes everything with ``backbone.`` but
    keeps the same structure.
    """
    blocks = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
              101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}[depth]
    bottleneck = depth >= 50
    pm: Dict = {}
    sm: Dict = {}
    tp = torch_prefix
    pm[f"{tp}conv1.weight"] = flax_prefix + ("stem_conv", "kernel")
    pm.update(bn_name_map(f"{tp}bn1", flax_prefix + ("stem_bn",), sm))
    n_convs = 3 if bottleneck else 2
    for li, n in enumerate(blocks):
        for j in range(n):
            t_blk = f"{tp}layer{li + 1}.{j}"
            f_blk = flax_prefix + (f"layer{li + 1}_block{j}",)
            for ci in range(1, n_convs + 1):
                pm[f"{t_blk}.conv{ci}.weight"] = f_blk + (
                    f"conv{ci}", "kernel")
                pm.update(bn_name_map(f"{t_blk}.bn{ci}",
                                      f_blk + (f"bn{ci}",), sm))
            # downsample exists only on each stage's first block (and on
            # layer1 only for bottleneck nets, where channels change)
            if j == 0 and (li > 0 or bottleneck):
                pm[f"{t_blk}.downsample.0.weight"] = f_blk + (
                    "downsample_conv", "kernel")
                pm.update(bn_name_map(f"{t_blk}.downsample.1",
                                      f_blk + ("downsample_bn",), sm))
    return pm, sm


def bevdepth4d_name_map(depth: int = 50) -> Tuple[Dict, Dict]:
    """Reference BEVDepth4D(Distill) student state_dict -> our flax tree
    (reference modules: img_backbone (mmdet ResNet), img_neck
    FPNForBEVDet, img_view_transformer ViewTransformerLSSBEVDepth,
    img_bev_encoder_backbone ResNetForBEVDet, img_bev_encoder_neck
    FPN_LSS, pre_process ResNetForBEVDet, pts_bbox_head CenterHead)."""
    pm, sm = resnet_name_map(depth, "img_backbone.", ("backbone",),
                             torchvision_style=False)
    # FPNForBEVDet: lateral_convs.{i}.conv + fpn_convs.{i}.conv
    for i in range(2):
        pm[f"img_neck.lateral_convs.{i}.conv.weight"] = (
            "neck", f"lateral_{i}", "kernel")
        pm[f"img_neck.lateral_convs.{i}.conv.bias"] = (
            "neck", f"lateral_{i}", "bias")
    pm["img_neck.fpn_convs.0.conv.weight"] = ("neck", "fpn_conv_0",
                                              "kernel")
    pm["img_neck.fpn_convs.0.conv.bias"] = ("neck", "fpn_conv_0",
                                            "bias")
    # view transformer
    vt = "img_view_transformer."
    fvt = ("view_transformer",)
    pm[f"{vt}featnet.weight"] = fvt + ("featnet", "kernel")
    pm[f"{vt}featnet.bias"] = fvt + ("featnet", "bias")
    pm[f"{vt}depthnet.weight"] = fvt + ("depthnet", "kernel")
    pm[f"{vt}depthnet.bias"] = fvt + ("depthnet", "bias")
    pm[f"{vt}se.input_conv.weight"] = fvt + ("se", "input_conv",
                                             "kernel")
    pm[f"{vt}se.input_conv.bias"] = fvt + ("se", "input_conv", "bias")
    pm[f"{vt}se.fc.1.weight"] = fvt + ("se", "fc", "kernel")
    pm[f"{vt}se.fc.1.bias"] = fvt + ("se", "fc", "bias")
    pm.update(bn_name_map(f"{vt}se.fc.0", fvt + ("se", "fc_bn"), sm))
    # extra_depthnet: ResNetForBEVDet num_layer=[3] -> stage0_block{0..2}
    for j in range(3):
        t_blk = f"{vt}extra_depthnet.layers.0.{j}"
        f_blk = fvt + ("extra_depthnet", f"stage0_block{j}")
        for ci in (1, 2):
            pm[f"{t_blk}.conv{ci}.weight"] = f_blk + (f"conv{ci}",
                                                      "kernel")
            pm.update(bn_name_map(f"{t_blk}.bn{ci}",
                                  f_blk + (f"bn{ci}",), sm))
        if j == 0:
            pm[f"{t_blk}.downsample.weight"] = f_blk + (
                "downsample_conv", "kernel")
            pm[f"{t_blk}.downsample.bias"] = f_blk + (
                "downsample_conv", "bias")
    # true DCNv2 + bn (reference img_view_transformer.dcn.0/.1 is an
    # mmcv ModulatedDeformConv2dPack: weight + conv_offset conv)
    pm[f"{vt}dcn.0.weight"] = fvt + ("dcn_conv", "weight")
    pm[f"{vt}dcn.0.bias"] = fvt + ("dcn_conv", "bias")
    pm[f"{vt}dcn.0.conv_offset.weight"] = fvt + (
        "dcn_conv", "conv_offset", "kernel")
    pm[f"{vt}dcn.0.conv_offset.bias"] = fvt + (
        "dcn_conv", "conv_offset", "bias")
    pm.update(bn_name_map(f"{vt}dcn.1", fvt + ("dcn_bn",), sm))
    # bev encoder backbone: ResNetForBEVDet default num_layer [2,2,2]
    for i in range(3):
        for j in range(2):
            t_blk = f"img_bev_encoder_backbone.layers.{i}.{j}"
            f_blk = ("bev_backbone", f"stage{i}_block{j}")
            for ci in (1, 2):
                pm[f"{t_blk}.conv{ci}.weight"] = f_blk + (f"conv{ci}",
                                                          "kernel")
                pm.update(bn_name_map(f"{t_blk}.bn{ci}",
                                      f_blk + (f"bn{ci}",), sm))
            if j == 0:
                pm[f"{t_blk}.downsample.weight"] = f_blk + (
                    "downsample_conv", "kernel")
                pm[f"{t_blk}.downsample.bias"] = f_blk + (
                    "downsample_conv", "bias")
    # FPN_LSS: conv.0 conv.1(bn) conv.3 conv.4(bn); up2: 1 conv, 2 bn, 4 conv1x1
    neck = "img_bev_encoder_neck."
    pm[f"{neck}conv.0.weight"] = ("bev_neck", "conv0", "conv", "kernel")
    pm.update(bn_name_map(f"{neck}conv.1",
                          ("bev_neck", "conv0", "norm"), sm))
    pm[f"{neck}conv.3.weight"] = ("bev_neck", "conv1", "conv", "kernel")
    pm.update(bn_name_map(f"{neck}conv.4",
                          ("bev_neck", "conv1", "norm"), sm))
    pm[f"{neck}up2.1.weight"] = ("bev_neck", "up2_conv0", "conv",
                                 "kernel")
    pm.update(bn_name_map(f"{neck}up2.2",
                          ("bev_neck", "up2_conv0", "norm"), sm))
    pm[f"{neck}up2.4.weight"] = ("bev_neck", "up2_conv1", "kernel")
    pm[f"{neck}up2.4.bias"] = ("bev_neck", "up2_conv1", "bias")
    # pre_process: ResNetForBEVDet num_layer=[2]
    for j in range(2):
        t_blk = f"pre_process_net.layers.0.{j}"
        f_blk = ("pre_process_net", f"stage0_block{j}")
        for ci in (1, 2):
            pm[f"{t_blk}.conv{ci}.weight"] = f_blk + (f"conv{ci}",
                                                      "kernel")
            pm.update(bn_name_map(f"{t_blk}.bn{ci}",
                                  f_blk + (f"bn{ci}",), sm))
        if j == 0:
            pm[f"{t_blk}.downsample.weight"] = f_blk + (
                "downsample_conv", "kernel")
            pm[f"{t_blk}.downsample.bias"] = f_blk + (
                "downsample_conv", "bias")
    # head: same structure as the teacher head
    hp, hs = centerpoint_pillar_name_map(num_tasks=6)
    for k, v in hp.items():
        if k.startswith("pts_bbox_head."):
            pm[k] = v
    for k, v in hs.items():
        if k.startswith("pts_bbox_head."):
            sm[k] = v
    return pm, sm


def _deform_attn_map(pm, t_attn: str, f_attn: Tuple[str, ...]):
    """mmcv (Custom)MultiScaleDeformableAttention -> our
    CustomMSDeformableAttention (attention.py:240).  The torch
    sampling_offsets Linear's bias carries the grid init; ours is the
    separate ``sampling_offsets_bias`` param."""
    pm[f"{t_attn}.sampling_offsets.weight"] = f_attn + (
        "sampling_offsets", "kernel")
    pm[f"{t_attn}.sampling_offsets.bias"] = f_attn + (
        "sampling_offsets_bias",)
    for lin in ("attention_weights", "value_proj", "output_proj"):
        pm[f"{t_attn}.{lin}.weight"] = f_attn + (lin, "kernel")
        pm[f"{t_attn}.{lin}.bias"] = f_attn + (lin, "bias")


def _ln_map(pm, t_ln: str, f_ln: Tuple[str, ...]):
    pm[f"{t_ln}.weight"] = f_ln + ("scale",)
    pm[f"{t_ln}.bias"] = f_ln + ("bias",)


def _ffn_map(pm, t_ffn: str, f_ffn: Tuple[str, ...]):
    """mmcv FFN: layers.0 = Sequential(Linear, act, drop); layers.1 =
    Linear."""
    pm[f"{t_ffn}.layers.0.0.weight"] = f_ffn + ("fc1", "kernel")
    pm[f"{t_ffn}.layers.0.0.bias"] = f_ffn + ("fc1", "bias")
    pm[f"{t_ffn}.layers.1.weight"] = f_ffn + ("fc2", "kernel")
    pm[f"{t_ffn}.layers.1.bias"] = f_ffn + ("fc2", "bias")


def lidarformer_name_map(
        encoder_channels=((16, 16, 32), (32, 32, 64), (64, 64, 128),
                          (128, 128)),
        block_type: str = "basicblock",
        second_layers=(5, 5),
        fpn_levels: int = 2,
        num_enc_layers: int = 6,
        num_dec_layers: int = 6,
        num_reg_fcs: int = 2) -> Tuple[Dict, Dict]:
    """Reference LidarFormer/MVPFormer state_dict -> our flax tree
    (reference modules: HardSimpleVFE (param-free), spconv SparseEncoder
    (sparse_encoder.py:11-205), SECOND, mmdet FPN, DGCNN3DHead with
    DeformableDetrTransformerDistill (dgcnn3d_head.py:18-510,
    detr_transformer.py:20-330)).

    spconv weights are (kd, kh, kw, in, out); map_params reshapes them
    onto our (K, in, out) kernels (same row-major tap order — our
    rulebook enumerates (dz, dy, dx) offsets in C order).
    MultiheadAttention in_proj tensors are pre-split by ``convert`` into
    q/k/v entries before mapping."""
    pm: Dict = {}
    sm: Dict = {}
    me = "pts_middle_encoder."
    fme = ("middle_encoder",)
    pm[f"{me}conv_input.0.weight"] = fme + ("conv_input", "kernel")
    pm.update(bn_name_map(f"{me}conv_input.1",
                          fme + ("conv_input", "norm"), sm))
    n_stages = len(encoder_channels)
    for i, blocks in enumerate(encoder_channels):
        for j in range(len(blocks)):
            t_blk = f"{me}encoder_layers.encoder_layer{i + 1}.{j}"
            f_blk = fme + (f"encoder_{i}_{j}",)
            strided = (
                (block_type == "conv_module" and i != 0 and j == 0) or
                (block_type == "basicblock" and
                 j == len(blocks) - 1 and i != n_stages - 1))
            if block_type == "basicblock" and not strided:
                # SparseBasicBlock: our conv{ci} is a SparseConvModule
                # holding both the kernel and its norm
                for ci in (1, 2):
                    pm[f"{t_blk}.conv{ci}.weight"] = f_blk + (
                        f"conv{ci}", "kernel")
                    pm.update(bn_name_map(
                        f"{t_blk}.bn{ci}",
                        f_blk + (f"conv{ci}", "norm"), sm))
            else:
                pm[f"{t_blk}.0.weight"] = f_blk + ("kernel",)
                pm.update(bn_name_map(f"{t_blk}.1", f_blk + ("norm",),
                                      sm))
    pm[f"{me}conv_out.0.weight"] = fme + ("conv_out", "kernel")
    pm.update(bn_name_map(f"{me}conv_out.1", fme + ("conv_out", "norm"),
                          sm))
    # SECOND backbone (same structure as the CenterPoint map)
    for i, n in enumerate(second_layers):
        for j in range(n + 1):
            pm[f"pts_backbone.blocks.{i}.{j * 3}.weight"] = (
                "backbone", f"stage{i}_conv{j}", "conv", "kernel")
            pm.update(bn_name_map(
                f"pts_backbone.blocks.{i}.{j * 3 + 1}",
                ("backbone", f"stage{i}_conv{j}", "norm"), sm))
    # mmdet FPN (with norm: ConvModule conv(bias-free) + bn)
    for i in range(fpn_levels):
        for group, fname in (("lateral_convs", f"lateral_{i}"),
                             ("fpn_convs", f"fpn_conv_{i}")):
            pm[f"pts_neck.{group}.{i}.conv.weight"] = (
                "neck", fname, "kernel")
            pm[f"pts_neck.{group}.{i}.conv.bias"] = (
                "neck", fname, "bias")
            pm.update(bn_name_map(f"pts_neck.{group}.{i}.bn",
                                  ("neck", f"{fname}_bn"), sm))
    # DGCNN3DHead
    hd = "pts_bbox_head."
    fh = ("bbox_head",)
    pm[f"{hd}bev_embedding.weight"] = fh + ("bev_embedding",)
    pm[f"{hd}query_embedding.weight"] = fh + ("query_embedding",)
    _detr_branches_map(pm, hd, fh, num_dec_layers, num_reg_fcs)
    # transformer
    tr = f"{hd}transformer."
    ft = fh + ("transformer",)
    pm[f"{tr}level_embeds"] = ft + ("level_embed",)
    pm[f"{tr}reference_points.weight"] = ft + ("reference_points",
                                               "kernel")
    pm[f"{tr}reference_points.bias"] = ft + ("reference_points", "bias")
    for i in range(num_enc_layers):
        t_l = f"{tr}encoder.layers.{i}"
        _deform_attn_map(pm, f"{t_l}.attentions.0",
                         ft + (f"enc_attn_{i}",))
        _ln_map(pm, f"{t_l}.norms.0", ft + (f"enc_norm1_{i}",))
        _ln_map(pm, f"{t_l}.norms.1", ft + (f"enc_norm2_{i}",))
        _ffn_map(pm, f"{t_l}.ffns.0", ft + (f"enc_ffn_{i}",))
    _decoder_map(pm, tr, ft, num_dec_layers)
    return pm, sm


def _detr_branches_map(pm, hd: str, fh: Tuple[str, ...], num_pred: int,
                       num_reg_fcs: int = 2):
    """cls/reg branch clones of the DETR-style heads; reg tensors are
    fanned out into the decoder's box-refinement copies (torch shares
    the module objects)."""
    for p in range(num_pred):
        for fc in range(num_reg_fcs):
            pm[f"{hd}cls_branches.{p}.{fc * 3}.weight"] = fh + (
                f"cls_{p}_fc{fc}", "kernel")
            pm[f"{hd}cls_branches.{p}.{fc * 3}.bias"] = fh + (
                f"cls_{p}_fc{fc}", "bias")
            _ln_map(pm, f"{hd}cls_branches.{p}.{fc * 3 + 1}",
                    fh + (f"cls_{p}_ln{fc}",))
        pm[f"{hd}cls_branches.{p}.{num_reg_fcs * 3}.weight"] = fh + (
            f"cls_{p}_out", "kernel")
        pm[f"{hd}cls_branches.{p}.{num_reg_fcs * 3}.bias"] = fh + (
            f"cls_{p}_out", "bias")
        for fc in range(num_reg_fcs + 1):
            t_i = fc * 2 if fc < num_reg_fcs else num_reg_fcs * 2
            f_n = f"reg_{p}_fc{fc}" if fc < num_reg_fcs else \
                f"reg_{p}_out"
            for tag, dest in (("", fh),
                              ("#dec", fh + ("transformer", "decoder"))):
                pm[f"{hd}reg_branches.{p}.{t_i}.weight{tag}"] = dest + (
                    f_n, "kernel")
                pm[f"{hd}reg_branches.{p}.{t_i}.bias{tag}"] = dest + (
                    f_n, "bias")


def _decoder_map(pm, tr: str, ft: Tuple[str, ...], num_dec_layers: int):
    """DetectionTransformerDecoder layers (MultiheadAttention self-attn
    pre-split by ``split_mha_in_proj`` + deformable cross-attn)."""
    for i in range(num_dec_layers):
        t_l = f"{tr}decoder.layers.{i}"
        f_l = ft + ("decoder", f"layer_{i}")
        for t_n, f_n in (("q_proj", "query"), ("k_proj", "key"),
                         ("v_proj", "value")):
            pm[f"{t_l}.attentions.0.attn.{t_n}.weight"] = f_l + (
                "self_attn", "attn", f_n, "kernel")
            pm[f"{t_l}.attentions.0.attn.{t_n}.bias"] = f_l + (
                "self_attn", "attn", f_n, "bias")
        pm[f"{t_l}.attentions.0.attn.out_proj.weight"] = f_l + (
            "self_attn", "attn", "out", "kernel")
        pm[f"{t_l}.attentions.0.attn.out_proj.bias"] = f_l + (
            "self_attn", "attn", "out", "bias")
        _deform_attn_map(pm, f"{t_l}.attentions.1",
                         f_l + ("cross_attn",))
        for ni, f_n in ((0, "norm1"), (1, "norm2"), (2, "norm3")):
            _ln_map(pm, f"{t_l}.norms.{ni}", f_l + (f_n,))
        _ffn_map(pm, f"{t_l}.ffns.0", f_l + ("ffn",))


def bevformer_name_map(depth: int = 50,
                       fpn_levels: int = 4,
                       num_enc_layers: int = 6,
                       num_dec_layers: int = 6,
                       num_reg_fcs: int = 2) -> Tuple[Dict, Dict]:
    """Reference BEVFormer(Distill) student state_dict -> our flax tree
    (reference modules: img_backbone mmdet ResNet, img_neck FPN,
    pts_bbox_head BEVFormerHead (bevformer_head.py:40-120) with
    PerceptionTransformer (perception_transformer.py:45-72): encoder
    BEVFormerLayer = TemporalSelfAttention + SpatialCrossAttention
    (inner MSDeformableAttention3D + outer output_proj), decoder =
    DetectionTransformerDecoder)."""
    pm, sm = resnet_name_map(depth, "img_backbone.", ("backbone",))
    for i in range(fpn_levels):
        for group, fname in (("lateral_convs", f"lateral_{i}"),
                             ("fpn_convs", f"fpn_conv_{i}")):
            pm[f"img_neck.{group}.{i}.conv.weight"] = ("neck", fname,
                                                       "kernel")
            pm[f"img_neck.{group}.{i}.conv.bias"] = ("neck", fname,
                                                     "bias")
    hd = "pts_bbox_head."
    fh = ("bbox_head",)
    pm[f"{hd}bev_embedding.weight"] = fh + ("bev_embedding",)
    pm[f"{hd}query_embedding.weight"] = fh + ("query_embedding",)
    pm[f"{hd}positional_encoding.row_embed.weight"] = fh + (
        "positional_encoding", "row_embed")
    pm[f"{hd}positional_encoding.col_embed.weight"] = fh + (
        "positional_encoding", "col_embed")
    _detr_branches_map(pm, hd, fh, num_dec_layers, num_reg_fcs)
    tr = f"{hd}transformer."
    ft = fh + ("transformer",)
    pm[f"{tr}level_embeds"] = ft + ("level_embeds",)
    pm[f"{tr}cams_embeds"] = ft + ("cams_embeds",)
    pm[f"{tr}reference_points.weight"] = ft + ("reference_points",
                                               "kernel")
    pm[f"{tr}reference_points.bias"] = ft + ("reference_points", "bias")
    pm[f"{tr}can_bus_mlp.0.weight"] = ft + ("can_bus_fc1", "kernel")
    pm[f"{tr}can_bus_mlp.0.bias"] = ft + ("can_bus_fc1", "bias")
    pm[f"{tr}can_bus_mlp.2.weight"] = ft + ("can_bus_fc2", "kernel")
    pm[f"{tr}can_bus_mlp.2.bias"] = ft + ("can_bus_fc2", "bias")
    _ln_map(pm, f"{tr}can_bus_mlp.norm", ft + ("can_bus_norm",))
    for i in range(num_enc_layers):
        t_l = f"{tr}encoder.layers.{i}"
        f_l = ft + ("encoder", f"layer_{i}")
        _deform_attn_map(pm, f"{t_l}.attentions.0", f_l + ("tsa",))
        _deform_attn_map(pm, f"{t_l}.attentions.1.deformable_attention",
                         f_l + ("sca", "deformable_attention"))
        # the inner MSDeformableAttention3D has no output_proj; it lives
        # on the SpatialCrossAttention wrapper
        del pm[f"{t_l}.attentions.1.deformable_attention"
               ".output_proj.weight"]
        del pm[f"{t_l}.attentions.1.deformable_attention"
               ".output_proj.bias"]
        pm[f"{t_l}.attentions.1.output_proj.weight"] = f_l + (
            "sca", "output_proj", "kernel")
        pm[f"{t_l}.attentions.1.output_proj.bias"] = f_l + (
            "sca", "output_proj", "bias")
        for ni, f_n in ((0, "norm1"), (1, "norm2"), (2, "norm3")):
            _ln_map(pm, f"{t_l}.norms.{ni}", f_l + (f_n,))
        _ffn_map(pm, f"{t_l}.ffns.0", f_l + ("ffn",))
    _decoder_map(pm, tr, ft, num_dec_layers)
    return pm, sm


def swin_name_map(depths=(2, 2, 6, 2),
                  out_indices=(0, 1, 2, 3),
                  torch_prefix: str = "img_backbone.",
                  flax_prefix: Tuple[str, ...] = ("backbone",)
                  ) -> Tuple[Dict, Dict]:
    """Official Swin checkpoint (reference backbones/
    swin_transformer_official.py:545-737 — the 'official' microsoft
    layout its load_checkpoint consumes) -> our compact SwinTransformer
    (models/backbones/swin.py).  LayerNorm weight/bias map onto
    scale/bias; the patch-embed conv transposes OIHW -> HWIO like every
    conv; relative_position_bias_table maps verbatim (our
    _relative_position_index reproduces the official pairwise index)."""
    pm: Dict = {}
    sm: Dict = {}
    t, f = torch_prefix, flax_prefix
    pm[f"{t}patch_embed.proj.weight"] = f + ("patch_embed", "kernel")
    pm[f"{t}patch_embed.proj.bias"] = f + ("patch_embed", "bias")
    _ln_map(pm, f"{t}patch_embed.norm", f + ("patch_norm",))
    for i, depth in enumerate(depths):
        for j in range(depth):
            tb = f"{t}layers.{i}.blocks.{j}"
            fb = f + (f"stage{i}_block{j}",)
            _ln_map(pm, f"{tb}.norm1", fb + ("norm1",))
            _ln_map(pm, f"{tb}.norm2", fb + ("norm2",))
            pm[f"{tb}.attn.relative_position_bias_table"] = fb + (
                "attn", "relative_position_bias_table")
            for lin, fl in (("attn.qkv", ("attn", "qkv")),
                            ("attn.proj", ("attn", "proj")),
                            ("mlp.fc1", ("fc1",)),
                            ("mlp.fc2", ("fc2",))):
                pm[f"{tb}.{lin}.weight"] = fb + fl + ("kernel",)
                pm[f"{tb}.{lin}.bias"] = fb + fl + ("bias",)
        if i < len(depths) - 1:
            _ln_map(pm, f"{t}layers.{i}.downsample.norm",
                    f + (f"merge_norm{i}",))
            pm[f"{t}layers.{i}.downsample.reduction.weight"] = f + (
                f"merge_reduce{i}", "kernel")
    for i in out_indices:
        _ln_map(pm, f"{t}norm{i}", f + (f"out_norm{i}",))
    return pm, sm


def split_mha_in_proj(torch_flat: Dict) -> Dict:
    """Split torch nn.MultiheadAttention packed in_proj tensors into
    q/k/v entries so the name map can address them individually."""
    import numpy as np
    out = dict(torch_flat)
    for k in list(torch_flat):
        if k.endswith(".in_proj_weight") or k.endswith(".in_proj_bias"):
            arr = np.asarray(torch_flat[k])
            parts = np.split(arr, 3, axis=0)
            kind = "weight" if k.endswith("weight") else "bias"
            base = k.rsplit(".in_proj_", 1)[0]
            for name, part in zip(("q_proj", "k_proj", "v_proj"), parts):
                out[f"{base}.{name}.{kind}"] = part
            del out[k]
    return out


def torchvision_resnet_map(depth: int = 50) -> Tuple[Dict, Dict]:
    """Plain torchvision resnet{depth} checkpoint -> img backbone subtree
    (for pretrained init, reference cfg pretrained=resnet50-19c8e357.pth)."""
    return resnet_name_map(depth, "", ("backbone",))


NAME_MAPS = {
    "centerpoint_pillar": centerpoint_pillar_name_map,
    "bevdepth4d": bevdepth4d_name_map,
    "lidarformer": lidarformer_name_map,
    # MVPFormer shares the map: its DynamicVoxelEncoder is param-free
    # (reference dynamic_voxel_encoder.py:70-95, mean reduction only)
    "mvpformer": lidarformer_name_map,
    "bevformer": bevformer_name_map,
    "swin": swin_name_map,
    "torchvision_resnet50": lambda: torchvision_resnet_map(50),
    "torchvision_resnet101": lambda: torchvision_resnet_map(101),
}


def convert(ckpt_path: str, model_type: str, config_path: str,
            out_path: str):
    import jax
    import orbax.checkpoint as ocp
    from distillbev_tpu.config import Config
    from distillbev_tpu.models import build_detector
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    cfg = Config.fromfile(config_path)
    model = build_detector(dict(cfg.model), cfg.get("train_cfg"),
                           cfg.get("test_cfg"))
    pts = np.zeros((1, 1024, 5), np.float32)
    mask = np.ones((1, 1024), bool)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), pts, mask)

    torch_flat = load_torch_checkpoint(ckpt_path)
    torch_flat = split_mha_in_proj(torch_flat)
    pm, sm = NAME_MAPS[model_type]()
    # "#tag" map entries fan one torch tensor out to several flax paths
    # (weight sharing) or offer alternative targets (deconv-vs-conv
    # deblocks — the wrong-layout one is simply absent from the model
    # tree and reported missing): materialize the alias in torch_flat
    for k in list(pm):
        if "#" in k:
            base = k.split("#")[0]
            if base in torch_flat:
                torch_flat[k] = torch_flat[base]
    params, missing_p, bad_p = map_params(torch_flat, pm,
                                          variables["params"])
    stats, missing_s, bad_s = map_params(torch_flat, sm,
                                         variables.get("batch_stats",
                                                       {}))
    print(f"params: {len(pm) - len(missing_p)} mapped, "
          f"{len(missing_p)} missing, {len(bad_p)} shape-mismatched")
    for item in bad_p[:10]:
        print("  mismatch:", item)
    out = {"params": params, "batch_stats": stats}
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(osp.abspath(out_path), out, force=True)
    ckptr.wait_until_finished()
    print(f"wrote {out_path}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint")
    p.add_argument("--model-type", default="centerpoint_pillar",
                   choices=sorted(NAME_MAPS))
    p.add_argument("--config", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args()
    convert(args.checkpoint, args.model_type, args.config, args.out)
