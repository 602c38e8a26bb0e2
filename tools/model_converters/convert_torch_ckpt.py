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


NAME_MAPS = {
    "centerpoint_pillar": centerpoint_pillar_name_map,
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
    pm, sm = NAME_MAPS[model_type]()
    # resolve deconv-vs-conv alias entries by checking presence
    pm = {k.split("#")[0]: v for k, v in pm.items()
          if "#" not in k or k.split("#")[0] in torch_flat}
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
