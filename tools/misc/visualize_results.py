#!/usr/bin/env python
"""Render saved detection results over their point clouds (reference
tools/misc/visualize_results.py): reads a results pickle (the format
tools/test.py --out writes) and draws predictions vs GT in BEV."""
from __future__ import annotations

import argparse
import os
import os.path as osp
import pickle
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))

from distillbev_tpu.config import Config, DictAction
from distillbev_tpu.datasets import build_dataset
from tools.visualization.vis_bev import draw_bev


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--result", required=True,
                   help="results pickle from tools/test.py --out")
    p.add_argument("--show-dir", default="work_dirs/vis_results")
    p.add_argument("--num-samples", type=int, default=10)
    p.add_argument("--cfg-options", nargs="+",
                   action=DictAction.argparse())
    args = p.parse_args()

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)
    ds = build_dataset(dict(cfg["data"]["val"]))
    with open(args.result, "rb") as f:
        results = pickle.load(f)
    os.makedirs(args.show_dir, exist_ok=True)
    n = min(args.num_samples, len(results), len(ds))
    for i in range(n):
        sample = ds[i]
        pts = np.asarray(sample.get("points", np.zeros((0, 5))))
        gt = sample.get("gt_bboxes_3d")
        gt = np.asarray(gt) if gt is not None else None
        res = results[i]
        pred = res.get("boxes_3d", res.get("pts_bbox", {}).get(
            "boxes_3d")) if isinstance(res, dict) else None
        pred = np.asarray(pred) if pred is not None else None
        out = osp.join(args.show_dir, f"result_{i:04d}.png")
        draw_bev(pts, gt_boxes=gt, pred_boxes=pred, out=out)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
