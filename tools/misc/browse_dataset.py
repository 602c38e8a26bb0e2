#!/usr/bin/env python
"""Render dataset samples for inspection (reference
tools/misc/browse_dataset.py): loads samples through the configured
pipeline and writes BEV renderings of points + GT boxes."""
from __future__ import annotations

import argparse
import os
import os.path as osp
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
    p.add_argument("--output-dir", default="work_dirs/browse")
    p.add_argument("--num-samples", type=int, default=10)
    p.add_argument("--split", default="train",
                   choices=["train", "val", "test"])
    p.add_argument("--cfg-options", nargs="+", action=DictAction)
    args = p.parse_args()

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)
    ds = build_dataset(dict(cfg["data"][args.split]))
    os.makedirs(args.output_dir, exist_ok=True)
    n = min(args.num_samples, len(ds))
    for i in range(n):
        sample = ds[i]
        pts = np.asarray(sample.get("points", np.zeros((0, 5))))
        gt = sample.get("gt_bboxes_3d")
        gt = np.asarray(gt) if gt is not None else None
        out = osp.join(args.output_dir, f"sample_{i:04d}.png")
        draw_bev(pts, gt_boxes=gt, out=out)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
