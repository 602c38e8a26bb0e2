"""Visualize what the data pipeline feeds the model.

Capability counterpart of the reference's
tools/visualization/draw_pipeline_input_output.py (which renders raw
nuScenes sample data through the devkit).  Devkit-free version over
OUR dataset/pipeline: for a sample index it renders

* the RAW camera JPEGs referenced by the info file (pipeline input),
* the post-aug ``img_inputs`` tensors the model actually sees
  (de-normalized, per camera x frame),
* the lidar points in BEV with gt boxes (post-aug, i.e. after
  flip/rot/scale), color-coded by height.

Usage:
    python tools/visualization/draw_pipeline_input_output.py CONFIG \
        [--index 0] [--split train] [--out pipeline_io.jpg]
"""
import argparse
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--index", type=int, default=0)
    ap.add_argument("--split", default="train")
    ap.add_argument("--out", default="pipeline_io.jpg")
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from PIL import Image

    from distillbev_tpu.config import Config
    from distillbev_tpu.datasets import build_dataset

    cfg = Config.fromfile(args.config)
    ds_cfg = cfg.data[args.split]
    ds = build_dataset(ds_cfg)
    sample = ds[args.index]
    info = ds.data_infos[args.index]

    cams = sorted(info.get("cams", {}))
    n_cam = max(len(cams), 1)
    rows = 3
    fig, axes = plt.subplots(rows, max(n_cam, 2),
                             figsize=(3.2 * max(n_cam, 2), 3.2 * rows),
                             squeeze=False)

    # row 0: raw pipeline-input JPEGs
    for ci, cam in enumerate(cams):
        ax = axes[0][ci]
        try:
            ax.imshow(Image.open(info["cams"][cam]["data_path"]))
        except OSError:
            ax.text(0.5, 0.5, "missing", ha="center")
        ax.set_title(f"raw {cam}", fontsize=7)
        ax.axis("off")

    # row 1: post-aug model inputs (first frame of img_inputs)
    img_inputs = sample.get("img_inputs")
    if img_inputs is not None:
        imgs = np.asarray(img_inputs[0])
        # [F*N, H, W, 3] (or [F*N, 3, H, W]); show the first N views
        if imgs.ndim == 4 and imgs.shape[1] == 3 and imgs.shape[-1] != 3:
            imgs = imgs.transpose(0, 2, 3, 1)
        for ci in range(min(n_cam, imgs.shape[0])):
            im = imgs[ci]
            im = (im - im.min()) / max(im.max() - im.min(), 1e-6)
            ax = axes[1][ci]
            ax.imshow(im)
            ax.set_title(f"model input view {ci}", fontsize=7)
            ax.axis("off")
    for ci in range(n_cam, axes.shape[1]):
        axes[0][ci].axis("off")
        axes[1][ci].axis("off")

    # row 2: post-aug BEV points + gt boxes
    ax = axes[2][0]
    pts = sample.get("points")
    if pts is not None:
        pts = np.asarray(pts)
        sel = np.random.RandomState(0).choice(
            len(pts), size=min(len(pts), 60000), replace=False)
        ax.scatter(pts[sel, 0], pts[sel, 1], c=pts[sel, 2], s=0.2,
                   cmap="viridis")
    boxes = sample.get("gt_bboxes_3d")
    if boxes is not None:
        boxes = np.asarray(boxes)
        for b in boxes:
            x, y, dx, dy, yaw = b[0], b[1], b[3], b[4], b[6]
            corners = np.array([[dx, dy], [dx, -dy], [-dx, -dy],
                                [-dx, dy], [dx, dy]]) / 2.0
            rot = np.array([[np.cos(yaw), -np.sin(yaw)],
                            [np.sin(yaw), np.cos(yaw)]])
            cc = corners @ rot.T + [x, y]
            ax.plot(cc[:, 0], cc[:, 1], "r-", lw=0.8)
    ax.set_title("post-aug BEV points + gt", fontsize=8)
    ax.set_aspect("equal")
    for ci in range(1, axes.shape[1]):
        axes[2][ci].axis("off")

    fig.tight_layout()
    fig.savefig(args.out, dpi=110)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
