#!/usr/bin/env python
"""BEV visualization: detections/GT boxes over the point cloud, plus
distillation mask dumps.

Capability parity with the reference's debug harnesses
(reference: tools/visualization/ and the in-model dumps
``save_foreground_mask`` / ``save_attention``,
bevdet_distill.py:1076-1082, 1193-1249 — rendered there with cv2
colormaps; here with matplotlib, decoupled from the model)."""
from __future__ import annotations

import argparse
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))


def draw_bev(points: np.ndarray, gt_boxes=None, pred_boxes=None,
             pc_range=(-51.2, -51.2, 51.2, 51.2), out: str = "bev.png"):
    """Scatter the cloud + rotated box outlines."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from distillbev_tpu.core.bbox import box_np_ops

    fig, ax = plt.subplots(figsize=(10, 10))
    if points is not None and len(points):
        ax.scatter(points[:, 0], points[:, 1], s=0.05, c="gray",
                   alpha=0.5)

    def outline(boxes, color):
        if boxes is None or len(boxes) == 0:
            return
        corners = box_np_ops.center_to_corner_box2d(
            boxes[:, :2], boxes[:, 3:5], boxes[:, 6])
        for quad in corners:
            loop = np.concatenate([quad, quad[:1]], axis=0)
            ax.plot(loop[:, 0], loop[:, 1], color=color, linewidth=0.8)

    outline(gt_boxes, "tab:green")
    outline(pred_boxes, "tab:red")
    ax.set_xlim(pc_range[0], pc_range[2])
    ax.set_ylim(pc_range[1], pc_range[3])
    ax.set_aspect("equal")
    ax.set_title("green = GT, red = predictions")
    fig.savefig(out, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return out


def save_mask_heatmap(mask: np.ndarray, out: str, title: str = ""):
    """Render a [H, W] distillation mask (FG/attention/scale) as a
    colormapped image (the reference's save_foreground_mask /
    save_attention dumps)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(6, 6))
    im = ax.imshow(mask, cmap="viridis", origin="lower")
    fig.colorbar(im, ax=ax)
    if title:
        ax.set_title(title)
    fig.savefig(out, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return out


def dump_distill_masks(gt_boxes: np.ndarray, out_dir: str,
                       h: int = 128, w: int = 128,
                       voxel_size=(0.2, 0.2), pc_range=(-51.2, -51.2),
                       grid=(512, 512)):
    """Compute + dump the FGD masks for one sample's GT set."""
    import os
    import jax.numpy as jnp
    from distillbev_tpu.models.distill import masks as M
    os.makedirs(out_dir, exist_ok=True)
    gt = jnp.asarray(gt_boxes, jnp.float32)[None]
    mask = jnp.ones((1, gt.shape[1]), bool)
    fg, fg_scale, bg_scale = M.foreground_scale_mask(
        gt, mask, h, w, voxel_size, list(pc_range) + [-5.0],
        list(grid) + [1])
    save_mask_heatmap(np.asarray(fg[0]),
                      osp.join(out_dir, "foreground_mask.png"),
                      "foreground mask")
    save_mask_heatmap(np.asarray(fg_scale[0]),
                      osp.join(out_dir, "fg_scale_mask.png"),
                      "fg scale mask")
    return out_dir


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--points", help=".bin point cloud", default=None)
    p.add_argument("--out", default="bev.png")
    a = p.parse_args()
    pts = np.fromfile(a.points, dtype=np.float32).reshape(-1, 5) \
        if a.points else np.zeros((0, 5))
    draw_bev(pts, out=a.out)
    print(f"wrote {a.out}")
