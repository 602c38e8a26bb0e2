#!/usr/bin/env python
"""Multi-view camera + BEV composite renderer for saved detections.

Capability parity with the reference's prediction visualizer
(reference: tools/analysis_tools/vis.py:1-337 — projects predicted 3D
boxes onto the six nuScenes camera images, overlays depth-coloured
lidar points, stitches a 3x2 camera canvas with a BEV pane, and writes
a video), rebuilt devkit-free: all geometry comes straight from the
info pickle's per-camera ``sensor2lidar_rotation/translation`` and
``cam_intrinsic`` (the same fields the loader uses), so it runs
without the nuscenes devkit or a metadata DB.

Usage:
  python tools/visualization/vis_camera.py CONFIG --result RESULTS.pkl \
      [--show-dir DIR] [--num-samples N] [--video out.mp4] [--score-thr S]
"""
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
from distillbev_tpu.core.bbox import box_np_ops
from distillbev_tpu.datasets import build_dataset

CAM_LAYOUT = [  # canvas rows of the reference composite (vis.py:229-247)
    ["CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT"],
    ["CAM_BACK_LEFT", "CAM_BACK", "CAM_BACK_RIGHT"],
]
# class -> BGR colour, mirrors the reference's per-class palette intent
PALETTE = {
    "car": (80, 200, 80), "truck": (60, 160, 220),
    "construction_vehicle": (40, 110, 240), "bus": (0, 215, 255),
    "trailer": (180, 130, 70), "barrier": (160, 160, 160),
    "motorcycle": (220, 80, 220), "bicycle": (255, 120, 0),
    "pedestrian": (60, 60, 230), "traffic_cone": (0, 165, 255),
}
DEFAULT_COLOR = (200, 200, 40)


def depth_to_color(depth: np.ndarray) -> np.ndarray:
    """Rainbow ramp over depth, vectorized (reference vis.py:20-32
    ``depth2color`` evaluates the same 6-stop ramp per point)."""
    stops = np.array([[200, 0, 200], [200, 0, 0], [200, 200, 0],
                      [0, 200, 0], [0, 200, 200], [0, 0, 200]],
                     np.float32)
    g = np.clip((depth + 2.5) / 60.0, 0.0, 1.0) * (len(stops) - 1)
    lo = np.clip(np.floor(g).astype(np.int64), 0, len(stops) - 2)
    frac = (g - lo)[:, None]
    return stops[lo] * (1 - frac) + stops[lo + 1] * frac


def lidar_to_img(pts_lidar: np.ndarray, cam_info: dict):
    """Project lidar-frame points to pixel coords + validity
    (reference vis.py:35-53 ``lidar2img``; same inverse-extrinsic
    chain, but built from the info fields without pyquaternion)."""
    c2l = np.eye(4, dtype=np.float64)
    c2l[:3, :3] = np.asarray(cam_info["sensor2lidar_rotation"])
    c2l[:3, 3] = np.asarray(cam_info["sensor2lidar_translation"])
    l2c = np.linalg.inv(c2l)
    pts = np.concatenate(
        [pts_lidar, np.ones((len(pts_lidar), 1), pts_lidar.dtype)], 1)
    cam = pts @ l2c.T
    depth = cam[:, 2].copy()
    valid = depth > 0.5
    cam = cam[:, :3] / np.maximum(depth[:, None], 1e-6)
    img = cam @ np.asarray(cam_info["cam_intrinsic"]).T
    return img[:, :2], depth, valid


# 12 wireframe edges over the corner order center_to_corner_box3d emits
BOX_EDGES = [(0, 1), (1, 2), (2, 3), (3, 0),
             (4, 5), (5, 6), (6, 7), (7, 4),
             (0, 4), (1, 5), (2, 6), (3, 7)]


def draw_boxes_on_image(img, boxes, names, cam_info, color_by_class=True):
    """Wireframe 3D boxes clipped to the camera frustum."""
    import cv2
    if boxes is None or len(boxes) == 0:
        return img
    corners = box_np_ops.center_to_corner_box3d(
        boxes[:, :3], boxes[:, 3:6], boxes[:, 6])  # [N, 8, 3]
    flat = corners.reshape(-1, 3)
    pix, depth, valid = lidar_to_img(flat, cam_info)
    pix = pix.reshape(len(boxes), 8, 2)
    valid = valid.reshape(len(boxes), 8)
    h, w = img.shape[:2]
    for i in range(len(boxes)):
        if not valid[i].any():
            continue
        color = (PALETTE.get(str(names[i]), DEFAULT_COLOR)
                 if color_by_class else DEFAULT_COLOR)
        for a, b in BOX_EDGES:
            if not (valid[i, a] and valid[i, b]):
                continue
            pa = tuple(np.round(pix[i, a]).astype(int))
            pb = tuple(np.round(pix[i, b]).astype(int))
            if (max(pa[0], pb[0]) < 0 or min(pa[0], pb[0]) >= w
                    or max(pa[1], pb[1]) < 0 or min(pa[1], pb[1]) >= h):
                continue
            cv2.line(img, pa, pb, color, 2, cv2.LINE_AA)
    return img


def draw_points_on_image(img, points, cam_info, step=3):
    import cv2
    pix, depth, valid = lidar_to_img(points[::step, :3], cam_info)
    h, w = img.shape[:2]
    ok = (valid & (pix[:, 0] >= 0) & (pix[:, 0] < w)
          & (pix[:, 1] >= 0) & (pix[:, 1] < h))
    cols = depth_to_color(depth[ok])
    for (x, y), c in zip(pix[ok].astype(int), cols):
        cv2.circle(img, (x, y), 1, tuple(float(v) for v in c), -1)
    return img


def bev_pane(points, pred_boxes, pred_names, gt_boxes, size=900,
             show_range=55.0):
    """Top-down pane: grey cloud, green GT, class-coloured preds
    (reference vis.py BEV canvas)."""
    import cv2
    canvas = np.zeros((size, size, 3), np.uint8)

    def to_px(xy):
        u = ((xy[:, 0] + show_range) / (2 * show_range)) * (size - 1)
        v = ((show_range - xy[:, 1]) / (2 * show_range)) * (size - 1)
        return np.stack([u, v], -1)

    if points is not None and len(points):
        px = to_px(points[:, :2]).astype(int)
        ok = ((px[:, 0] >= 0) & (px[:, 0] < size)
              & (px[:, 1] >= 0) & (px[:, 1] < size))
        canvas[px[ok, 1], px[ok, 0]] = (90, 90, 90)

    def outline(boxes, names, default):
        if boxes is None or len(boxes) == 0:
            return
        quads = box_np_ops.center_to_corner_box2d(
            boxes[:, :2], boxes[:, 3:5], boxes[:, 6])
        for i, quad in enumerate(quads):
            color = (PALETTE.get(str(names[i]), default)
                     if names is not None else default)
            pts = to_px(quad).astype(np.int32)
            cv2.polylines(canvas, [pts], True, color, 2)

    outline(gt_boxes, None, (0, 255, 0))
    outline(pred_boxes, pred_names, DEFAULT_COLOR)
    # ego marker
    cv2.circle(canvas, (size // 2, size // 2), 5, (255, 255, 255), -1)
    return canvas


def compose_frame(info, points, pred_boxes, pred_names, gt_boxes,
                  img_root="", draw_points=False, cam_width=800):
    """3x2 camera grid + square BEV pane on the right."""
    import cv2
    rows = []
    for layout_row in CAM_LAYOUT:
        row_imgs = []
        for cam in layout_row:
            cam_info = info["cams"][cam]
            path = cam_info.get("data_path", "")
            if img_root and not osp.isabs(path):
                path = osp.join(img_root, path)
            img = cv2.imread(path) if path and osp.exists(path) else None
            if img is None:
                img = np.zeros((900, 1600, 3), np.uint8)
            if draw_points and points is not None:
                img = draw_points_on_image(img, points, cam_info)
            img = draw_boxes_on_image(img, pred_boxes, pred_names, cam_info)
            scale = cam_width / img.shape[1]
            img = cv2.resize(img, (cam_width, int(img.shape[0] * scale)))
            cv2.putText(img, cam, (12, 36), cv2.FONT_HERSHEY_SIMPLEX,
                        1.0, (255, 255, 255), 2, cv2.LINE_AA)
            row_imgs.append(img)
        rows.append(np.concatenate(row_imgs, axis=1))
    grid = np.concatenate(rows, axis=0)
    bev = bev_pane(points, pred_boxes, pred_names, gt_boxes,
                   size=grid.shape[0])
    return np.concatenate([grid, bev], axis=1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--result", required=True,
                   help="results pickle from tools/test.py --out")
    p.add_argument("--show-dir", default="work_dirs/vis_camera")
    p.add_argument("--num-samples", type=int, default=10)
    p.add_argument("--score-thr", type=float, default=0.25)
    p.add_argument("--draw-points", action="store_true",
                   help="overlay depth-coloured lidar points on cameras")
    p.add_argument("--video", default=None,
                   help="also write an mp4 at this path (reference "
                        "vis.py --format video)")
    p.add_argument("--fps", type=int, default=6)
    p.add_argument("--cfg-options", nargs="+",
                   action=DictAction.argparse())
    args = p.parse_args()

    import cv2
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)
    ds = build_dataset(dict(cfg["data"]["val"]))
    with open(args.result, "rb") as f:
        results = pickle.load(f)
    os.makedirs(args.show_dir, exist_ok=True)

    writer = None
    n = min(args.num_samples, len(results), len(ds))
    for i in range(n):
        info = ds.data_infos[i]
        res = results[i]
        det = res.get("pts_bbox", res) if isinstance(res, dict) else res
        boxes = np.asarray(det["boxes_3d"], np.float64)
        scores = np.asarray(det["scores_3d"], np.float64)
        labels = np.asarray(det["labels_3d"], np.int64)
        keep = scores >= args.score_thr
        boxes, labels = boxes[keep], labels[keep]
        classes = list(getattr(ds, "CLASSES", [])) or sorted(PALETTE)
        names = [classes[l] if l < len(classes) else str(l)
                 for l in labels]
        points = None
        if args.draw_points:
            lp = info.get("lidar_path", "")
            if lp and osp.exists(lp):
                points = np.fromfile(lp, np.float32).reshape(-1, 5)[:, :3]
        gt = info.get("gt_boxes")
        gt = np.asarray(gt, np.float64) if gt is not None and len(gt) \
            else None
        frame = compose_frame(info, points, boxes, names, gt,
                              img_root=getattr(ds, "data_root", ""),
                              draw_points=args.draw_points)
        out_path = osp.join(args.show_dir, f"sample_{i:04d}.jpg")
        cv2.imwrite(out_path, frame)
        if args.video:
            if writer is None:
                writer = cv2.VideoWriter(
                    args.video, cv2.VideoWriter_fourcc(*"mp4v"),
                    args.fps, (frame.shape[1], frame.shape[0]))
            writer.write(frame)
        print(f"[{i + 1}/{n}] {out_path}")
    if writer is not None:
        writer.release()
        print(f"video: {args.video}")


if __name__ == "__main__":
    main()
