#!/usr/bin/env python
"""Input-pipeline throughput benchmark at real nuScenes sizes.

The reference never measures its dataloader; SURVEY.md §7 flags input
throughput (12 JPEG decodes + 10-sweep lidar + depth projection per
sample) as a risk for the >=2x step-time target.  This tool synthesizes
a realistic-size shard (6 cams x 900x1600 JPEG, 10 x ~34k-point sweep
bins per sample), runs the REAL BEVDepth4D training pipeline
(sequential 12-image loading + aug homographies, multi-sweep
aggregation through the native C++ kernels when available, depth
projection, BEV-space aug, padded collation) through the thread-
prefetched DataLoader, and prints samples/s per worker count.

Usage: python tools/analysis_tools/io_bench.py [--samples 16]
       [--workers 1 4 8] [--root DIR]
"""
from __future__ import annotations

import argparse
import os
import os.path as osp
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))

CAMS = ["CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
        "CAM_BACK_LEFT", "CAM_BACK", "CAM_BACK_RIGHT"]
PCR = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]
DATA_CONFIG = {
    "cams": CAMS, "Ncams": 6, "input_size": (256, 704),
    "src_size": (900, 1600), "resize": (-0.06, 0.11), "rot": (-5.4, 5.4),
    "flip": True, "crop_h": (0.0, 0.0), "resize_test": 0.0,
}


def synthesize(root: str, n_samples: int, pts_per_sweep: int = 34000,
               n_sweeps: int = 9) -> str:
    """Write a realistic-size synthetic shard; returns the info pkl."""
    from PIL import Image
    rng = np.random.RandomState(0)
    os.makedirs(osp.join(root, "samples"), exist_ok=True)
    ann = osp.join(root, "infos.pkl")
    if osp.exists(ann):
        return ann
    # one photo-like image reused across cams (decode cost is identical).
    # Smooth structure + mild noise: uniform noise makes JPEG entropy
    # decoding ~10x more expensive than real street photos and would
    # overstate the decode cost
    yy, xx = np.mgrid[0:900, 0:1600].astype(np.float32)
    base = np.stack([
        120 + 60 * np.sin(xx / 97) + 40 * np.cos(yy / 53),
        100 + 80 * np.cos(xx / 71 + yy / 131),
        90 + 70 * np.sin((xx + yy) / 149)], -1)
    base += rng.randn(900, 1600, 3) * 6
    base = np.clip(base, 0, 255).astype(np.uint8)
    infos = []
    for i in range(n_samples):
        lidar_path = osp.join(root, "samples", f"lidar_{i}.bin")
        pts = rng.uniform(-50, 50, (pts_per_sweep, 5)).astype(np.float32)
        pts.tofile(lidar_path)
        sweeps = []
        for s in range(n_sweeps):
            sp = osp.join(root, "samples", f"sweep_{i}_{s}.bin")
            rng.uniform(-50, 50, (pts_per_sweep, 5)).astype(
                np.float32).tofile(sp)
            sweeps.append(dict(
                data_path=sp,
                sensor2lidar_rotation=np.eye(3),
                sensor2lidar_translation=np.zeros(3),
                timestamp=(i * 1e6 - (s + 1) * 5e4)))
        cams = {}
        for ci, cam in enumerate(CAMS):
            img_path = osp.join(root, "samples", f"img_{i}_{cam}.jpg")
            if not osp.exists(img_path):
                Image.fromarray(base).save(img_path, quality=90)
            yaw = 2 * np.pi * ci / 6
            s2l = np.array([[np.cos(yaw), 0, np.sin(yaw)],
                            [np.sin(yaw), 0, -np.cos(yaw)], [0, -1, 0]])
            cams[cam] = dict(
                data_path=img_path,
                cam_intrinsic=np.array([[1200.0, 0, 800], [0, 1200.0,
                                                           450],
                                        [0, 0, 1]]),
                sensor2lidar_rotation=s2l,
                sensor2lidar_translation=np.array([0.0, 0.0, 1.5]),
                sensor2ego_rotation=[1, 0, 0, 0],
                sensor2ego_translation=[0, 0, 1.5],
                ego2global_rotation=[1, 0, 0, 0],
                ego2global_translation=[i * 2.0, 0, 0])
        n_box = 30
        rngb = np.random.RandomState(i)
        boxes = np.concatenate([
            rngb.uniform(-40, 40, (n_box, 2)),
            rngb.uniform(-2, 0, (n_box, 1)),
            rngb.uniform(1, 5, (n_box, 3)),
            rngb.uniform(-np.pi, np.pi, (n_box, 1))], axis=1)
        velocity = rngb.uniform(-5, 5, (n_box, 2))
        infos.append(dict(
            token=f"tok{i}", lidar_path=lidar_path, sweeps=sweeps,
            cams=cams, timestamp=i * 1e6,
            lidar2ego_rotation=[1, 0, 0, 0],
            lidar2ego_translation=[0, 0, 1.8],
            ego2global_rotation=[1, 0, 0, 0],
            ego2global_translation=[i * 2.0, 0, 0],
            gt_boxes=boxes,
            gt_names=np.array(["car"] * n_box),
            gt_velocity=velocity,
            num_lidar_pts=np.full(n_box, 10),
            num_radar_pts=np.zeros(n_box),
            valid_flag=np.ones(n_box, bool),
            velo=np.zeros(2), prev=None, next=None))
    for i in range(n_samples):          # adjacency chain
        for attr, j in (("prev", i - 1), ("next", i + 1)):
            if 0 <= j < n_samples:
                infos[i][attr] = dict(
                    timestamp=infos[j]["timestamp"],
                    cams=infos[j]["cams"],
                    ego2global_rotation=[1, 0, 0, 0],
                    ego2global_translation=[j * 2.0, 0, 0])
    with open(ann, "wb") as f:
        pickle.dump(dict(infos=infos, metadata=dict(version="io-bench")),
                    f)
    return ann


def pipeline():
    return [
        dict(type="LoadMultiViewImageFromFiles_BEVDet",
             data_config=DATA_CONFIG, is_train=True, sequential=True,
             aligned=True, trans_only=False),
        dict(type="LoadPointsFromFile", load_dim=5,
             use_dim=[0, 1, 2, 3, 4]),
        dict(type="LoadPointsFromMultiSweeps", sweeps_num=9,
             load_dim=5, use_dim=[0, 1, 2, 4], use_native=True,
             native_max_points=350000),
        dict(type="LoadAnnotations3D"),
        dict(type="PointToMultiViewDepth", downsample=16,
             grid_config={"dbound": [1.0, 60.0, 1.0]}),
        dict(type="GlobalRotScaleTrans", rot_range=[-0.3925, 0.3925],
             scale_ratio_range=[0.95, 1.05], update_img2lidar=True),
        dict(type="RandomFlip3D", flip_ratio_bev_horizontal=0.5,
             update_img2lidar=True),
        dict(type="PointsRangeFilter", point_cloud_range=PCR),
        dict(type="ObjectRangeFilter", point_cloud_range=PCR),
        dict(type="Collect3D",
             keys=["points", "gt_bboxes_3d", "img_inputs"],
             max_points=300000, max_objs=500),
    ]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=16)
    ap.add_argument("--workers", type=int, nargs="+", default=[1, 4, 8])
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--root", default="/tmp/dbev_io_bench")
    args = ap.parse_args()

    from distillbev_tpu import native
    from distillbev_tpu.datasets import NuScenesDataset, build_dataloader

    print(f"native C++ pipeline kernels: "
          f"{'available' if native.available() else 'numpy fallback'}")
    print(f"host CPUs: {os.cpu_count()} — worker processes scale with "
          f"cores; a 1-CPU sandbox serializes them")
    ann = synthesize(args.root, args.samples)
    ds = NuScenesDataset(
        ann_file=ann, pipeline=pipeline(),
        img_info_prototype="bevdet_sequential",
        speed_mode="abs_dis", max_interval=9, min_interval=0,
        test_mode=False, use_valid_flag=True)

    for w in args.workers:
        loader = build_dataloader(ds, samples_per_gpu=args.batch,
                                  workers_per_gpu=w, shuffle=True,
                                  seed=0)
        # warm epoch (page cache, native build)
        for _ in loader:
            pass
        t0 = time.perf_counter()
        n = 0
        for _ in range(args.epochs):
            for batch in loader:
                n += args.batch
        dt = time.perf_counter() - t0
        print(f"workers={w:2d}: {n / dt:6.2f} samples/s "
              f"({dt / n * 1000:.0f} ms/sample)")


if __name__ == "__main__":
    main()
