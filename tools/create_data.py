#!/usr/bin/env python
"""Dataset preparation CLI (reference: tools/create_data.py:47-245 —
nuScenes info pkls + GT database, incl. --virtual MVP variant).

Requires the nuScenes devkit on the host that prepares data; the
training/eval code itself never needs it.  Info pkls produced here match
the reference format so either framework can consume them.
"""
from __future__ import annotations

import argparse
import os.path as osp
import pickle
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def nuscenes_data_prep(root_path: str, info_prefix: str, version: str,
                       max_sweeps: int = 10, virtual: bool = False,
                       skip_2d: bool = False):
    """Info pkls + 2-D coco json + GT database
    (reference: tools/create_data.py:47-88 nuscenes_data_prep)."""
    try:
        from nuscenes.nuscenes import NuScenes  # noqa: F401
        from nuscenes.utils import splits  # noqa: F401
    except ImportError:
        raise SystemExit(
            "nuScenes devkit not installed on this host. Run data "
            "preparation on a machine with `pip install nuscenes-devkit`"
            " — the generated pkls are portable.")
    from tools.data_converter import nuscenes_converter
    nuscenes_converter.create_nuscenes_infos(
        root_path, info_prefix, version=version, max_sweeps=max_sweeps)
    if version == "v1.0-test":
        if not skip_2d:
            nuscenes_converter.export_2d_annotation(
                root_path,
                osp.join(root_path, f"{info_prefix}_infos_test.pkl"),
                version=version)
        return
    if not skip_2d:
        for split in ("train", "val"):
            nuscenes_converter.export_2d_annotation(
                root_path,
                osp.join(root_path, f"{info_prefix}_infos_{split}.pkl"),
                version=version)
    create_groundtruth_database(root_path, info_prefix, virtual=virtual)


def create_groundtruth_database(root_path: str, info_prefix: str,
                                virtual: bool = False):
    """Build the GT-paste database (reference: tools/data_converter/
    create_gt_database.py): crop each annotated box's points into
    per-instance .bin files + an info pkl."""
    from distillbev_tpu.core.bbox import box_np_ops
    import os
    info_path = osp.join(root_path, f"{info_prefix}_infos_train.pkl")
    with open(info_path, "rb") as f:
        infos = pickle.load(f)["infos"]
    db_dir = osp.join(root_path, f"{info_prefix}_gt_database")
    os.makedirs(db_dir, exist_ok=True)
    db_infos = {}
    for info in infos:
        pts = np.fromfile(info["lidar_path"],
                          dtype=np.float32).reshape(-1, 5)
        boxes = np.asarray(info["gt_boxes"], np.float32)
        names = info["gt_names"]
        if len(boxes) == 0:
            continue
        # stored z is gravity center; shift to bottom for the test
        b = boxes.copy()
        b[:, 2] -= b[:, 5] / 2
        inside = box_np_ops.points_in_rbbox(pts, b)
        for i, name in enumerate(names):
            obj_pts = pts[inside[:, i]]
            obj_pts[:, :3] -= b[i, :3]
            fn = f"{info['token']}_{name}_{i}.bin"
            obj_pts.tofile(osp.join(db_dir, fn))
            db_infos.setdefault(name, []).append(dict(
                name=name, path=osp.join(
                    f"{info_prefix}_gt_database", fn),
                gt_idx=i, box3d_lidar=b[i],
                num_points_in_gt=int(inside[:, i].sum()),
                difficulty=0))
    out = osp.join(root_path, f"{info_prefix}_dbinfos_train.pkl")
    with open(out, "wb") as f:
        pickle.dump(db_infos, f)
    print(f"wrote {out}: "
          f"{ {k: len(v) for k, v in db_infos.items()} }")


def parse_args():
    p = argparse.ArgumentParser(description="Data converter")
    p.add_argument("dataset", choices=["nuscenes"])
    p.add_argument("--root-path", default="./data/nuscenes")
    p.add_argument("--out-dir", default=None)
    p.add_argument("--extra-tag", default="nuscenes")
    p.add_argument("--version", default="v1.0-trainval")
    p.add_argument("--max-sweeps", type=int, default=10)
    p.add_argument("--virtual", action="store_true",
                   help="MVP virtual-point database")
    p.add_argument("--db-only", action="store_true",
                   help="only rebuild the GT database from existing "
                        "info pkls (devkit-free)")
    p.add_argument("--skip-2d", action="store_true",
                   help="skip the mono3d 2-D coco-json export")
    return p.parse_args()


if __name__ == "__main__":
    args = parse_args()
    if args.db_only:
        create_groundtruth_database(args.root_path, args.extra_tag,
                                    virtual=args.virtual)
    else:
        nuscenes_data_prep(args.root_path, args.extra_tag, args.version,
                           args.max_sweeps, args.virtual,
                           skip_2d=args.skip_2d)
