"""End-to-end throughput: the REAL train loop with the loader in it.

VERDICT r2 #4: bench.py measures a resident synthetic batch; this tool
measures what a user actually gets — synthetic nuScenes-shaped files on
disk (full-size 900x1600 JPEGs, ~300k-point lidar bins, adjacent-frame
chains), the shipped flagship distill config's REAL pipeline
(LoadMultiViewImageFromFiles_BEVDet sequential + PointToMultiViewDepth
+ BEV aug + format/collect), fork-worker dataloader, and
``apis.train.train_model``'s jitted distill step on the chip.  Reports:

* sustained samples/s between metric-log sync points (steps after the
  first log window, i.e. compile excluded),
* loader-only samples/s (same dataset/pipeline, no device step) and the
  implied loader occupancy at the measured step rate.

Usage: python tools/analysis_tools/e2e_bench.py [workdir]
Env: E2E_SAMPLES (24) E2E_BATCH (4) E2E_WORKERS (4) E2E_STEPS (12)
     E2E_IMG ("900x1600") E2E_POINTS (280000) E2E_KEEP (0)
"""
import json
import os
import os.path as osp
import pickle
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

CAMS = ["CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
        "CAM_BACK_LEFT", "CAM_BACK", "CAM_BACK_RIGHT"]


def gen_fullsize_nuscenes(root, n_samples, img_hw, n_points):
    """nuScenes-shaped synthetic data at real sizes: JPEG size, lidar
    bin size, intrinsics, and the prev/next adjacency the
    bevdet_sequential prototype walks (tests/test_datasets.py
    make_mini_nuscenes is the same scheme at toy sizes)."""
    from PIL import Image
    rng = np.random.RandomState(0)
    os.makedirs(osp.join(root, "samples"), exist_ok=True)
    h, w = img_hw
    # one textured base image per camera, re-noised per sample: keeps
    # generation fast but JPEG decode cost real
    base = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
    infos = []
    for i in range(n_samples):
        lidar_path = osp.join(root, "samples", f"lidar_{i}.bin")
        pts = np.empty((n_points, 5), np.float32)
        pts[:, 0] = rng.uniform(-52, 52, n_points)
        pts[:, 1] = rng.uniform(-52, 52, n_points)
        pts[:, 2] = rng.uniform(-4, 2, n_points)
        pts[:, 3] = rng.uniform(0, 255, n_points)
        pts[:, 4] = 0.0
        pts.tofile(lidar_path)
        cams = {}
        for ci, cam in enumerate(CAMS):
            img_path = osp.join(root, "samples", f"img_{i}_{cam}.jpg")
            im = base.copy()
            im[:64] = rng.randint(0, 255, (64, w, 3), dtype=np.uint8)
            Image.fromarray(im).save(img_path, quality=90)
            yaw = 2 * np.pi * ci / 6
            s2l_rot = np.array(
                [[np.cos(yaw), 0, np.sin(yaw)],
                 [np.sin(yaw), 0, -np.cos(yaw)], [0, -1, 0]])
            cams[cam] = dict(
                data_path=img_path,
                cam_intrinsic=np.array(
                    [[1266.4, 0, w / 2], [0, 1266.4, h / 2],
                     [0, 0, 1.0]]),
                sensor2lidar_rotation=s2l_rot,
                sensor2lidar_translation=np.array([0.0, 0.0, 1.5]),
                sensor2ego_rotation=[1, 0, 0, 0],
                sensor2ego_translation=[0, 0, 1.5],
                ego2global_rotation=[1, 0, 0, 0],
                ego2global_translation=[i * 2.0, 0, 0])
        n_box = 32
        boxes = np.zeros((n_box, 7))
        boxes[:, :2] = rng.uniform(-45, 45, (n_box, 2))
        boxes[:, 2] = rng.uniform(-1, 0, n_box)
        boxes[:, 3:6] = rng.uniform(1, 4, (n_box, 3))
        boxes[:, 6] = rng.uniform(-np.pi, np.pi, n_box)
        names = rng.choice(["car", "truck", "bus", "pedestrian",
                            "bicycle"], n_box)
        infos.append(dict(
            token=f"tok_{i}", lidar_path=lidar_path,
            timestamp=5e5 * i, sweeps=[], cams=cams,
            lidar2ego_rotation=[1, 0, 0, 0],
            lidar2ego_translation=[0, 0, 1.8],
            ego2global_rotation=[1, 0, 0, 0],
            ego2global_translation=[i * 2.0, 0, 0],
            gt_boxes=boxes, gt_names=names,
            gt_velocity=rng.uniform(-2, 2, (n_box, 2)),
            num_lidar_pts=np.full(n_box, 10),
            valid_flag=np.ones(n_box, bool), velo=np.zeros(2),
            prev=None, next=None))
    for i in range(n_samples):
        if i > 0:
            infos[i]["prev"] = dict(
                timestamp=infos[i - 1]["timestamp"],
                cams=infos[i - 1]["cams"],
                ego2global_rotation=[1, 0, 0, 0],
                ego2global_translation=[(i - 1) * 2.0, 0, 0])
        if i < n_samples - 1:
            infos[i]["next"] = dict(
                timestamp=infos[i + 1]["timestamp"],
                cams=infos[i + 1]["cams"],
                ego2global_rotation=[1, 0, 0, 0],
                ego2global_translation=[(i + 1) * 2.0, 0, 0])
    ann = osp.join(root, "infos.pkl")
    with open(ann, "wb") as f:
        pickle.dump(dict(infos=infos,
                         metadata=dict(version="v1.0-trainval")), f)
    return ann


def point_config_at(train_cfg: dict, data_root: str, ann_file: str):
    """Point a train-data config dict at generated data IN PLACE: the
    dataset's ann_file/data_root AND every pipeline transform's baked
    ``root_path`` (the config files bake root_path=data_root into the
    image loaders — overriding only the dataset field leaves the
    loaders resolving against the repo-relative default)."""
    train_cfg["ann_file"] = ann_file
    train_cfg["data_root"] = data_root
    for t in train_cfg.get("pipeline", []):
        if "root_path" in t:
            t["root_path"] = data_root
    return train_cfg


def main():
    repo = osp.join(osp.dirname(__file__), "..", "..")
    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="e2e_bench_")
    n_samples = int(os.environ.get("E2E_SAMPLES", "24"))
    batch = int(os.environ.get("E2E_BATCH", "4"))
    workers = int(os.environ.get("E2E_WORKERS", "4"))
    steps = int(os.environ.get("E2E_STEPS", "12"))
    h, w = (int(v) for v in os.environ.get("E2E_IMG",
                                           "900x1600").split("x"))
    n_points = int(os.environ.get("E2E_POINTS", "280000"))

    data_root = osp.join(workdir, "data")
    t0 = time.time()
    ann = gen_fullsize_nuscenes(data_root, n_samples, (h, w), n_points)
    print(f"data gen: {n_samples} samples in {time.time() - t0:.1f}s "
          f"({h}x{w} JPEG x6, {n_points}-pt bins)", flush=True)

    from distillbev_tpu.config import Config
    cfg = Config.fromfile(osp.join(
        repo, "configs/lidar2camera_bev_distillation/"
        "centerpoint_pillar_to_bevdepth4d_r50/centerpoint_02pillar_"
        "second_secfpn_circlenms_8x4_cyclic_20e_nus_to_bevdepth4d_"
        "r50.py"))
    tr = point_config_at(cfg.data["train"], data_root, ann)
    cfg.data["samples_per_gpu"] = batch
    cfg.data["workers_per_gpu"] = workers
    cfg.data.pop("val", None)
    cfg.data.pop("test", None)
    cfg._cfg_dict["log_config"] = dict(interval=2)
    cfg._cfg_dict["evaluation"] = dict(interval=0)
    cfg._cfg_dict["runner"] = dict(type="EpochBasedRunner",
                                   max_epochs=1)
    cfg._cfg_dict["fp16"] = dict(loss_scale=512.0)  # bf16 path
    cfg._cfg_dict["checkpoint_config"] = dict(max_keep_ckpts=1)

    # ---- loader-only rate (same dataset + pipeline, no device) ----
    from distillbev_tpu.datasets import build_dataset, build_dataloader
    ds = build_dataset(tr)
    loader = build_dataloader(ds, batch, workers, shuffle=True, seed=0)
    it = iter(loader)
    next(it)                                    # warm the workers
    t0 = time.time()
    n_loader = min(steps, len(loader) - 1)
    for _ in range(n_loader):
        next(it)
    loader_rate = n_loader * batch / (time.time() - t0)
    print(f"loader-only: {loader_rate:.2f} samples/s "
          f"({workers} fork workers)", flush=True)
    del it, loader

    # ---- real train loop on the chip ----
    from distillbev_tpu.apis.train import train_model
    train_work = osp.join(workdir, "train")
    t0 = time.time()
    train_model(cfg, train_work, max_steps_per_epoch=steps)
    wall = time.time() - t0

    recs = [json.loads(l) for l in
            open(osp.join(train_work, "tb", "metrics.jsonl"))]
    # each metrics write host-syncs; rate between the first and last
    # write excludes compile (which is inside the first window)
    if len(recs) >= 2:
        span = recs[-1]["ts"] - recs[0]["ts"]
        n_steps = recs[-1]["step"] - recs[0]["step"]
        sustained = n_steps * batch / span
    else:
        sustained = float("nan")
    occupancy = sustained / loader_rate if loader_rate else float("nan")
    out = {
        "metric": "e2e_train_samples_per_sec",
        "value": round(sustained, 3),
        "unit": "samples/s",
        "loader_only_samples_per_sec": round(loader_rate, 3),
        "loader_occupancy_at_step_rate": round(occupancy, 3),
        "batch": batch, "workers": workers,
        "measured_steps": recs[-1]["step"] - recs[0]["step"]
        if len(recs) >= 2 else 0,
        "total_wall_incl_compile_s": round(wall, 1),
    }
    print(json.dumps(out))
    if os.environ.get("E2E_KEEP", "0") != "1":
        shutil.rmtree(data_root, ignore_errors=True)


if __name__ == "__main__":
    main()
