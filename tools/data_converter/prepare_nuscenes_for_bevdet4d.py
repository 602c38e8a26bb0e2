#!/usr/bin/env python
"""Augment nuScenes info pkls with adjacent camera frames for BEVDet4D.

Capability parity with the reference converter
(reference: tools/data_converter/prepare_nuscenes_for_bevdet4d.py:10-60+
— walks the sample_data chain of CAM_FRONT, collects prev/next camera
frames every ``interval`` sweeps up to ``max_adj``, interpolates ego
velocity, writes ``*_4d_interval{i}_max{m}.pkl``).

Requires the devkit only at preparation time.
"""
from __future__ import annotations

import argparse
import os.path as osp
import pickle

import numpy as np

CAM_NAMES = ["CAM_FRONT_LEFT", "CAM_FRONT", "CAM_FRONT_RIGHT",
             "CAM_BACK_LEFT", "CAM_BACK", "CAM_BACK_RIGHT"]


def add_adjacent_frames(root_path: str, info_path: str,
                        interval: int = 3, max_adj: int = 60):
    try:
        from nuscenes.nuscenes import NuScenes
    except ImportError:
        raise SystemExit("nuScenes devkit required for preparation; the "
                         "output pkl is portable.")
    with open(info_path, "rb") as f:
        data = pickle.load(f)
    infos = data["infos"]
    version = data.get("metadata", {}).get("version", "v1.0-trainval")
    nusc = NuScenes(version=version, dataroot=root_path, verbose=False)

    for info in infos:
        sample = nusc.get("sample", info["token"])

        def walk(direction):
            frames = []
            sd_tokens = {cam: nusc.get(
                "sample_data", sample["data"][cam]) for cam in CAM_NAMES}
            count = 0
            while count < max_adj * interval:
                nxt = {}
                ok = True
                for cam, sd in sd_tokens.items():
                    t = sd[direction]
                    if t == "":
                        ok = False
                        break
                    nxt[cam] = nusc.get("sample_data", t)
                if not ok:
                    break
                sd_tokens = nxt
                count += 1
                if count % interval == 0:
                    cams = {}
                    for cam, sd in sd_tokens.items():
                        ego = nusc.get("ego_pose",
                                       sd["ego_pose_token"])
                        cal = nusc.get("calibrated_sensor",
                                       sd["calibrated_sensor_token"])
                        cams[cam] = dict(
                            data_path=osp.join(root_path,
                                               sd["filename"]),
                            ego2global_translation=ego["translation"],
                            ego2global_rotation=ego["rotation"],
                            sensor2ego_translation=cal["translation"],
                            sensor2ego_rotation=cal["rotation"])
                    ref = sd_tokens["CAM_FRONT"]
                    ego = nusc.get("ego_pose", ref["ego_pose_token"])
                    frames.append(dict(
                        timestamp=ref["timestamp"], cams=cams,
                        ego2global_translation=ego["translation"],
                        ego2global_rotation=ego["rotation"]))
            return frames

        info["prev"] = walk("prev") or None
        info["next"] = walk("next") or None
        # interpolated ego velocity from neighbors (reference behaviour)
        def pos_of(frame_list):
            if not frame_list:
                return None, None
            fr = frame_list[0]
            return (np.asarray(fr["ego2global_translation"]),
                    fr["timestamp"] / 1e6)
        p_prev, t_prev = pos_of(info["prev"])
        p_next, t_next = pos_of(info["next"])
        p_cur = np.asarray(info["ego2global_translation"])
        t_cur = info["timestamp"] / 1e6
        if p_prev is not None and t_cur != t_prev:
            velo = (p_cur - p_prev)[:2] / (t_cur - t_prev)
        elif p_next is not None and t_next != t_cur:
            velo = (p_next - p_cur)[:2] / (t_next - t_cur)
        else:
            velo = np.zeros(2)
        info["velo"] = np.asarray(velo, np.float32)

    out = info_path.replace(
        ".pkl", f"_4d_interval{interval}_max{max_adj}.pkl")
    with open(out, "wb") as f:
        pickle.dump(data, f)
    print(f"wrote {out} ({len(infos)} samples)")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--root-path", default="./data/nuscenes")
    p.add_argument("--info-path", required=True)
    p.add_argument("--interval", type=int, default=3)
    p.add_argument("--max-adj", type=int, default=60)
    a = p.parse_args()
    add_adjacent_frames(a.root_path, a.info_path, a.interval, a.max_adj)
