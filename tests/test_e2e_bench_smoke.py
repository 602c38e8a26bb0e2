"""Smoke for tools/analysis_tools/e2e_bench.py (VERDICT r3 #5): the
synthetic full-pipeline data generator and the real loader path the
tool benches must keep working.  The device train-loop half of the
tool is apis.train.train_model, already covered end-to-end by
test_train_e2e.py — re-jitting it here would only re-pay minutes of
XLA:CPU compile.
"""
import os.path as osp
import pickle
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))
sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tools",
                            "analysis_tools"))


def test_e2e_bench_datagen_and_loader(tmp_path):
    from e2e_bench import CAMS, gen_fullsize_nuscenes, point_config_at

    root = str(tmp_path / "data")
    ann = gen_fullsize_nuscenes(root, n_samples=3, img_hw=(96, 160),
                                n_points=3000)
    with open(ann, "rb") as f:
        infos = pickle.load(f)["infos"]
    assert len(infos) == 3
    assert infos[0]["prev"] is None and infos[1]["prev"] is not None
    assert all(osp.exists(infos[0]["cams"][c]["data_path"])
               for c in CAMS)

    # the REAL flagship pipeline over the generated files (downsized
    # via data_config overrides), through the fork-worker dataloader
    from distillbev_tpu.config import Config
    from distillbev_tpu.datasets import build_dataloader, build_dataset
    repo = osp.join(osp.dirname(__file__), "..")
    cfg = Config.fromfile(osp.join(
        repo, "configs/lidar2camera_bev_distillation/"
        "centerpoint_pillar_to_bevdepth4d_r50/centerpoint_02pillar_"
        "second_secfpn_circlenms_8x4_cyclic_20e_nus_to_bevdepth4d_"
        "r50.py"))
    tr = point_config_at(cfg.data["train"], root, ann)
    ds = build_dataset(tr)
    loader = build_dataloader(ds, samples_per_gpu=2, workers_per_gpu=1,
                              shuffle=False, seed=0)
    batch = next(iter(loader))
    imgs = np.asarray(batch["img_inputs"][0])
    assert imgs.shape[0] == 2 and imgs.ndim == 5
    assert np.isfinite(np.asarray(batch["points"])).all()
