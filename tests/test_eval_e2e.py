"""E2E evaluation path: dataset -> jitted inference -> self-contained
nuScenes metrics (apis/test.py)."""
import os.path as osp
import sys

import numpy as np
import jax
import pytest

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from distillbev_tpu.apis.test import run_eval, evaluate_results
from distillbev_tpu.datasets import NuScenesDataset, build_dataloader
from distillbev_tpu.models import build_detector

from test_datasets import make_mini_nuscenes, PCR
from test_model_centerpoint import tiny_centerpoint_cfg


def points_pipeline():
    return [
        dict(type="LoadPointsFromFile", load_dim=5,
             use_dim=[0, 1, 2, 3]),
        dict(type="DefaultFormatBundle3D"),
        dict(type="Collect3D", keys=["points"], max_points=2048,
             max_objs=16),
    ]


@pytest.mark.slow
def test_eval_loop_end_to_end(tmp_path):
    root = str(tmp_path / "data")
    ann = make_mini_nuscenes(root, n_samples=3)
    ds = NuScenesDataset(ann_file=ann, pipeline=points_pipeline(),
                         img_info_prototype="bevdet", test_mode=True)
    loader = build_dataloader(ds, samples_per_gpu=1, workers_per_gpu=1,
                              shuffle=False)
    # teacher cfg with the mini ranges
    cfg = tiny_centerpoint_cfg()
    model = build_detector(cfg)
    pts = np.zeros((1, 2048, 4), np.float32)
    mask = np.ones((1, 2048), bool)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), pts, mask)
    results = run_eval(model, variables, ds, loader, family="points")
    assert len(results) == 3
    for tok, det in results.items():
        boxes, scores, labels, valid = det
        assert boxes.shape[-1] == 9
    metrics = evaluate_results(ds, results)
    assert "pts_bbox_NuScenes/mAP" in metrics
    assert "pts_bbox_NuScenes/NDS" in metrics
    assert 0.0 <= metrics["pts_bbox_NuScenes/mAP"] <= 1.0
