"""Checkpoint-converter coverage: the CenterPoint name map must fill the
real param tree (synthetic torch state_dict with matching shapes)."""
import sys
import os.path as osp

import numpy as np
import jax
import pytest

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from distillbev_tpu.models import build_detector
from distillbev_tpu.training.param_utils import (flatten_tree, map_params,
                                                 convert_tensor)
from tools.model_converters.convert_torch_ckpt import (
    centerpoint_pillar_name_map)

from test_model_centerpoint import tiny_centerpoint_cfg


def test_name_map_covers_param_tree(rng):
    cfg = tiny_centerpoint_cfg()
    model = build_detector(cfg)
    pts = np.zeros((1, 64, 4), np.float32)
    mask = np.ones((1, 64), bool)
    variables = model.init(jax.random.PRNGKey(0), pts, mask)
    pm, sm = centerpoint_pillar_name_map(
        num_tasks=2, pfn_layers=1, second_layers=(1, 1))
    pm = {k.split("#")[0]: v for k, v in pm.items()}

    # synthesize a torch state_dict with reverse-converted shapes
    flat = flatten_tree(variables["params"])
    fake = {}
    for tname, path in pm.items():
        if path not in flat:
            continue
        shape = np.shape(flat[path])
        if len(shape) == 4:     # HWIO -> OIHW
            t_shape = (shape[3], shape[2], shape[0], shape[1])
        elif len(shape) == 2:   # [in,out] -> [out,in]
            t_shape = (shape[1], shape[0])
        else:
            t_shape = shape
        fake[tname] = rng.randn(*t_shape).astype(np.float32)

    params, missing, mismatched = map_params(fake, pm,
                                             variables["params"])
    assert not mismatched, mismatched[:5]
    # every existing fake tensor mapped somewhere
    mapped = [t for t in pm if t in fake]
    assert len(mapped) > 20
    # spot check numeric layout conversion
    tname = "pts_bbox_head.shared_conv.conv.weight"
    got = flatten_tree(params)[("bbox_head", "shared_conv", "conv",
                                "kernel")]
    want = fake[tname].transpose(2, 3, 1, 0)
    assert np.allclose(np.asarray(got), want)

    # stats map fills batch_stats
    stats_fake = {}
    sflat = flatten_tree(variables["batch_stats"])
    for tname, path in sm.items():
        if path in sflat:
            stats_fake[tname] = rng.randn(
                *np.shape(sflat[path])).astype(np.float32)
    stats, _, bad = map_params(stats_fake, sm,
                               variables["batch_stats"])
    assert not bad


def test_mapped_params_change_forward(rng):
    """Loading mapped weights must actually change model outputs."""
    cfg = tiny_centerpoint_cfg()
    model = build_detector(cfg)
    pts = rng.uniform(-5, 5, (1, 64, 4)).astype(np.float32)
    mask = np.ones((1, 64), bool)
    variables = model.init(jax.random.PRNGKey(0), pts, mask)
    preds0, _ = model.apply(variables, pts, mask)
    pm, _ = centerpoint_pillar_name_map(num_tasks=2, pfn_layers=1,
                                        second_layers=(1, 1))
    pm = {k.split("#")[0]: v for k, v in pm.items()}
    flat = flatten_tree(variables["params"])
    fake = {}
    for tname, path in pm.items():
        if path not in flat:
            continue
        s = np.shape(flat[path])
        t_s = (s[3], s[2], s[0], s[1]) if len(s) == 4 else \
            ((s[1], s[0]) if len(s) == 2 else s)
        fake[tname] = rng.randn(*t_s).astype(np.float32) * 0.1
    params, _, _ = map_params(fake, pm, variables["params"])
    preds1, _ = model.apply({"params": params,
                             "batch_stats": variables["batch_stats"]},
                            pts, mask)
    assert not np.allclose(np.asarray(preds0[0]["heatmap"]),
                           np.asarray(preds1[0]["heatmap"]))
