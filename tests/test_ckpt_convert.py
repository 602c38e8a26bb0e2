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


@pytest.mark.slow
def test_bevdepth4d_name_map_targets_exist(rng):
    """Every flax path targeted by the BEVDepth4D map must exist in the
    real flagship student tree (R50) — catches naming drift."""
    import jax
    from distillbev_tpu.apis.flagship import bevdepth4d_distill_cfg
    from distillbev_tpu.models.detectors.bevdet import ImgInputs
    from tools.model_converters.convert_torch_ckpt import (
        bevdepth4d_name_map)

    cfg = bevdepth4d_distill_cfg(50)
    cfg["img_view_transformer"]["data_config"] = {
        "input_size": (64, 176)}
    model = build_detector(cfg)
    b, n = 1, 6
    imgs = np.zeros((b, 2 * n, 64, 176, 3), np.float32)
    eye = np.tile(np.eye(3, dtype=np.float32), (b, 2, n, 1, 1))
    zeros3 = np.zeros((b, 2, n, 3), np.float32)
    intr = eye.copy(); intr[..., 0, 0] = 100; intr[..., 1, 1] = 100
    inputs = ImgInputs(imgs, eye, zeros3, intr, eye, zeros3,
                       np.zeros((b, n, 4, 11), np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), inputs)
    flat_p = flatten_tree(variables["params"])
    flat_s = flatten_tree(variables["batch_stats"])
    pm, sm = bevdepth4d_name_map(50)
    missing_p = [t for t, path in pm.items() if path not in flat_p]
    missing_s = [t for t, path in sm.items() if path not in flat_s]
    assert not missing_p, missing_p[:10]
    assert not missing_s, missing_s[:10]
    # coverage: the map should fill the vast majority of student params
    targets = set(pm.values())
    student_paths = [p for p in flat_p if p[0] in (
        "backbone", "neck", "view_transformer", "bev_backbone",
        "bev_neck", "pre_process_net", "bbox_head")]
    covered = sum(1 for p in student_paths if p in targets)
    assert covered / len(student_paths) > 0.95, (
        covered, len(student_paths),
        [p for p in student_paths if p not in targets][:10])


def test_lidarformer_name_map_coverage(rng):
    """Synthesize a torch-layout LidarFormer state_dict from the name
    map and require it to cover the flax tree (spconv reshape, MHA
    in_proj split, embeddings, deformable attention, branches)."""
    import jax.numpy as jnp
    from test_model_bevformer import tiny_lidarformer_cfg
    from tools.model_converters.convert_torch_ckpt import (
        lidarformer_name_map, split_mha_in_proj)

    cfg = tiny_lidarformer_cfg()
    me = dict(cfg["pts_middle_encoder"])
    me["block_type"] = "basicblock"
    # basicblock stages change channels at their strided LAST block
    # (reference encoder_channels style), not at j==0
    me["encoder_channels"] = ((8, 8), (8, 16), (16, 16), (16,))
    me["encoder_paddings"] = ((1, 1), (1, 1), (1, 1), (1,))
    cfg = dict(cfg, pts_middle_encoder=me)
    model = build_detector(cfg)
    pts = np.zeros((1, 128, 4), np.float32)
    mask = np.ones((1, 128), bool)
    variables = model.init(jax.random.PRNGKey(0), pts, mask)
    flat = flatten_tree(variables["params"])

    pm, sm = lidarformer_name_map(
        encoder_channels=me["encoder_channels"],
        block_type="basicblock", second_layers=(1, 1),
        fpn_levels=2, num_enc_layers=1, num_dec_layers=2)

    fake = {}
    for tname, path in pm.items():
        if path not in flat:
            continue
        shape = np.shape(flat[path])
        base = tname.split("#")[0]
        if base in fake:
            continue
        if len(shape) == 3 and base.startswith("pts_middle_encoder"):
            # spconv (K, in, out) -> (kd, kh, kw, in, out)
            if shape[0] == 27:
                t_shape = (3, 3, 3) + shape[1:]
            else:
                t_shape = (3, 1, 1) + shape[1:]
        elif ".attn." in base:
            continue  # handled via packed in_proj below
        elif "embedding" in base or base.endswith("level_embeds"):
            t_shape = shape
        elif len(shape) == 4:
            t_shape = (shape[3], shape[2], shape[0], shape[1])
        elif len(shape) == 2:
            t_shape = (shape[1], shape[0])
        else:
            t_shape = shape
        fake[base] = rng.randn(*t_shape).astype(np.float32)
    # packed MHA tensors
    embed = cfg["pts_bbox_head"]["embed_dims"]
    for i in range(2):
        b = (f"pts_bbox_head.transformer.decoder.layers.{i}"
             ".attentions.0.attn")
        fake[f"{b}.in_proj_weight"] = rng.randn(
            3 * embed, embed).astype(np.float32)
        fake[f"{b}.in_proj_bias"] = rng.randn(
            3 * embed).astype(np.float32)
        fake[f"{b}.out_proj.weight"] = rng.randn(
            embed, embed).astype(np.float32)
        fake[f"{b}.out_proj.bias"] = rng.randn(
            embed).astype(np.float32)
    fake = split_mha_in_proj(fake)
    for k in list(pm):
        if "#" in k and k.split("#")[0] in fake:
            fake[k] = fake[k.split("#")[0]]

    params, missing, mismatched = map_params(fake, pm,
                                             variables["params"])
    assert not mismatched, mismatched[:5]
    mapped = [t for t in pm if t in fake]
    assert len(mapped) > 60, len(mapped)

    # every flax param under the mapped modules is covered
    targets = {tuple(p) for p in pm.values()}
    uncovered = [p for p in flat
                 if p not in targets and p[0] != "voxel_encoder"]
    assert not uncovered, uncovered[:10]

    # spot-check: spconv reshape keeps raw row-major order
    t = "pts_middle_encoder.conv_input.0.weight"
    got = flatten_tree(params)[("middle_encoder", "conv_input",
                                "kernel")]
    assert np.allclose(np.asarray(got),
                       fake[t].reshape(np.shape(got)))
    # spot-check: MHA query kernel is [E,E] transposed then reshaped
    b0 = ("pts_bbox_head.transformer.decoder.layers.0"
          ".attentions.0.attn.q_proj.weight")
    gotq = flatten_tree(params)[
        ("bbox_head", "transformer", "decoder", "layer_0",
         "self_attn", "attn", "query", "kernel")]
    assert np.allclose(np.asarray(gotq),
                       fake[b0].T.reshape(np.shape(gotq)))


def test_bevformer_name_map_coverage(rng):
    """Synthesized torch BEVFormer state_dict must cover the flax tree
    (TSA/SCA attention split, can_bus MLP, embeddings, branches)."""
    import jax.numpy as jnp
    from test_model_bevformer import tiny_bevformer_cfg, cam_inputs
    from tools.model_converters.convert_torch_ckpt import (
        bevformer_name_map, split_mha_in_proj)

    model = build_detector(tiny_bevformer_cfg())
    imgs, can_bus, l2i, prev = cam_inputs(rng)
    variables = model.init(jax.random.PRNGKey(0), imgs, can_bus, l2i,
                           prev)
    flat = flatten_tree(variables["params"])

    pm, sm = bevformer_name_map(depth=18, fpn_levels=2,
                                num_enc_layers=2, num_dec_layers=2)

    fake = {}
    for tname, path in pm.items():
        if path not in flat:
            continue
        base = tname.split("#")[0]
        if base in fake or ".attn." in base:
            continue
        shape = np.shape(flat[path])
        if "embed" in base.rsplit(".", 2)[-2] or \
                base.endswith(("level_embeds", "cams_embeds")):
            t_shape = shape
        elif len(shape) == 4:
            t_shape = (shape[3], shape[2], shape[0], shape[1])
        elif len(shape) == 2:
            t_shape = (shape[1], shape[0])
        else:
            t_shape = shape
        fake[base] = rng.randn(*t_shape).astype(np.float32)
    embed = 32
    for i in range(2):
        b = (f"pts_bbox_head.transformer.decoder.layers.{i}"
             ".attentions.0.attn")
        fake[f"{b}.in_proj_weight"] = rng.randn(
            3 * embed, embed).astype(np.float32)
        fake[f"{b}.in_proj_bias"] = rng.randn(
            3 * embed).astype(np.float32)
        fake[f"{b}.out_proj.weight"] = rng.randn(
            embed, embed).astype(np.float32)
        fake[f"{b}.out_proj.bias"] = rng.randn(embed).astype(np.float32)
    fake = split_mha_in_proj(fake)
    for k in list(pm):
        if "#" in k and k.split("#")[0] in fake:
            fake[k] = fake[k.split("#")[0]]

    params, missing, mismatched = map_params(fake, pm,
                                             variables["params"])
    assert not mismatched, mismatched[:5]

    targets = {tuple(p) for p in pm.values()}
    uncovered = [p for p in flat if p not in targets]
    assert not uncovered, uncovered[:10]
