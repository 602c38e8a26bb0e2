"""Evaluation loop: dataset -> jitted inference -> nuScenes metrics.

Capability parity with the reference test APIs
(reference: mmdet3d/apis/test.py:22-292 — single_gpu_test /
custom_multi_gpu_test with collect_results; tools/test.py drive).

TPU-native: one jitted forward+decode; per-host results gathered in a
plain dict keyed by sample token (multi-host: each host evaluates its
shard and merges via process_allgather when available).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np


def unflip_centerpoint_preds(preds, flip_h: bool, flip_v: bool):
    """Map CenterHead output maps computed on pcd-flipped points back to
    the unflipped frame (reference centerpoint.py aug_test_pts:117-178,
    re-derived for this repo's flip convention,
    core/bbox/structures.py:175-194: 'horizontal' flips y with
    yaw -> -yaw, 'vertical' flips x with yaw -> pi - yaw).

    preds: list (per task) of channels-last map dicts
    {heatmap, reg, height, dim, rot (sin, cos), vel} each [B, H, W, C]
    with H = y rows, W = x cols.
    """
    import jax.numpy as jnp
    out = []
    for pred in preds:
        p = {}
        for k, v in pred.items():
            if flip_h:
                v = v[:, ::-1]
            if flip_v:
                v = v[:, :, ::-1]
            p[k] = v
        if flip_h:   # y -> -y: sub-pixel y offset mirrors, sin(-yaw)
            p["reg"] = jnp.concatenate(
                [p["reg"][..., 0:1], 1.0 - p["reg"][..., 1:2]], -1)
            p["rot"] = jnp.concatenate(
                [-p["rot"][..., 0:1], p["rot"][..., 1:2]], -1)
            if p.get("vel") is not None:
                p["vel"] = jnp.concatenate(
                    [p["vel"][..., 0:1], -p["vel"][..., 1:2]], -1)
        if flip_v:   # x -> -x: yaw -> pi - yaw (cos negated)
            p["reg"] = jnp.concatenate(
                [1.0 - p["reg"][..., 0:1], p["reg"][..., 1:2]], -1)
            p["rot"] = jnp.concatenate(
                [p["rot"][..., 0:1], -p["rot"][..., 1:2]], -1)
            if p.get("vel") is not None:
                p["vel"] = jnp.concatenate(
                    [-p["vel"][..., 0:1], p["vel"][..., 1:2]], -1)
        out.append(p)
    return out


def tta_flip_combos_from_pipeline(pipeline_cfg):
    """(flip_h, flip_v) combos declared by a MultiScaleFlipAug3D entry
    in a test pipeline, or None when it implies a single pass.  The CLI
    strips the flags from the loader-side transform and applies the
    flips on device instead (sign flips + map unflip, one jit)."""
    for t in pipeline_cfg or ():
        if dict(t).get("type") == "MultiScaleFlipAug3D":
            t = dict(t)
            hs = [False, True] if t.get("pcd_horizontal_flip") else \
                [False]
            vs = [False, True] if t.get("pcd_vertical_flip") else \
                [False]
            combos = [(h, v) for h in hs for v in vs]
            if len(combos) > 1:
                return combos
    return None


def run_eval(model, variables, dataset, loader, family: str = "points",
             logger=None, tta_flips=None) -> Dict[str, Any]:
    """Run inference over a loader, return {token: (boxes, scores,
    labels, valid)} numpy results.

    ``tta_flips``: optional list of (flip_h, flip_v) combos (points
    family only) — the reference's double-flip TTA
    (centerpoint.py aug_test_pts): each combo's points are sign-flipped
    on device, the head maps are unflipped, the raw maps averaged over
    combos, and the average decoded once.
    """
    import jax
    import jax.numpy as jnp
    from .train import batch_to_device

    if family == "bevformer":
        assert not tta_flips, "TTA is a points-family feature"
        return _run_eval_bevformer(model, variables, loader,
                                   logger=logger)

    @jax.jit
    def infer_points(batch):
        preds, _ = model.apply(variables, batch.points, batch.point_mask)
        return model.apply(variables, preds, method=model.get_bboxes)

    @jax.jit
    def infer_points_tta(batch):
        accum = None
        for fh, fv in tta_flips:
            sign = jnp.asarray(
                [-1.0 if fv else 1.0, -1.0 if fh else 1.0] +
                [1.0] * (batch.points.shape[-1] - 2),
                batch.points.dtype)
            preds, _ = model.apply(variables, batch.points * sign,
                                   batch.point_mask)
            preds = unflip_centerpoint_preds(preds, fh, fv)
            accum = preds if accum is None else jax.tree_util.tree_map(
                jnp.add, accum, preds)
        mean = jax.tree_util.tree_map(
            lambda x: x / len(tta_flips), accum)
        return model.apply(variables, mean, method=model.get_bboxes)

    @jax.jit
    def infer_img(batch):
        preds, _, _ = model.apply(variables, batch.img_inputs)
        return model.apply(variables, preds, method=model.get_bboxes)

    if tta_flips:
        assert family == "points", \
            "TTA flips are only supported for the points family"

    results = {}
    for raw in loader:
        metas = raw["img_metas"]
        batch = batch_to_device(
            {k: v for k, v in raw.items() if k != "img_metas"},
            "distill" if family == "img" else "points")
        if family == "img":
            dec = infer_img(batch)
        elif tta_flips:
            dec = infer_points_tta(batch)
        else:
            dec = infer_points(batch)
        boxes = np.asarray(dec.bboxes)
        scores = np.asarray(dec.scores)
        labels = np.asarray(dec.labels)
        valid = np.asarray(dec.valid)
        for bi, meta in enumerate(metas):
            token = meta.get("sample_idx")
            results[token] = (boxes[bi], scores[bi], labels[bi],
                              valid[bi])
    return results


def _run_eval_bevformer(model, variables, loader,
                        logger=None) -> Dict[str, Any]:
    """BEVFormer sequential eval with the scene-token ``prev_frame_info``
    state machine (reference bevformer.py:233-266): a scene change
    resets the history BEV; within a scene the can-bus position/angle
    are rebased to per-frame deltas before each forward, and the frame's
    bev_embed becomes the next frame's history.  One jitted trace serves
    both cases: prev_bev is always an array and ``prev_valid`` gates it.
    """
    import jax
    import jax.numpy as jnp

    head_cfg = dict(model.pts_bbox_head or {})
    bev_h = head_cfg.get("bev_h", 200)
    bev_w = head_cfg.get("bev_w", 200)
    embed = head_cfg.get("embed_dims", 256)
    video = bool(getattr(model, "video_test_mode", True))

    @jax.jit
    def infer(imgs, can_bus, l2i, prev_bev, prev_valid):
        outs = model.apply(variables, imgs, can_bus, l2i, prev_bev,
                           prev_valid, method=model.forward_test_frame)
        dec = model.apply(variables, outs, method=model.get_bboxes)
        return outs["bev_embed"], dec

    prev_bev = jnp.zeros((1, bev_h * bev_w, embed), jnp.float32)
    prev_scene = None
    prev_pos = np.zeros(3)
    prev_angle = 0.0
    results: Dict[str, Any] = {}
    for raw in loader:
        metas = raw["img_metas"]
        assert len(metas) == 1, \
            "BEVFormer eval is sequential (samples_per_gpu=1)"
        meta = metas[0]
        scene = meta.get("scene_token")
        can_bus = np.array(meta["can_bus"], np.float64).copy()
        tmp_pos = can_bus[:3].copy()
        tmp_angle = can_bus[-1]
        valid = video and scene == prev_scene
        if valid:
            can_bus[:3] -= prev_pos
            can_bus[-1] -= prev_angle
        else:
            can_bus[:3] = 0
            can_bus[-1] = 0
        imgs = jnp.asarray(raw["img"], jnp.float32)
        l2i = jnp.asarray(np.stack(meta["lidar2img"]),
                          jnp.float32)[None]
        bev, dec = infer(imgs,
                         jnp.asarray(can_bus, jnp.float32)[None], l2i,
                         prev_bev,
                         jnp.asarray([1.0 if valid else 0.0],
                                     jnp.float32))
        prev_bev, prev_scene = bev, scene
        prev_pos, prev_angle = tmp_pos, tmp_angle
        token = meta.get("sample_idx")
        results[token] = (np.asarray(dec.bboxes)[0],
                          np.asarray(dec.scores)[0],
                          np.asarray(dec.labels)[0],
                          np.asarray(dec.valid)[0])
    return results


def evaluate_results(dataset, results, jsonfile_prefix=None,
                     logger=None):
    metrics = dataset.evaluate(results, jsonfile_prefix=jsonfile_prefix)
    if metrics.get("aae_unavailable"):
        msg = ("WARNING: info pkls carry no GT attributes (gt_attrs) — "
               "mAAE scored as 0 and NDS is optimistic by up to "
               "0.1*mean-AAE.  Regenerate pkls with tools/create_data.py "
               "to make AAE real.")
        print(msg)
        if logger is not None:
            logger.warning(msg)
    if logger is not None:
        for k, v in metrics.items():
            logger.info(f"{k}: {v:.4f}")
    return metrics


def collect_results_hosts(local: Dict[str, Any], tmpdir: str,
                          rank: Optional[int] = None,
                          world: Optional[int] = None,
                          barrier=None) -> Optional[Dict[str, Any]]:
    """Merge per-host eval shards (reference apis/test.py
    collect_results_cpu:204-244 — tmpdir pickle collection).

    Each host dumps its {token: arrays} dict to ``tmpdir/part_{rank}``;
    after a cross-host barrier, host 0 loads and merges every part and
    returns the full dict (other hosts return None).  ``rank``/``world``
    /``barrier`` default to the JAX runtime and are injectable for
    single-process tests.
    """
    import pickle

    import jax
    if rank is None:
        rank = jax.process_index()
    if world is None:
        world = jax.process_count()
    if world == 1 and barrier is None:
        return local
    os.makedirs(tmpdir, exist_ok=True)
    with open(os.path.join(tmpdir, f"part_{rank}.pkl"), "wb") as f:
        pickle.dump(local, f)
    if barrier is None:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("collect_results")
    else:
        barrier()
    if rank != 0:
        return None
    merged: Dict[str, Any] = {}
    for r in range(world):
        path = os.path.join(tmpdir, f"part_{r}.pkl")
        with open(path, "rb") as f:
            part = pickle.load(f)
        # the sampler pads shards to equal length (builder.py
        # EpochSampler), so a few tokens legitimately appear on two
        # hosts — first occurrence wins (the reference truncates the
        # padded tail the same way, apis/test.py:241-244)
        merged.update({k: v for k, v in part.items() if k not in merged})
    return merged
