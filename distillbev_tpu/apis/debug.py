"""Distillation debug dumps: the ``--save_attention`` path.

Reference: tools/test.py:163-214 + bevdet_distill.py:1076-1082,
1193-1249 — with ``--save_attention`` the reference shuffles the loader
and the distill detector writes its foreground masks and
spatial-attention maps to disk for visualization.

TPU-native design: the masks are recomputed by ONE jitted function
(teacher forward + student forward + ``distill_losses(return_maps=True)``)
instead of scattering file writes through the model; the host saves one
``.npz`` per batch with keys ``{student_pos}_{teacher_pos}/{map_name}``.
"""
from __future__ import annotations

import os
import os.path as osp
from functools import partial
from typing import Optional

import numpy as np


def save_attention_dump(cfg, student_variables, out_dir: str,
                        limit: int = 8, epoch: float = 1000.0,
                        logger=None):
    """Dump distill mask/attention maps for ``limit`` shuffled train
    batches of a distill config.

    ``student_variables`` may be None (random init — still useful for
    inspecting the GT-derived masks, which are parameter-free).
    ``epoch`` defaults high so every epoch-gated branch (fp_epoch etc.)
    is active in the dump.
    """
    import jax
    import jax.numpy as jnp
    from ..config import Config
    from ..datasets import build_dataset, build_dataloader
    from ..models import build_detector
    from ..utils.logger import get_root_logger
    from .train import batch_to_device, _load_any_checkpoint

    logger = logger or get_root_logger()
    model_cfg = dict(cfg.model)
    assert "Distill" in model_cfg["type"], \
        "--save_attention needs a distill config"
    is_bevformer = "BEVFormer" in model_cfg["type"]
    family = "bevformer" if is_bevformer else "distill"

    dataset = build_dataset(cfg.data["train"])
    loader = build_dataloader(dataset, cfg.data["samples_per_gpu"],
                              cfg.data["workers_per_gpu"], shuffle=True,
                              seed=cfg.get("seed", 0))

    student = build_detector(model_cfg, cfg.get("train_cfg"),
                             cfg.get("test_cfg"))
    t_cfg = Config.fromfile(model_cfg["teacher_config"]) \
        if isinstance(model_cfg.get("teacher_config"), str) else \
        Config(dict(model=model_cfg["teacher_config"]))
    teacher = build_detector(dict(t_cfg.model), t_cfg.get("train_cfg"),
                             t_cfg.get("test_cfg"))

    rng = jax.random.PRNGKey(cfg.get("seed", 0))
    first = next(iter(loader))
    batch0 = batch_to_device(
        {k: v for k, v in first.items() if k != "img_metas"}, family)

    tvars = jax.jit(teacher.init)(rng, batch0.points, batch0.point_mask)
    if model_cfg.get("teacher_ckpt"):
        tvars = _load_any_checkpoint(model_cfg["teacher_ckpt"], tvars)

    if student_variables is None:
        _, t_bundle = jax.jit(teacher.apply)(tvars, batch0.points,
                                             batch0.point_mask)
        if is_bevformer:
            student_variables = jax.jit(partial(
                student.init, method="init_with_teacher"))(
                rng, batch0.imgs, batch0.can_bus, batch0.lidar2img,
                batch0.prev_exists, t_bundle.bev_feat)
        else:
            student_variables = jax.jit(partial(
                student.init, method="init_with_teacher"))(
                rng, batch0.img_inputs, t_bundle)
        logger.warning("save_attention: no checkpoint — random-init "
                       "student (GT masks are still exact)")

    epoch_val = jnp.float32(epoch)

    if is_bevformer:
        head_cfg = dict(model_cfg.get("pts_bbox_head") or {})
        bev_h = head_cfg.get("bev_h", 200)
        bev_w = head_cfg.get("bev_w", 200)
        fp_mode = dict(student.distill_params or {}).get(
            "fp_as_foreground", "none")
        mine_fp = (fp_mode[0] if isinstance(fp_mode, (list, tuple))
                   else fp_mode) != "none"

        @jax.jit
        def maps_fn(variables, batch):
            from ..training.train_step import gravity_centered
            gt = gravity_centered(batch.gt_boxes)
            t_outs, t_bundle = teacher.apply(
                tvars, batch.points, batch.point_mask, train=False)
            t_dec = teacher.apply(tvars, t_outs,
                                  method=teacher.get_bboxes) \
                if mine_fp else None
            outs, _ = student.apply(
                variables, batch.imgs, batch.can_bus, batch.lidar2img,
                batch.prev_exists, train=False)
            _, maps = student.apply(
                variables, outs, t_outs, t_bundle.bev_feat, gt,
                batch.gt_labels, batch.gt_mask, epoch_val, bev_h, bev_w,
                False, t_dec, True,
                method=student.distill_losses_bevformer)
            return maps
    else:
        @jax.jit
        def maps_fn(variables, batch):
            from ..training.train_step import gravity_centered
            gt = gravity_centered(batch.gt_boxes)
            t_preds, t_bundle = teacher.apply(
                tvars, batch.points, batch.point_mask, train=False)
            preds, bundle, _depth = student.apply(
                variables, batch.img_inputs, train=False)
            _, targets = student.apply(
                variables, preds, gt, batch.gt_labels, batch.gt_mask,
                True, method=student.head_loss)
            heatmaps = targets[0]
            _, maps = student.apply(
                variables, bundle, preds, t_bundle, t_preds, gt,
                batch.gt_labels, batch.gt_mask, heatmaps, epoch_val,
                False, True, method=student.distill_losses)
            return maps

    os.makedirs(out_dir, exist_ok=True)
    n_saved = 0
    for raw in loader:
        if n_saved >= limit:
            break
        batch = batch_to_device(
            {k: v for k, v in raw.items() if k != "img_metas"}, family)
        maps = jax.device_get(maps_fn(student_variables, batch))
        flat = {f"{pair}/{name}": np.asarray(v)
                for pair, d in maps.items() for name, v in d.items()}
        path = osp.join(out_dir, f"attention_{n_saved:04d}.npz")
        np.savez_compressed(path, **flat)
        logger.info(f"saved {path} ({len(flat)} maps)")
        n_saved += 1
    return n_saved
