"""Training assembly: config -> dataset/model/optimizer -> epoch loop.

Capability parity with the reference training APIs
(reference: mmdet3d/apis/train.py:6-60 train_model/custom_train_model and
apis/mmdet_train.py:29-201 custom_train_detector — dataloaders, DDP wrap,
optimizer build with paramwise lr_mult, runner with epoch hooks, eval
hook, checkpoint/resume; tools/epoch_based_runner_modified.py set_epoch).

TPU-native: the runner is a plain epoch/step loop around one jitted
train step executed under a GSPMD data mesh; epoch gating reaches the
distiller as a traced scalar (no runner patching); checkpoints via orbax.
"""
from __future__ import annotations

import os
import os.path as osp
import time
from typing import Any, Dict, Optional

import numpy as np


def batch_to_device(batch: Dict, family: str):
    """Collect3D numpy batch -> the detector family's input pytree."""
    import jax.numpy as jnp
    from ..training.train_step import DistillBatch, PointsBatch
    from ..models.detectors.bevdet import ImgInputs

    def _gt(key, shape, dtype):
        if key in batch:
            return jnp.asarray(batch[key])
        return jnp.zeros(shape, dtype)   # test-mode batches carry no GT

    b = batch["points"].shape[0] if "points" in batch else \
        batch["img_inputs"][0].shape[0]
    if family == "points":
        return PointsBatch(
            jnp.asarray(batch["points"]),
            jnp.asarray(batch["point_mask"]),
            _gt("gt_boxes", (b, 1, 9), jnp.float32),
            _gt("gt_labels", (b, 1), jnp.int32),
            _gt("gt_mask", (b, 1), bool))
    if family == "distill":
        ii = batch["img_inputs"]
        img_inputs = ImgInputs(
            jnp.asarray(ii[0]), jnp.asarray(ii[1]), jnp.asarray(ii[2]),
            jnp.asarray(ii[3]), jnp.asarray(ii[4]), jnp.asarray(ii[5]),
            jnp.asarray(ii[6]) if len(ii) > 6 else None)
        return DistillBatch(
            img_inputs, jnp.asarray(batch["points"]),
            jnp.asarray(batch["point_mask"]),
            _gt("gt_boxes", (b, 1, 9), jnp.float32),
            _gt("gt_labels", (b, 1), jnp.int32),
            _gt("gt_mask", (b, 1), bool))
    if family == "bevformer":
        from ..training.train_step import BEVFormerBatch
        b = batch["img"].shape[0]
        npts = batch["points"].shape[1] if "points" in batch else 1
        return BEVFormerBatch(
            jnp.asarray(batch["img"]),
            jnp.asarray(batch["can_bus"]),
            jnp.asarray(batch["lidar2img"]),
            jnp.asarray(batch["prev_bev_exists"]),
            jnp.asarray(batch["points"]) if "points" in batch else
            jnp.zeros((b, npts, 5), jnp.float32),
            jnp.asarray(batch["point_mask"]) if "point_mask" in batch
            else jnp.zeros((b, npts), bool),
            _gt("gt_boxes", (b, 1, 9), jnp.float32),
            _gt("gt_labels", (b, 1), jnp.int32),
            _gt("gt_mask", (b, 1), bool))
    raise NotImplementedError(family)


def _train_pipeline_of(cfg):
    """The train pipeline list, unwrapping CBGS/RepeatDataset nests."""
    d = cfg.data["train"]
    while isinstance(d, dict) and "pipeline" not in d and "dataset" in d:
        d = d["dataset"]
    return (d or {}).get("pipeline", []) if isinstance(d, dict) else []

def _apply_presort_hint(cfg, t_model_cfg, logger=None):
    """Enable the teacher's presorted-points fast path when (and only
    when) the train pipeline carries a matching SortPointsByPillar.

    The device path (ops/voxelize.py sorted_voxel_info presorted=True)
    silently produces wrong pillars if the contract is violated, so
    this is the single switch point: auto-ON when the transform's
    (voxel_size, point_cloud_range) equal the teacher's
    pts_voxel_layer's, hard error if the config claims presorted
    without the transform."""
    if t_model_cfg.get("type") != "CenterPoint":
        return
    vl = t_model_cfg.get("pts_voxel_layer") or {}
    match = False
    for tr in _train_pipeline_of(cfg):
        if isinstance(tr, dict) and tr.get("type") == "SortPointsByPillar":
            match = (list(tr["voxel_size"]) == list(vl.get(
                "voxel_size", [])) and
                list(tr["point_cloud_range"]) == list(vl.get(
                    "point_cloud_range", [])))
            break
    if t_model_cfg.get("presorted_points") and not match:
        raise ValueError(
            "teacher presorted_points=True but the train pipeline has "
            "no SortPointsByPillar matching its pts_voxel_layer "
            f"(voxel_size={vl.get('voxel_size')}, "
            f"point_cloud_range={vl.get('point_cloud_range')})")
    if match and not t_model_cfg.get("presorted_points"):
        t_model_cfg["presorted_points"] = True
        if logger is not None:
            logger.info("teacher presorted-points fast path enabled "
                        "(SortPointsByPillar found in train pipeline)")


def train_model(cfg, work_dir: str, resume_from: Optional[str] = None,
                max_steps_per_epoch: Optional[int] = None,
                logger=None):
    """Run the full training described by an mmcv-style config."""
    import jax
    import jax.numpy as jnp
    from ..datasets import build_dataset, build_dataloader
    from ..models import build_detector
    from ..parallel import make_mesh, replicate, shard_batch
    from ..training import (init_train_state, make_detector_train_step,
                            make_distill_train_step)
    from ..training.checkpoints import CheckpointManager
    from ..training.optim import build_optimizer
    from ..training.param_utils import inherit_head_params, \
        load_torch_checkpoint
    from ..training.schedules import build_lr_schedule
    from ..utils.logger import get_root_logger
    from ..config import Config

    logger = logger or get_root_logger(
        log_file=osp.join(work_dir, "train.log"))
    os.makedirs(work_dir, exist_ok=True)

    dataset = build_dataset(cfg.data["train"])
    loader = build_dataloader(
        dataset, cfg.data["samples_per_gpu"],
        cfg.data["workers_per_gpu"], shuffle=True,
        seed=cfg.get("seed", 0))
    steps_per_epoch = len(loader)
    if max_steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, max_steps_per_epoch)
    max_epochs = cfg.runner["max_epochs"] if "runner" in cfg else \
        cfg.get("total_epochs", 24)
    total_steps = steps_per_epoch * max_epochs

    model_cfg = dict(cfg.model)
    is_distill = "Distill" in model_cfg["type"]
    is_bevformer = "BEVFormer" in model_cfg["type"]
    model = build_detector(model_cfg, cfg.get("train_cfg"),
                           cfg.get("test_cfg"))

    # data mesh over as many devices as evenly divide the batch
    batch_size = cfg.data["samples_per_gpu"]
    devices = jax.devices()
    n_dev = len(devices)
    while n_dev > 1 and batch_size % n_dev != 0:
        n_dev -= 1
    mesh = make_mesh(devices[:n_dev])
    rng = jax.random.PRNGKey(cfg.get("seed", 0))

    teacher = None
    tvars = None
    if is_distill:
        t_cfg = Config.fromfile(model_cfg["teacher_config"]) \
            if isinstance(model_cfg.get("teacher_config"), str) else \
            Config(dict(model=model_cfg["teacher_config"]))
        t_model_cfg = dict(t_cfg.model)
        _apply_presort_hint(cfg, t_model_cfg, logger)
        teacher = build_detector(t_model_cfg)

    # init on a single sample
    first = next(iter(loader))
    family = "bevformer" if is_bevformer else \
        ("distill" if is_distill else "points")
    batch0 = batch_to_device(
        jax.tree_util.tree_map(lambda x: x[:1] if hasattr(
            x, "shape") else x,
            {k: v for k, v in first.items() if k != "img_metas"}),
        family)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        if is_distill:
            tvars = jax.jit(teacher.init)(rng, batch0.points,
                                          batch0.point_mask)
            if model_cfg.get("teacher_ckpt"):
                logger.info("loading teacher checkpoint "
                            f"{model_cfg['teacher_ckpt']}")
                # torch checkpoints need the model converter mapping;
                # orbax checkpoints restore directly
                tvars = _load_any_checkpoint(
                    model_cfg["teacher_ckpt"], tvars)
            _, t_bundle = jax.jit(teacher.apply)(
                tvars, batch0.points, batch0.point_mask)
            from functools import partial
            if is_bevformer:
                # transformer student init signature (reference
                # custom_train path, tools/train.py:234-242)
                variables = jax.jit(partial(
                    model.init, method="init_with_teacher"))(
                    rng, batch0.imgs, batch0.can_bus, batch0.lidar2img,
                    batch0.prev_exists, t_bundle.bev_feat)
            else:
                variables = jax.jit(partial(
                    model.init, method="init_with_teacher"))(
                    rng, batch0.img_inputs, t_bundle)
            selectors = []
            if is_bevformer:
                # transformer-path inheritance flags (reference
                # bevformer_distill.py:266-285)
                if model_cfg.get("inherit_head"):
                    selectors += [r"cls_\d+_.*", r"reg_\d+_.*"]
                if model_cfg.get("inherit_decoder"):
                    selectors += [r"decoder"]
                if model_cfg.get("inherit_query"):
                    selectors += [r"query_embedding"]
            if selectors:
                from ..training.param_utils import \
                    inherit_params_by_selectors
                variables = dict(variables)
                variables["params"] = inherit_params_by_selectors(
                    variables["params"], tvars["params"], selectors,
                    verbose=True)
            elif model_cfg.get("inherit_head"):
                variables = dict(variables)
                variables["params"] = inherit_head_params(
                    variables["params"], tvars["params"], verbose=True)
            if model_cfg.get("self_ckpt"):
                # warm start from a previous distill run (reference
                # bevdet_distill.py:163-173 load_checkpoint(self))
                logger.info("loading self checkpoint "
                            f"{model_cfg['self_ckpt']}")
                variables = _load_any_checkpoint(
                    model_cfg["self_ckpt"], variables)
        elif is_bevformer:
            variables = jax.jit(model.init)(
                rng, batch0.imgs, batch0.can_bus, batch0.lidar2img,
                batch0.prev_exists)
        else:
            variables = jax.jit(model.init)(rng, batch0.points,
                                            batch0.point_mask)

    opt_cfg = dict(cfg.optimizer)
    base_lr = opt_cfg.get("lr", 1e-4)
    lr_sched = build_lr_schedule(dict(cfg.lr_config), base_lr,
                                 total_steps, steps_per_epoch)
    grad_clip = dict(cfg.optimizer_config).get("grad_clip") \
        if "optimizer_config" in cfg else None
    momentum_sched = None
    if "momentum_config" in cfg and cfg.momentum_config:
        mc = dict(cfg.momentum_config)
        if mc.get("policy", "").lower() == "cyclic":
            from ..training.schedules import cyclic_momentum
            momentum_sched = cyclic_momentum(
                base_momentum=opt_cfg.get("betas", (0.9, 0.999))[0],
                total_steps=total_steps,
                target_ratio=mc.get("target_ratio", (0.85 / 0.95, 1)),
                cyclic_times=mc.get("cyclic_times", 1),
                step_ratio_up=mc.get("step_ratio_up", 0.4))
    tx = build_optimizer(opt_cfg, lr_sched, variables["params"],
                         grad_clip=grad_clip,
                         momentum_schedule=momentum_sched)
    state = init_train_state(variables["params"],
                             variables.get("batch_stats", {}), tx)

    # cfg.fp16 (the reference's Fp16OptimizerHook trigger,
    # apis/mmdet_train.py:133-136) -> bf16 mixed precision on TPU
    mixed = bool(cfg.get("fp16", None))
    if is_bevformer:
        from ..training import (make_bevformer_distill_train_step,
                                make_bevformer_train_step)
        head_cfg = dict(model_cfg.get("pts_bbox_head") or {})
        bev_h = head_cfg.get("bev_h", 200)
        bev_w = head_cfg.get("bev_w", 200)
        if is_distill:
            raw_step = make_bevformer_distill_train_step(
                model, teacher, tx, bev_h, bev_w,
                mixed_precision=mixed, seed=cfg.get("seed", 0))
        else:
            raw_step = make_bevformer_train_step(
                model, tx, mixed_precision=mixed,
                seed=cfg.get("seed", 0))
        step_fn = jax.jit(raw_step, donate_argnums=(0,))
    elif is_distill:
        # accum_steps>1: gradient microbatching — the effective batch of
        # the reference's samples_per_gpu=8 recipes with the activation
        # working set of samples_per_gpu/accum_steps (the B>4 HBM knee,
        # docs/PERF.md "Batch size")
        step_fn = jax.jit(make_distill_train_step(
            model, teacher, tx, mixed_precision=mixed,
            accum_steps=int(cfg.get("accum_steps", 1))),
            donate_argnums=(0,))
    else:
        base_step = make_detector_train_step(model, tx)
        step_fn = jax.jit(lambda s, t, b, e: base_step(s, b),
                          donate_argnums=(0,))

    ckpt = CheckpointManager(osp.join(work_dir, "ckpt"),
                             max_to_keep=cfg.get(
                                 "checkpoint_config", {}).get(
                                 "max_keep_ckpts", 3))
    start_epoch = 0
    if resume_from:
        restored, meta = ckpt.restore(state)
        if restored is not None:
            state = restored
            start_epoch = (meta or {}).get("epoch", 0)
            logger.info(f"resumed from epoch {start_epoch}")

    from ..utils.observability import MetricsWriter, StepTimer
    writer = MetricsWriter(osp.join(work_dir, "tb"))
    timer = StepTimer()
    log_interval = dict(cfg.get("log_config", {})).get("interval", 50)
    eval_interval = dict(cfg.get("evaluation", {})).get("interval", 0)

    with mesh:
        state = replicate(mesh, state)
        if tvars is not None:
            tvars = replicate(mesh, tvars)
        step = 0
        for epoch in range(start_epoch, max_epochs):
            loader.set_epoch(epoch)
            epoch_val = jnp.float32(epoch)
            for i, raw in enumerate(loader):
                if i >= steps_per_epoch:
                    break
                batch = shard_batch(mesh, batch_to_device(
                    {k: v for k, v in raw.items() if k != "img_metas"},
                    family))
                state, metrics = step_fn(state, tvars, batch, epoch_val)
                step += 1
                dt = timer.tick()
                if step % log_interval == 0:
                    host = {k: float(v) for k, v in metrics.items()}
                    host["lr"] = float(lr_sched(step))
                    writer.write(host, step, epoch=epoch)
                    logger.info(
                        f"epoch {epoch} step {i}/{steps_per_epoch} "
                        f"loss {host['total_loss']:.4f} "
                        f"({(dt or 0):.2f}s/it)")
            ckpt.save(epoch, jax.device_get(state),
                      meta=dict(epoch=epoch + 1))
            if eval_interval and (epoch + 1) % eval_interval == 0 and                     "val" in cfg.data:
                logger.info(f"epoch {epoch}: running eval")
                try:
                    _run_interval_eval(cfg, model, state, family, logger)
                except Exception as e:
                    # surface eval breakage by default — a silently
                    # broken eval path can waste a full training run
                    if dict(cfg.get("evaluation", {})).get(
                            "allow_failure", False):
                        logger.warning(f"eval failed (allowed): {e}")
                    else:
                        raise
        ckpt.wait()
    writer.close()
    return state


def _run_interval_eval(cfg, model, state, family, logger):
    import jax
    from ..datasets import build_dataset, build_dataloader
    from .test import run_eval, evaluate_results
    val_ds = build_dataset(cfg.data["val"])
    val_loader = build_dataloader(val_ds, 1, 2, shuffle=False)
    variables = {"params": jax.device_get(state.params),
                 "batch_stats": jax.device_get(state.batch_stats)}
    results = run_eval(model, variables, val_ds, val_loader,
                       family="img" if family == "distill" else family,
                       logger=logger)
    evaluate_results(val_ds, results, logger=logger)


def _load_any_checkpoint(path: str, template):
    """Restore orbax dirs or convert torch .pth checkpoints."""
    import jax
    if osp.isdir(path):
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path, template)
    from ..training.param_utils import load_torch_checkpoint
    raise NotImplementedError(
        "torch checkpoint conversion requires a model-specific name map; "
        "use tools/model_converters/convert_torch_ckpt.py first")
