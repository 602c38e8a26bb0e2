#!/usr/bin/env python
"""Evaluation CLI (reference: tools/test.py:105-260 — config + checkpoint
load, eval over the val split, --eval mAP metrics dump)."""
from __future__ import annotations

import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from distillbev_tpu.config import Config, DictAction


def parse_args():
    parser = argparse.ArgumentParser(description="Test a detector")
    parser.add_argument("config")
    parser.add_argument("checkpoint", nargs="?", default=None)
    parser.add_argument("--eval", nargs="*", default=["mAP"])
    parser.add_argument("--out", help="json path for raw results")
    parser.add_argument("--cfg-options", nargs="+",
                        action=DictAction.argparse())
    parser.add_argument("--distributed", action="store_true",
                        help="multi-host: jax.distributed.initialize()")
    parser.add_argument(
        "--save_attention", nargs="?", const="attention_dump",
        default=None, metavar="DIR",
        help="distill configs only: dump foreground/attention/FP masks "
        "for shuffled train batches to DIR as .npz and exit "
        "(reference tools/test.py:163)")
    parser.add_argument("--save-limit", type=int, default=8,
                        help="batches to dump with --save_attention")
    return parser.parse_args()


def load_eval_variables(path: str):
    """Checkpoint -> inference ``variables`` (params + batch_stats).

    Accepts the training CheckpointManager directory written by
    tools/train.py (work_dir/ckpt, numbered steps holding a TrainState),
    a bare orbax StandardSave directory, or a torch .pth file through
    the model converter (reference tools/test.py loads mmcv .pth
    checkpoints:105-260)."""
    path = osp.abspath(path)
    if not osp.isdir(path):
        raise SystemExit(
            f"{path} is not an orbax checkpoint directory; convert "
            "torch .pth checkpoints first with "
            "tools/model_converters/convert_torch_ckpt.py")
    import orbax.checkpoint as ocp
    from distillbev_tpu.training.checkpoints import CheckpointManager
    mgr = CheckpointManager(path)
    step = mgr.latest_step()
    if step is not None:
        restored = mgr._mgr.restore(
            step, args=ocp.args.Composite(
                state=ocp.args.StandardRestore()))
        state = restored["state"]
        get = state.get if isinstance(state, dict) else \
            lambda k, d=None: getattr(state, k, d)
        return {"params": get("params"),
                "batch_stats": get("batch_stats") or {}}
    ckptr = ocp.StandardCheckpointer()
    variables = ckptr.restore(path)
    if "params" not in variables:
        variables = {"params": variables, "batch_stats": {}}
    return variables


def main():
    args = parse_args()
    if args.distributed:
        import jax
        jax.distributed.initialize()
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)

    import jax
    from distillbev_tpu.apis.test import (
        run_eval, evaluate_results, collect_results_hosts,
        tta_flip_combos_from_pipeline)

    if args.save_attention:
        from distillbev_tpu.apis.debug import save_attention_dump
        variables = load_eval_variables(args.checkpoint) \
            if args.checkpoint else None
        n = save_attention_dump(cfg, variables, args.save_attention,
                                limit=args.save_limit)
        print(f"saved {n} attention dumps to {args.save_attention}")
        return
    from distillbev_tpu.datasets import build_dataset, build_dataloader
    from distillbev_tpu.models import build_detector
    from distillbev_tpu.utils.logger import get_root_logger

    logger = get_root_logger()
    test_cfg_data = dict(cfg.data["test"])
    # double-flip TTA (reference centerpoint.py aug_test_pts): read the
    # combos off MultiScaleFlipAug3D, then strip the flags so the
    # loader emits single samples — the flips run on device instead
    tta_flips = tta_flip_combos_from_pipeline(
        test_cfg_data.get("pipeline"))
    if tta_flips:
        logger.info(f"TTA enabled: {len(tta_flips)} flip combos")
        pipeline = []
        for t in test_cfg_data["pipeline"]:
            t = dict(t)
            if t.get("type") == "MultiScaleFlipAug3D":
                t["pcd_horizontal_flip"] = False
                t["pcd_vertical_flip"] = False
                t["flip"] = False
            pipeline.append(t)
        test_cfg_data["pipeline"] = pipeline
        cfg.data["test"] = test_cfg_data
    dataset = build_dataset(cfg.data["test"])
    loader = build_dataloader(dataset, cfg.data.get(
        "samples_per_gpu", 1), cfg.data["workers_per_gpu"],
        shuffle=False)
    model = build_detector(dict(cfg.model), cfg.get("train_cfg"),
                           cfg.get("test_cfg"))
    mtype = cfg.model["type"]
    if "BEVFormer" in mtype:
        # sequential scene-state eval (reference bevformer.py:233-266)
        family = "bevformer"
    elif any(k in mtype for k in ("BEVDet", "BEVDepth")):
        family = "img"
    else:
        family = "points"

    if args.checkpoint:
        variables = load_eval_variables(args.checkpoint)
    else:
        logger.warning("no checkpoint given — evaluating random init")
        raise SystemExit("checkpoint required")

    results = run_eval(model, variables, dataset, loader, family=family,
                       logger=logger,
                       tta_flips=tta_flips if family == "points"
                       else None)
    if jax.process_count() > 1:
        # per-host shards -> host 0 (reference apis/test.py
        # collect_results_cpu:204-244)
        results = collect_results_hosts(
            results, osp.join(cfg.get("work_dir", "."), ".eval_parts"))
        if results is None:      # non-zero host
            return
    if args.out:
        np_results = {k: [v2.tolist() for v2 in v]
                      for k, v in results.items()}
        with open(args.out, "w") as f:
            json.dump(np_results, f)
    metrics = evaluate_results(dataset, results, logger=logger)
    print(json.dumps({k: float(v) for k, v in metrics.items()},
                     indent=2))


if __name__ == "__main__":
    main()
