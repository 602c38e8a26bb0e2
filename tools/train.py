#!/usr/bin/env python
"""Training CLI (reference: tools/train.py:102-251 — config load,
--cfg-options deep merge, seed/deterministic, work-dir handling,
model/dataset build, dispatch to the training loop)."""
from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from distillbev_tpu.config import Config, DictAction


def parse_args():
    parser = argparse.ArgumentParser(description="Train a detector")
    parser.add_argument("config", help="train config file path")
    parser.add_argument("--work-dir", help="the dir to save logs/ckpts")
    parser.add_argument("--resume-from",
                        help="checkpoint to resume from")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--deterministic", action="store_true")
    parser.add_argument("--cfg-options", nargs="+",
                        action=DictAction.argparse(),
                        help="override config: KEY=VALUE pairs")
    parser.add_argument("--autoscale-lr", action="store_true",
                        help="scale lr linearly with device count "
                             "(reference rule lr*n/8)")
    parser.add_argument("--max-steps-per-epoch", type=int, default=None,
                        help="debug: truncate epochs")
    parser.add_argument("--distributed", action="store_true",
                        help="multi-host: jax.distributed.initialize() "
                             "from the cluster env (SLURM / TPU pod) — "
                             "the NCCL init_dist counterpart "
                             "(reference tools/train.py:137-144)")
    parser.add_argument("--dry-run", action="store_true",
                        help="resolve the config (incl. --cfg-options), "
                             "build the model, print a summary and exit "
                             "without touching data or devices — used "
                             "by the launch-recipe smoke tests")
    return parser.parse_args()


def main():
    args = parse_args()
    if args.distributed:
        import jax
        jax.distributed.initialize()
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)
    cfg.seed = args.seed
    work_dir = args.work_dir or osp.join(
        "./work_dirs", osp.splitext(osp.basename(args.config))[0])
    if args.autoscale_lr:
        import jax
        cfg.optimizer["lr"] = cfg.optimizer["lr"] * \
            jax.device_count() / 8
    os.makedirs(work_dir, exist_ok=True)
    cfg.dump(osp.join(work_dir, "config_dump.py"))

    if args.dry_run:
        # resolve + build only: proves the recipe's config and override
        # surface without data or devices (recipe smoke tests)
        from distillbev_tpu.models import build_detector
        model = build_detector(cfg.model)
        print(f"[dry-run] config OK: {args.config}")
        print(f"[dry-run] model: {type(model).__name__}")
        print(f"[dry-run] work_dir: {work_dir}")
        return

    from distillbev_tpu.apis.train import train_model
    from distillbev_tpu.utils.logger import get_root_logger, collect_env
    logger = get_root_logger(osp.join(work_dir, "train.log"))
    logger.info(f"environment: {collect_env()}")
    logger.info(f"config: {args.config}")
    train_model(cfg, work_dir, resume_from=args.resume_from,
                max_steps_per_epoch=args.max_steps_per_epoch,
                logger=logger)


if __name__ == "__main__":
    main()
