#!/usr/bin/env python
"""Print the fully-resolved config (reference tools/misc/print_config.py):
resolves _base_ composition and --cfg-options overrides, then dumps the
final dict."""
from __future__ import annotations

import argparse
import os.path as osp
import pprint
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))

from distillbev_tpu.config import Config, DictAction


def main():
    p = argparse.ArgumentParser(description="Print the resolved config")
    p.add_argument("config")
    p.add_argument("--cfg-options", nargs="+", action=DictAction.argparse(),
                   help="override settings, key=value pairs")
    args = p.parse_args()
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_dict(args.cfg_options)
    pprint.pprint(cfg.to_dict() if hasattr(cfg, "to_dict") else dict(cfg))


if __name__ == "__main__":
    main()
