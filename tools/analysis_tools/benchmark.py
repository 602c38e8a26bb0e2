#!/usr/bin/env python
"""Inference FPS benchmark (reference: tools/analysis_tools/benchmark.py
:30-80 — FPS over 2000 samples with warmup)."""
from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))


def parse_args():
    p = argparse.ArgumentParser(description="Benchmark inference FPS")
    p.add_argument("config", nargs="?", default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--samples", type=int, default=200)
    p.add_argument("--warmup", type=int, default=10)
    p.add_argument("--flagship", action="store_true",
                   help="benchmark the built-in flagship model on "
                        "synthetic data (no dataset needed)")
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    if args.flagship or args.config is None:
        from distillbev_tpu.apis.flagship import build_flagship
        student, teacher, svars, tvars, batch = build_flagship(
            batch_size=1, tiny=False)

        @jax.jit
        def infer(variables, img_inputs):
            preds, bundle, _ = student.apply(variables, img_inputs)
            return student.apply(variables, preds,
                                 method=student.get_bboxes)

        for _ in range(args.warmup):
            out = infer(svars, batch.img_inputs)
            float(out.scores[0, 0])
        t0 = time.perf_counter()
        for _ in range(args.samples):
            out = infer(svars, batch.img_inputs)
            float(out.scores[0, 0])
        dt = time.perf_counter() - t0
        print(f"Overall fps: {args.samples / dt:.2f} img / s "
              f"({dt / args.samples * 1000:.2f} ms/sample, "
              f"fwd+decode, batch 1)")
        return

    raise SystemExit("dataset-driven benchmark requires --flagship or a "
                     "prepared dataset; see tools/test.py")


if __name__ == "__main__":
    main()
