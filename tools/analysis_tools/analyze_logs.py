#!/usr/bin/env python
"""Training-log analysis (reference: tools/analysis_tools/analyze_logs.py
— plot loss curves / compute average iter time from json logs).

Consumes the metrics.jsonl written by utils/observability.MetricsWriter.
"""
from __future__ import annotations

import argparse
import json
import os.path as osp
import sys

import numpy as np


def load_jsonl(path):
    records = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                records.append(json.loads(line))
    return records


def cal_train_time(records):
    ts = [r["ts"] for r in records if "ts" in r]
    if len(ts) < 2:
        print("not enough records")
        return
    dts = np.diff(ts)
    print(f"average iter time: {np.mean(dts):.4f}s "
          f"(std {np.std(dts):.4f}, fastest {np.min(dts):.4f}, "
          f"slowest {np.max(dts):.4f})")


def plot_curve(records, keys, out=None):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    for key in keys:
        xs = [r["step"] for r in records if key in r]
        ys = [r[key] for r in records if key in r]
        if not xs:
            print(f"key {key} not found")
            continue
        plt.plot(xs, ys, label=key)
    plt.xlabel("step")
    plt.legend()
    if out:
        plt.savefig(out)
        print(f"saved {out}")
    else:
        print("no --out given; skipping display in headless env")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("task", choices=["plot_curve", "cal_train_time"])
    p.add_argument("jsonl", help="metrics.jsonl path")
    p.add_argument("--keys", nargs="+", default=["total_loss"])
    p.add_argument("--out", default=None)
    a = p.parse_args()
    records = load_jsonl(a.jsonl)
    if a.task == "cal_train_time":
        cal_train_time(records)
    else:
        plot_curve(records, a.keys, a.out)
