"""Plot mAP/NDS (or any logged metric) training curves.

Capability counterpart of the reference's experiment plotting script
(reference tools/visualization/draw_map_nds.py — hardcoded matplotlib
curve lists); this version reads the numbers from training workdirs
instead: every run's ``tb/metrics.jsonl`` (written by apis/train.py)
and optional ``eval.jsonl`` records, one curve per run.

Usage:
    python tools/visualization/draw_map_nds.py WORKDIR [WORKDIR ...] \
        [--metrics mAP NDS] [--x epoch] [--out curves.jpg]

Labels default to the workdir basenames.
"""
import argparse
import json
import os.path as osp


def load_records(workdir):
    """All jsonl records of a run, metrics + eval merged."""
    recs = []
    for name in ("tb/metrics.jsonl", "metrics.jsonl", "eval.jsonl",
                 "tb/eval.jsonl"):
        path = osp.join(workdir, name)
        if osp.exists(path):
            with open(path) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        recs.append(json.loads(line))
    return recs


def extract_curve(recs, metric, x_key):
    xs, ys = [], []
    for r in recs:
        if metric in r:
            xs.append(r.get(x_key, r.get("step", len(xs))))
            ys.append(float(r[metric]))
    return xs, ys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdirs", nargs="+")
    ap.add_argument("--metrics", nargs="+", default=["mAP", "NDS"])
    ap.add_argument("--x", default="epoch",
                    help="x-axis record key (epoch/step)")
    ap.add_argument("--out", default="curves.jpg")
    ap.add_argument("--labels", nargs="*", default=None)
    args = ap.parse_args()

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    labels = args.labels or [osp.basename(osp.normpath(w))
                             for w in args.workdirs]
    n = len(args.metrics)
    fig, axes = plt.subplots(1, n, figsize=(6 * n, 4.5), squeeze=False)
    styles = ["bo-", "rv-", "g^-", "cs-", "mD-", "y*-"]
    plotted = 0
    for mi, metric in enumerate(args.metrics):
        ax = axes[0][mi]
        for wi, (wd, label) in enumerate(zip(args.workdirs, labels)):
            xs, ys = extract_curve(load_records(wd), metric, args.x)
            if not xs:
                continue
            ax.plot(xs, ys, styles[wi % len(styles)], label=label)
            plotted += 1
        ax.set_xlabel(args.x)
        ax.set_ylabel(metric)
        ax.set_title(metric)
        ax.grid(True, alpha=0.3)
        ax.legend()
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out} ({plotted} curves across "
          f"{len(args.metrics)} panels)")
    return 0 if plotted else 1


if __name__ == "__main__":
    raise SystemExit(main())
