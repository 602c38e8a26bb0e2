"""Per-HLO-op profile of the flagship distill train step on the TPU.

Runs the same step as bench.py under ``jax.profiler.trace`` and prints
an hlo_stats summary (xprof raw_to_tool_data): top ops by self time,
plus a category rollup (convolution / fusion / sort / scatter / ...)
with MXU-utilization context.  The decisive tool for the perf levers
tracked in docs/PERF.md.

Usage: python tools/analysis_tools/profile_step.py [out_dir]
Env: BENCH_BATCH (4), BENCH_PRECISION (bf16), PROFILE_ITERS (3)
"""
import glob
import json
import os
import sys

# NOTE: do not use PYTHONPATH for this — setting it breaks the axon
# TPU plugin registration in this environment; sys.path works
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def collect_hlo_stats(trace_dir: str):
    """xplane protobufs -> parsed hlo_stats rows (list of dicts)."""
    from xprof.convert import raw_to_tool_data as rtd
    xplanes = glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb"))
    assert xplanes, f"no xplane.pb under {trace_dir}"
    data, _ = rtd.xspace_to_tool_data(xplanes, "hlo_stats", {})
    if not isinstance(data, str):
        data = data.decode()
    d = json.loads(data)     # gviz table: {cols: [...], rows: [{c: []}]}
    cols = [c.get("label") or c.get("id") for c in d["cols"]]
    rows = []
    for r in d["rows"]:
        vals = [x.get("v") if isinstance(x, dict) else x for x in r["c"]]
        rows.append(dict(zip(cols, vals)))
    return rows


def summarize(rows, top_n=25):
    """Print per-category rollup + top ops by self time."""
    def f(row, *names, default=0.0):
        for n in names:
            if n in row and row[n] not in ("", None):
                try:
                    return float(row[n])
                except (TypeError, ValueError):
                    pass
        return default

    def s(row, *names):
        for n in names:
            if n in row and row[n]:
                return str(row[n])
        return "?"

    total = sum(f(r, "Total self time (us)") for r in rows)
    cats = {}
    for r in rows:
        c = s(r, "HLO op category")
        t = f(r, "Total self time (us)")
        fl = f(r, "Model GFLOP/s")
        cur = cats.setdefault(c, [0.0, 0.0])
        cur[0] += t
        cur[1] += t * fl
    print(f"== categories (total {total / 1e3:.1f} ms) ==")
    for c, (t, wfl) in sorted(cats.items(), key=lambda kv: -kv[1][0]):
        gflops = (wfl / t) if t else 0.0
        print(f"{c:32s} {t / 1e3:9.2f} ms  {100 * t / total:5.1f}%"
              f"  avg {gflops:8.1f} GFLOP/s")
    print(f"== top {top_n} ops by self time ==")
    for r in sorted(rows, key=lambda r: -f(
            r, "Total self time (us)"))[:top_n]:
        t = f(r, "Total self time (us)")
        src = s(r, "Source Info")
        src = src.rsplit(">", 2)[-2].split("<")[0] if "<" in src else src
        print(f"{t / 1e3:8.2f} ms  {s(r, 'HLO op category'):20s}"
              f" {f(r, 'Model GFLOP/s'):9.1f} GFLOP/s"
              f" {s(r, 'Bound by'):12s}"
              f" {s(r, 'HLO op name')[:40]:40s} {src[-60:]}")
    return cats, total


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xprof_step"
    import jax
    import jax.numpy as jnp

    if os.environ.get("PROFILE_MODEL", "flagship") == "bevformer":
        # full-size BEVFormer distill step (bench_bevformer.setup
        # honors BF_QUEUE/BF_IMG/BF_POINTS)
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import bench_bevformer
        step_fn, state, tvars, batch = bench_bevformer.setup()
        epoch = jnp.float32(1.0)
        state, metrics = step_fn(state, tvars, batch, epoch)
        float(metrics["total_loss"])
        n = int(os.environ.get("PROFILE_ITERS", "1"))
        with jax.profiler.trace(out_dir):
            for _ in range(n):
                state, metrics = step_fn(state, tvars, batch, epoch)
            float(metrics["total_loss"])
        summarize(collect_hlo_stats(out_dir))
        return

    from distillbev_tpu.apis.flagship import build_flagship
    from distillbev_tpu.training import (init_train_state,
                                         make_distill_train_step)
    from distillbev_tpu.training.optim import build_optimizer
    from distillbev_tpu.training.schedules import build_lr_schedule

    batch_size = int(os.environ.get("BENCH_BATCH", "4"))
    mixed = os.environ.get("BENCH_PRECISION", "bf16") == "bf16"
    student, teacher, svars, tvars, batch = build_flagship(
        batch_size=batch_size, tiny=False, teacher_bf16=mixed)
    lr = build_lr_schedule(dict(policy="step", step=[16, 22]), 2e-4,
                           total_steps=10000, steps_per_epoch=1000)
    tx = build_optimizer(dict(type="AdamW", lr=2e-4, weight_decay=1e-2),
                         lr, svars["params"], grad_clip=dict(max_norm=5))
    state = init_train_state(svars["params"],
                             svars.get("batch_stats", {}), tx)
    step_fn = jax.jit(make_distill_train_step(
        student, teacher, tx, mixed_precision=mixed),
        donate_argnums=(0,))
    epoch = jnp.float32(1.0)
    for _ in range(2):       # compile + settle
        state, metrics = step_fn(state, tvars, batch, epoch)
        float(metrics["total_loss"])
    n = int(os.environ.get("PROFILE_ITERS", "3"))
    with jax.profiler.trace(out_dir):
        for _ in range(n):
            state, metrics = step_fn(state, tvars, batch, epoch)
        float(metrics["total_loss"])
    rows = collect_hlo_stats(out_dir)
    summarize(rows)


if __name__ == "__main__":
    main()
