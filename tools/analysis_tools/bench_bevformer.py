"""Full-size LidarFormer -> BEVFormer distillation step on one chip.

Builds the SHIPPED flagship config
(configs/lidar2camera_bev_distillation/teacher_to_bevformer/
lidarformer_to_bevformer_nus_1x1conv_r50.py: queue=4, 6 cams at
928x1600, BEV 200x200, 900 queries, spconv teacher) with synthetic
full-size inputs and times the jitted distill train step — the round-2
deliverable proving the memory levers (bf16, remat, query chunking,
hand-written attention VJP, scanned history queue) hold at full size
(reference recipe: scripts/teacher_to_bevformer/exp_lidar_r50.sh).

Usage: python tools/analysis_tools/bench_bevformer.py
Env: BF_ITERS (3), BF_QUEUE (4), BF_IMG ("928x1600"), BF_POINTS (300000)

vs_baseline: the reference publishes no step times for this recipe
(SURVEY.md §6).  Estimate, same honesty bar as bench.py's CNN number:
upstream BEVFormer documents ~2 days for 24 epochs of the base model
on 8 A100s (BEVFormer README), i.e. 24 x 28130 samples / (2 x 86400 s
x 8 GPU) ~= 0.49 samples/s per GPU at samples_per_gpu=1; the distill
recipe swaps R101-DCN for R50 (faster) but adds the frozen spconv
LidarFormer teacher forward (slower), so we take 0.5 samples/s/GPU
(2.0 s/step at B=1) as the per-device reference estimate and report
vs_baseline = measured_samples_per_sec / 0.5.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

# persistent compile cache shared with bench.py (slow tunnel compiles)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(
                          os.path.abspath(__file__)), "..", "..",
                          ".jax_cache-tpu"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")


def setup():
    """Build the full-size distill step -> (step_fn, state, tvars, batch).
    Shared by this bench and profile_step.py's PROFILE_MODEL=bevformer."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from distillbev_tpu.config import Config
    from distillbev_tpu.models import build_detector
    from distillbev_tpu.training import (
        init_train_state, make_bevformer_distill_train_step,
        make_bevformer_distill_split_steps)
    from distillbev_tpu.training.train_step import BEVFormerBatch
    from distillbev_tpu.training.optim import build_optimizer
    from distillbev_tpu.training.schedules import build_lr_schedule

    repo = os.path.join(os.path.dirname(__file__), "..", "..")
    cfg = Config.fromfile(os.path.join(
        repo, "configs/lidar2camera_bev_distillation/teacher_to_bevformer",
        "lidarformer_to_bevformer_nus_1x1conv_r50.py"))
    model_cfg = dict(cfg.model)
    t_cfg = Config.fromfile(os.path.join(
        repo, model_cfg["teacher_config"]))

    q = int(os.environ.get("BF_QUEUE", "4"))
    h, w = (int(v) for v in os.environ.get("BF_IMG", "928x1600").split(
        "x"))
    npts = int(os.environ.get("BF_POINTS", "300000"))
    b, ncam, nobj = 1, 6, 64

    student = build_detector(model_cfg, cfg.get("train_cfg"),
                             cfg.get("test_cfg"))
    teacher = build_detector(dict(t_cfg.model), t_cfg.get("train_cfg"),
                             t_cfg.get("test_cfg"))

    rng = np.random.RandomState(0)
    # plausible camera projections so point_sampling produces real hits
    sys.path.insert(0, os.path.join(repo, "tests"))
    from test_model_bevformer import nuscenes_like_lidar2img
    l2i = np.tile(nuscenes_like_lidar2img(h, w)[None, None],
                  (b, q, 1, 1, 1)).astype(np.float32)
    pts = rng.uniform(-50, 50, (b, npts, 5)).astype(np.float32)
    pts[..., 2] = rng.uniform(-4, 2, (b, npts))
    pts[..., 3] = rng.uniform(0, 255, (b, npts))
    pts[..., 4] = 0.0
    gt = np.zeros((b, nobj, 9), np.float32)
    gt[..., :2] = rng.uniform(-40, 40, (b, nobj, 2))
    gt[..., 3:6] = rng.uniform(1, 4, (b, nobj, 3))
    batch = BEVFormerBatch(
        imgs=jnp.asarray(rng.uniform(-2, 2, (b, q, ncam, h, w, 3)),
                         jnp.float32),
        can_bus=jnp.asarray(rng.uniform(-1, 1, (b, q, 18)), jnp.float32),
        lidar2img=jnp.asarray(l2i),
        prev_exists=jnp.asarray(np.array([[0.0] + [1.0] * (q - 1)] * b),
                                jnp.float32),
        points=jnp.asarray(pts),
        point_mask=jnp.ones((b, npts), bool),
        gt_boxes=jnp.asarray(gt),
        gt_labels=jnp.zeros((b, nobj), jnp.int32),
        gt_mask=jnp.asarray(np.arange(nobj)[None] < 32).astype(bool),
    )

    print("init (teacher + student)...", flush=True)
    key = jax.random.PRNGKey(0)
    tvars = jax.jit(teacher.init)(key, batch.points, batch.point_mask)
    t0 = time.perf_counter()
    _, t_bundle = jax.jit(teacher.apply)(tvars, batch.points,
                                         batch.point_mask)
    jax.block_until_ready(t_bundle.bev_feat)
    print(f"teacher fwd ok {time.perf_counter() - t0:.1f}s", flush=True)

    from functools import partial
    svars = jax.jit(partial(student.init,
                            method="init_with_teacher"))(
        key, batch.imgs, batch.can_bus, batch.lidar2img,
        batch.prev_exists, t_bundle.bev_feat)
    print("student init ok", flush=True)

    head_cfg = dict(model_cfg["pts_bbox_head"])
    lr = build_lr_schedule(dict(policy="CosineAnnealing",
                                warmup="linear", warmup_iters=500,
                                warmup_ratio=1.0 / 3,
                                min_lr_ratio=1e-3), 2e-4,
                           total_steps=10000, steps_per_epoch=1000)
    tx = build_optimizer(dict(type="AdamW", lr=2e-4, weight_decay=0.01),
                         lr, svars["params"],
                         grad_clip=dict(max_norm=35))
    state = init_train_state(svars["params"],
                             svars.get("batch_stats", {}), tx)
    split = os.environ.get("BF_SPLIT", "1") == "1"
    if split:
        # two jits per step: this sandbox's compile helper is SIGKILLed
        # by the fused step's HLO; the split halves what it must hold
        # (identical math — the teacher is frozen)
        teacher_fn, student_fn = make_bevformer_distill_split_steps(
            student, teacher, tx, head_cfg["bev_h"], head_cfg["bev_w"],
            mixed_precision=True)
        teacher_fn = jax.jit(teacher_fn)
        student_fn = jax.jit(student_fn, donate_argnums=(0,))

        def step_fn(state, tvars, batch, epoch):
            t_outs, t_bev, t_dec = teacher_fn(tvars, batch)
            return student_fn(state, t_outs, t_bev, t_dec, batch, epoch)
    else:
        step_fn = jax.jit(make_bevformer_distill_train_step(
            student, teacher, tx, head_cfg["bev_h"], head_cfg["bev_w"],
            mixed_precision=True), donate_argnums=(0,))
    return step_fn, state, tvars, batch


def main():
    import time

    import jax.numpy as jnp
    import numpy as np
    step_fn, state, tvars, batch = setup()
    split = os.environ.get("BF_SPLIT", "1") == "1"
    print(f"compiling full step (split={split})...", flush=True)
    t0 = time.perf_counter()
    state, metrics = step_fn(state, tvars, batch, jnp.float32(1.0))
    loss0 = float(metrics["total_loss"])
    print(f"compile+step1 {time.perf_counter() - t0:.1f}s "
          f"total_loss={loss0:.3f}", flush=True)
    assert np.isfinite(loss0)

    n = int(os.environ.get("BF_ITERS", "3"))
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = step_fn(state, tvars, batch, jnp.float32(1.0))
    final = float(metrics["total_loss"])
    dt = (time.perf_counter() - t0) / n
    baseline_samples_per_sec = 0.5   # per-GPU estimate (docstring)
    import json
    print(f"full-size BEVFormer distill step: {dt * 1e3:.1f} ms "
          f"({1.0 / dt:.2f} samples/s/chip, B=1) total_loss={final:.3f}",
          flush=True)
    print(json.dumps({
        "metric": "bevformer_distill_step", "value": round(dt * 1e3, 1),
        "unit": "ms",
        "vs_baseline": round((1.0 / dt) / baseline_samples_per_sec, 3),
    }), flush=True)

    # BF_PROFILE=<dir>: trace one step and print the hlo_stats rollup
    # (same xprof path as profile_step.py)
    prof_dir = os.environ.get("BF_PROFILE")
    if prof_dir:
        import jax
        from profile_step import collect_hlo_stats, summarize
        with jax.profiler.trace(prof_dir):
            state, metrics = step_fn(state, tvars, batch,
                                     jnp.float32(1.0))
            float(metrics["total_loss"])
        summarize(collect_hlo_stats(prof_dir), top_n=40)


if __name__ == "__main__":
    main()
