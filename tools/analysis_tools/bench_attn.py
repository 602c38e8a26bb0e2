"""Micro-bench for the deformable-attention sampling core on the TPU.

Times ms_deform_attn forward and forward+backward at the flagship
BEVFormer shapes (TSA: 40k BEV queries over the 200x200 BEV grid with 2
queue slots; SCA: one camera's top-K queries over the 4-level image
pyramid at 928x1600) — the op pool that dominates the full-size distill
step (docs/PERF.md round-2 BEVFormer profile).

Usage: python tools/analysis_tools/bench_attn.py [tsa|sca|both]
Env: ATTN_ITERS (5), ATTN_DTYPE (bf16|f32)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def bench_case(name, b, v_shapes, q, m, c, p, dtype):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from distillbev_tpu.ops.ms_deform_attn import ms_deform_attn

    rng = np.random.RandomState(0)
    hw = sum(h * w for h, w in v_shapes)
    lvls = len(v_shapes)
    value = jnp.asarray(rng.randn(b, hw, m, c), dtype)
    loc = jnp.asarray(rng.rand(b, q, m, lvls, p, 2), jnp.float32)
    wgt = jax.nn.softmax(jnp.asarray(
        rng.randn(b, q, m, lvls * p), dtype), -1).reshape(
        b, q, m, lvls, p)

    shapes = tuple(v_shapes)
    fwd = jax.jit(lambda v, l, w: ms_deform_attn(v, shapes, l, w))

    def loss(v, l, w):
        return (ms_deform_attn(v, shapes, l, w).astype(jnp.float32)
                ** 2).sum()

    grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

    n = int(os.environ.get("ATTN_ITERS", "5"))

    out = fwd(value, loc, wgt)
    float(out.sum())                       # host sync (tunnel-safe)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fwd(value, loc, wgt)
    float(out.sum())
    tf = (time.perf_counter() - t0) / n

    g = grad(value, loc, wgt)
    float(g[0].sum())
    t0 = time.perf_counter()
    for _ in range(n):
        g = grad(value, loc, wgt)
    float(g[0].sum())
    tb = (time.perf_counter() - t0) / n

    prof_dir = os.environ.get("ATTN_PROFILE")
    if prof_dir:
        prof_dir = os.path.join(prof_dir, name.split()[0].lower())
        with jax.profiler.trace(prof_dir):
            g = grad(value, loc, wgt)
            float(g[0].sum())
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from profile_step import collect_hlo_stats, summarize
        summarize(collect_hlo_stats(prof_dir), top_n=12)

    rows = b * q * m * p * lvls
    print(f"{name}: fwd {tf * 1e3:8.2f} ms   fwd+bwd {tb * 1e3:8.2f} ms"
          f"   ({rows / 1e6:.2f}M samples, {rows / tf / 1e6:.0f}M/s fwd)",
          flush=True)


def main():
    import jax
    import jax.numpy as jnp
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    dt = jnp.bfloat16 if os.environ.get(
        "ATTN_DTYPE", "bf16") == "bf16" else jnp.float32
    if which in ("tsa", "both"):
        # TSA: value = [2 queue slots stacked into batch, 40000, 8, 32]
        bench_case("TSA  (B=2, 200x200 BEV, P=4)", 2,
                   [(200, 200)], 40000, 8, 32, 4, dt)
    if which in ("sca", "both"):
        # SCA: all 6 cameras batched (attention.py folds cams into
        # batch), K=20000 queries each, 4-level 928x1600 pyramid
        bench_case("SCA  (6cam, K=20000, P=8)   ", 6,
                   [(116, 200), (58, 100), (29, 50), (15, 25)],
                   20000, 8, 32, 8, dt)


if __name__ == "__main__":
    main()
