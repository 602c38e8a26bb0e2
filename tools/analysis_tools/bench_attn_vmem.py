"""Probe: does per-(batch*head) table looping unlock VMEM-rate takes?

docs/PERF.md: XLA's flat row take runs at ~236M rows/s when the table
is small (~6 MB -> VMEM-resident) but ~45-50M rows/s at the real
TSA/SCA table sizes (165-380 MB, HBM random-row latency bound).  The
real tables factor into BM = batch*heads groups of ~6-10 MB each and
every sample's row id stays inside its own group, so restructuring the
take as a loop over BM with a dynamic-sliced per-group table could run
each group's take out of VMEM.

Variants at SCA-like shape (BM=48 groups x 23634 cells x 128 lanes
bf16 = 290 MB total, N total sample rows, ids uniform per group):

  big_take       one [BM*cells, 128] table, global ids   (current)
  scan_bm        lax.scan over BM, per-group dynamic-sliced table
  unroll_bm      python loop over BM (static slices)
  scan_bm_comb   scan_bm + corner-weight combine to [*, 32] fp32
  big_comb       big take + combine                      (current)

Usage: python tools/analysis_tools/bench_attn_vmem.py [N] [BM] [CELLS]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=5):
    out = jax.tree.leaves(fn(*args))[0]
    float(jnp.asarray(out).astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.tree.leaves(fn(*args))[0]
    float(jnp.asarray(out).astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / iters


def combine(rows, w4):
    # rows [R, 128] bf16, w4 [R, 4] bf16 -> [R, 32] fp32
    r = rows.reshape(-1, 4, 32)
    return jnp.sum(r * w4[..., None], axis=1, dtype=jnp.float32)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 22
    bm = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    cells = int(sys.argv[3]) if len(sys.argv) > 3 else 23634
    nbm = n // bm
    n = nbm * bm
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(bm, cells, 128), jnp.bfloat16)
    ids = jnp.asarray(rng.randint(0, cells, (bm, nbm)), jnp.int32)
    w4 = jnp.asarray(rng.rand(bm, nbm, 4), jnp.bfloat16)
    mb = bm * cells * 128 * 2 / 1e6
    print(f"N={n} BM={bm} cells={cells} table={mb:.0f}MB "
          f"({mb/bm:.1f}MB/group)")

    flat_tab = table.reshape(bm * cells, 128)
    gids = (ids + jnp.arange(bm, dtype=jnp.int32)[:, None] * cells
            ).reshape(-1)

    def big_take(tab, gi):
        return tab.at[gi].get(mode="promise_in_bounds")

    t = timeit(jax.jit(big_take), flat_tab, gids)
    print(f"big_take    : {t*1e3:8.2f} ms  {n/t/1e6:7.1f}M rows/s")

    def scan_bm(tab, ids_bm):
        def step(_, x):
            tab_g, ig = x
            return None, tab_g.at[ig].get(mode="promise_in_bounds")
        _, out = jax.lax.scan(step, None, (tab, ids_bm))
        return out

    t = timeit(jax.jit(scan_bm), table, ids)
    print(f"scan_bm     : {t*1e3:8.2f} ms  {n/t/1e6:7.1f}M rows/s")

    def unroll_bm(tab, ids_bm):
        outs = [tab[g].at[ids_bm[g]].get(mode="promise_in_bounds")
                for g in range(tab.shape[0])]
        return jnp.stack(outs)

    t = timeit(jax.jit(unroll_bm), table, ids)
    print(f"unroll_bm   : {t*1e3:8.2f} ms  {n/t/1e6:7.1f}M rows/s")

    def big_comb(tab, gi, w):
        return combine(big_take(tab, gi), w.reshape(-1, 4))

    t = timeit(jax.jit(big_comb), flat_tab, gids, w4)
    print(f"big_comb    : {t*1e3:8.2f} ms  {n/t/1e6:7.1f}M rows/s")

    def scan_bm_comb(tab, ids_bm, w):
        def step(_, x):
            tab_g, ig, wg = x
            rows = tab_g.at[ig].get(mode="promise_in_bounds")
            return None, combine(rows, wg)
        _, out = jax.lax.scan(step, None, (tab, ids_bm, w))
        return out

    t = timeit(jax.jit(scan_bm_comb), table, ids, w4)
    print(f"scan_bm_comb: {t*1e3:8.2f} ms  {n/t/1e6:7.1f}M rows/s")

    # scatter-add side (the dvalue walk): per-group accumulators
    rows_in = jnp.asarray(rng.randn(bm, nbm, 128), jnp.float32)

    def big_scatter(r, gi):
        return jnp.zeros((bm * cells, 128), jnp.float32).at[gi].add(
            r.reshape(-1, 128), mode="promise_in_bounds")

    t = timeit(jax.jit(big_scatter), rows_in, gids)
    print(f"big_scatter : {t*1e3:8.2f} ms  {n/t/1e6:7.1f}M rows/s")

    def scan_bm_scatter(r, ids_bm):
        def step(_, x):
            rg, ig = x
            acc = jnp.zeros((cells, 128), jnp.float32)
            return None, acc.at[ig].add(rg, mode="promise_in_bounds")
        _, out = jax.lax.scan(step, None, (r, ids_bm))
        return out

    t = timeit(jax.jit(scan_bm_scatter), rows_in, ids)
    print(f"scan_scatter: {t*1e3:8.2f} ms  {n/t/1e6:7.1f}M rows/s")


if __name__ == "__main__":
    main()
