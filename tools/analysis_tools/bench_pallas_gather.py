"""Microbench: can a Pallas kernel beat XLA's gather row rate?

The deformable-attention sampling core is gather-ROW-RATE bound on v5e
(docs/PERF.md: ~60M rows/s through XLA's gather at [*, 128] bf16).  A
Pallas kernel holding the whole level table in VMEM and walking samples
with per-row dynamic-slice copies is the candidate replacement; this
bench measures its achievable rows/s against the XLA gather at the
flagship SCA level-0 shape (table [23634, 128] = the 4x-duplicated
(116,200) superrow grid of one (batch, head), 128 = 4C at C=32).

Variants:
  xla        jnp.take rows from the same table
  pallas     fori_loop of (1,128) VMEM->VMEM copies, idx in SMEM
  pallas_u8  8x-unrolled loop body
  pallas_rmw scatter-accumulate acc[idx] += row (the dvalue side)

Usage: python tools/analysis_tools/bench_pallas_gather.py [N] [S]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 1024


def _gather_kernel(idx_ref, table_ref, out_ref, *, unroll):
    def body(j, _):
        for u in range(unroll):
            r = j * unroll + u
            out_ref[pl.ds(r, 1), :] = table_ref[pl.ds(idx_ref[0, r], 1), :]
        return 0
    jax.lax.fori_loop(0, CHUNK // unroll, body, 0)


def pallas_gather(table, idx, unroll=1):
    n = idx.shape[0]
    assert n % CHUNK == 0
    kern = functools.partial(_gather_kernel, unroll=unroll)
    return pl.pallas_call(
        kern,
        grid=(n // CHUNK,),
        in_specs=[
            pl.BlockSpec((1, CHUNK), lambda i: (0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(table.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CHUNK, table.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, table.shape[1]), table.dtype),
    )(idx.reshape(1, n), table)


def _rmw_kernel(idx_ref, rows_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(j, _):
        r = idx_ref[0, j]
        acc_ref[pl.ds(r, 1), :] = acc_ref[pl.ds(r, 1), :] + \
            rows_ref[pl.ds(j, 1), :]
        return 0
    jax.lax.fori_loop(0, CHUNK, body, 0)


def pallas_rmw(rows, idx, s):
    n = idx.shape[0]
    return pl.pallas_call(
        _rmw_kernel,
        grid=(n // CHUNK,),
        in_specs=[
            pl.BlockSpec((1, CHUNK), lambda i: (0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((CHUNK, rows.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((s, rows.shape[1]), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, rows.shape[1]), jnp.float32),
    )(idx.reshape(1, n), rows)


def timeit(fn, *args, iters=5):
    out = fn(*args)
    float(jnp.asarray(out).astype(jnp.float32).sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.asarray(out).astype(jnp.float32).sum())
    return (time.perf_counter() - t0) / iters


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 22
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 23634
    rng = np.random.RandomState(0)
    table = jnp.asarray(rng.randn(s, 128), jnp.bfloat16)
    idx = jnp.asarray(rng.randint(0, s, n), jnp.int32)
    rows = jnp.asarray(rng.randn(n, 128), jnp.float32)

    t = timeit(jax.jit(lambda tb, ix: jnp.take(tb, ix, axis=0)),
               table, idx)
    print(f"xla gather      : {t*1e3:8.2f} ms  {n/t/1e6:7.1f}M rows/s")

    for unroll, name in ((1, "pallas"), (8, "pallas_u8")):
        try:
            t = timeit(jax.jit(functools.partial(
                pallas_gather, unroll=unroll)), table, idx)
            print(f"{name:16s}: {t*1e3:8.2f} ms  {n/t/1e6:7.1f}M rows/s")
        except Exception as e:
            print(f"{name:16s}: FAILED {type(e).__name__}: {e}")

    sacc = min(s, 23634)
    t = timeit(jax.jit(lambda tb, ix: jnp.zeros(
        (sacc, 128), jnp.float32).at[ix].add(tb)), rows, idx)
    print(f"xla scatter-add : {t*1e3:8.2f} ms  {n/t/1e6:7.1f}M rows/s")

    try:
        t = timeit(jax.jit(functools.partial(pallas_rmw, s=sacc)),
                   rows, idx)
        print(f"pallas_rmw      : {t*1e3:8.2f} ms  {n/t/1e6:7.1f}M rows/s")
    except Exception as e:
        print(f"pallas_rmw      : FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
