"""Pallas TPU kernel: sequential row scatter-add with a VMEM-resident
accumulator.

XLA's scatter-add tops out at ~55-65M update-rows/s on v5e regardless
of accumulator placement (tools/analysis_tools/bench_attn_vmem.py); a
Pallas read-modify-write loop over the update rows with the WHOLE
accumulator pinned in VMEM was measured at ~108M rows/s at the
deformable-attention dvalue shape ([*, 128] fp32 rows into a ~12 MB
accumulator) — tools/analysis_tools/bench_pallas_gather.py.  The
deformable-attention backward (ops/ms_deform_attn.py) feeds one
(batch*head, level) group at a time, whose supercell accumulators are
0.8-12 MB — exactly VMEM-sized.

The kernel is grid-sequential over row chunks and row-sequential inside
a chunk, so accumulation order is DETERMINISTIC (ascending row index) —
stronger than the reference CUDA atomics (nondeterministic float
accumulation order, mmcv ms_deform_attn_backward).
"""
from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows per grid step; VMEM cost is acc + 2 x (_CHUNK, W) update blocks.
_CHUNK = int(_os.environ.get("DISTILLBEV_SCATTER_CHUNK", 2048))


def _kernel(ids_ref, upd_ref, acc_ref, *, chunk, unroll):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(j, _):
        for u in range(unroll):
            r = ids_ref[0, j * unroll + u]
            acc_ref[pl.ds(r, 1), :] = (acc_ref[pl.ds(r, 1), :] +
                                       upd_ref[pl.ds(j * unroll + u, 1),
                                               :])
        return 0

    jax.lax.fori_loop(0, chunk // unroll, body, 0)


def _kernel_batched(ids_ref, upd_ref, acc_ref, *, chunk, unroll):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(j, _):
        for u in range(unroll):
            jj = j * unroll + u
            r = ids_ref[0, jj]
            acc_ref[0, pl.ds(r, 1), :] = (
                acc_ref[0, pl.ds(r, 1), :] +
                upd_ref[0, pl.ds(jj, 1), :])
        return 0

    jax.lax.fori_loop(0, chunk // unroll, body, 0)


def scatter_add_rows_batched(ids: jnp.ndarray, upd: jnp.ndarray,
                             size: int, *,
                             interpret: bool | None = None,
                             unroll: int = 8) -> jnp.ndarray:
    """Per-sample row scatter-add: ``out[b, ids[b, r]] += upd[b, r]``.

    Args:
        ids: [B, R] int32 row ids in [0, size); rows pointed past
            ``size`` (the 8 trash rows) are discarded.
        upd: [B, R, W] update rows (fp32 — bf16 dynamic-row reads trip
            this toolchain's Mosaic, see docs/PERF.md r3 pitfalls; cast
            outside).
        size: accumulator rows PER SAMPLE.

    Returns [B, size, W] of upd.dtype.  Grid is (B, row-chunks) with
    the per-sample accumulator pinned in VMEM across its row chunks —
    the LSS bev_pool caller's per-sample canvas (16k x 64 fp32 = 4 MB)
    is exactly VMEM-sized, which replaces its sort + [N, C] sorted-row
    gather + segmented scan + end-read with ONE deterministic row walk.
    """
    b, r, w = upd.shape
    chunk = _CHUNK
    nc = max(1, -(-r // chunk))
    pad = nc * chunk - r
    ids_p = jnp.pad(ids, ((0, 0), (0, pad)), constant_values=size)
    # SMEM blocks require dim0 == array dim0: flatten the batch into
    # the chunk axis and index (bb, c) -> chunk bb*nc + c
    ids_p = ids_p.reshape(1, b * nc * chunk)
    if pad:
        upd = jnp.pad(upd, ((0, 0), (0, pad), (0, 0)))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_kernel_batched, chunk=chunk, unroll=unroll),
        grid=(b, nc),
        in_specs=[
            pl.BlockSpec((1, chunk), lambda bb, c, nc=nc: (0, bb * nc + c),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, chunk, w), lambda bb, c: (bb, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, size + 8, w), lambda bb, c: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, size + 8, w), upd.dtype),
        interpret=interpret,
    )(ids_p, upd)
    return out[:, :size]


def _kernel_expand(ids_ref, w_ref, g_ref, acc_ref, upd_ref, *,
                   qch, lbp, unroll):
    cc = pl.program_id(0)

    @pl.when(cc == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # corner-spread selector: SEL[k, lane] = (lane // C == k) for the
    # 4 corners over the 4C=128 lanes — built from 2-D iota (free)
    lane = jax.lax.broadcasted_iota(jnp.int32, (4, 128), 1)
    corner = jax.lax.broadcasted_iota(jnp.int32, (4, 128), 0)
    sel = (lane // 32 == corner).astype(jnp.float32)
    g = g_ref[:]                              # [qch, 4C]
    w = w_ref[:]                              # [qch, lbp*4]
    # expansion phase: one [qch, 4] @ [4, 128] MXU matmul per sample
    # slot puts each corner weight on its C-lane block, then the
    # elementwise product with the per-query g rows writes the update
    # block in s-major row order (rows s*qch + i)
    for s in range(lbp):
        wexp = jax.lax.dot(w[:, 4 * s:4 * s + 4], sel,
                           preferred_element_type=jnp.float32)
        upd_ref[s * qch:(s + 1) * qch, :] = wexp * g

    def body(j, _):
        for u in range(unroll):
            jj = j * unroll + u
            r = ids_ref[0, jj]
            acc_ref[pl.ds(r, 1), :] = (acc_ref[pl.ds(r, 1), :] +
                                       upd_ref[pl.ds(jj, 1), :])
        return 0

    jax.lax.fori_loop(0, (lbp * qch) // unroll, body, 0)


def scatter_add_rows_expand(ids_sq: jnp.ndarray, w: jnp.ndarray,
                            g: jnp.ndarray, size: int, *,
                            interpret: bool | None = None,
                            unroll: int = 8) -> jnp.ndarray:
    """Weighted-outer-product row scatter-add with IN-KERNEL update
    expansion: ``out[ids_sq[s, q]] += concat_k(w[q, 4*s+k] * g[q])``.

    The deformable-attention backward's dvalue updates are rank-1 per
    sample — (4 corner weights) x (the query's C-wide dout row tiled
    onto the 4 corner lane blocks).  Materializing them in XLA cost
    ~340 ms/step of broadcast writes plus a [R, 4C] fp32 HBM round
    trip (round-5 profile); here the kernel reads the COMPACT factors
    (w: 16 B/row, g: 512 B/query amortized over lbp samples — ~32x
    less traffic) and expands each query-chunk's update block in VMEM
    with one tiny MXU matmul per sample slot before the same
    deterministic row walk as :func:`scatter_add_rows`.

    Args:
        ids_sq: [lbp, Q] int32 SAMPLE-MAJOR row ids (>= size = drop).
        w: [Q, lbp*4] float32 corner weights, lane (s, k) for sample
            slot s (level-in-bucket major, then point), corner k
            (y-major 2x2 window order).
        g: [Q, 4C] float32 per-query dout rows pre-tiled to the 4
            corner blocks (4C must be 128).
        size: accumulator rows.

    Returns [size, 4C] float32; deterministic accumulation order.
    """
    lbp, q = ids_sq.shape
    w4c = g.shape[1]
    assert w.shape == (q, lbp * 4)
    # rows per grid step ~ _CHUNK, qch a sublane multiple
    qch = max(8, (_CHUNK // max(lbp, 1)) // 8 * 8)
    nc = max(1, -(-q // qch))
    pad = nc * qch - q
    if pad:
        w = jnp.pad(w, ((0, pad), (0, 0)))
        g = jnp.pad(g, ((0, pad), (0, 0)))
        ids_sq = jnp.pad(ids_sq, ((0, 0), (0, pad)),
                         constant_values=size)
    # chunk-blocked s-major flat ids: [nc, lbp, qch] -> [1, R]
    ids_p = ids_sq.reshape(lbp, nc, qch).transpose(1, 0, 2).reshape(
        1, nc * lbp * qch)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_kernel_expand, qch=qch, lbp=lbp,
                          unroll=unroll),
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((1, lbp * qch), lambda cc: (0, cc),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((qch, lbp * 4), lambda cc: (cc, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qch, w4c), lambda cc: (cc, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((size + 8, w4c), lambda cc: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((size + 8, w4c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((lbp * qch, w4c), jnp.float32)],
        interpret=interpret,
    )(ids_p, w, g)
    return out[:size]


def scatter_add_rows(ids: jnp.ndarray, upd: jnp.ndarray, size: int,
                     *, interpret: bool | None = None,
                     unroll: int = 8) -> jnp.ndarray:
    # unroll=8 measured 166M vs 157M rows/s at 4 (round-4 variant sweep,
    # /tmp-style microbench over S in {1.6k, 6k, 23.6k}); K-way split
    # accumulators measured WORSE (105-119M) — the RMW chain is not
    # aliasing-serialized, so extra index math + the final adds only hurt
    """out[ids[r]] += upd[r] with out zero-initialized.

    Args:
        ids: [R] int32 row ids in [0, size).
        upd: [R, W] update rows.
        size: number of accumulator rows.

    Returns [size, W] of upd.dtype.  Deterministic accumulation order.
    """
    r, w = upd.shape
    chunk = _CHUNK
    nc = max(1, -(-r // chunk))
    # the ragged tail runs WITHOUT a per-row bounds guard (measured
    # ~2x row-rate cost): ids and upd are padded to a whole chunk, the
    # pad ids point at trash rows past `size`, sliced off at the end.
    pad = nc * chunk - r
    ids_p = jnp.pad(ids, (0, pad), constant_values=size).reshape(
        1, nc * chunk)
    if pad:
        upd = jnp.pad(upd, ((0, pad), (0, 0)))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = pl.pallas_call(
        functools.partial(_kernel, chunk=chunk, unroll=unroll),
        grid=(nc,),
        in_specs=[
            pl.BlockSpec((1, chunk), lambda c: (0, c),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk, w), lambda c: (c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((size + 8, w), lambda c: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((size + 8, w), upd.dtype),
        interpret=interpret,
    )(ids_p, upd)
    return out[:size]
