"""Multi-scale deformable attention sampling core.

Capability parity with the mmcv CUDA extension the reference loads
(reference: mmdet3d/models/transformer_modules/
multi_scale_deformable_attn_function.py:1-162 — `_ext.ms_deform_attn_forward`
/ `backward`, used by BEVFormer's spatial cross-attention, temporal
self-attention and the DETR decoders).

TPU-native design.  XLA:TPU's row take is ROW-RATE bound and its rate
depends on where the table lives: ~70-90M rows/s when the table is a
big HBM array (random-row latency bound) but 220-340M rows/s when the
table fits VMEM (~6-10 MB — tools/analysis_tools/bench_attn_vmem.py,
v5e).  The real tables factor exactly into such groups: every sample's
row stays inside its own (batch, head) slice, which is 6-10 MB at
BEVFormer shapes.  The kernel is therefore a ``lax.scan`` over the
B*M groups; each step takes rows from ITS OWN per-group table, which
XLA keeps on-chip:

* The value grids are expanded into a SUPERCELL table: each cell
  (y0, x0) of the zero-bordered grid stores its full 2x2 bilinear
  window as one contiguous 4C-wide row ``[v(y0,x0), v(y0,x0+1),
  v(y0+1,x0), v(y0+1,x0+1)]`` (128 lanes exactly at the BEVFormer head
  dim C=32), with levels concatenated per group, so sampling every
  level of a (batch, head) group is one flat `take` — one row per
  sample point.
* The lerp + attention-weight combine and the L/P reductions happen
  inside the scan step, so the only HBM traffic per group is ids +
  weights in and [Q, C] out — the [rows, 4C] window array never
  round-trips (measured: take+combine in the scan step is FASTER than
  the bare take, 248 vs 192M rows/s, because the write side shrinks).
* The hand-written backward (custom VJP, recompute-in-bwd like the
  reference CUDA op) re-takes the same rows per group for the
  dloc/dwgt corner dot products, and scatter-adds dvalue as ONE
  4C-wide row per sample into that group's supercell accumulator
  (fp32), with a four-phase fold back to the plain grid at the end.
  Scatter-add stays ~55-65M rows/s wherever the accumulator lives —
  per-group accumulators are used because they keep the scan
  self-contained, not because they are faster.

The zero border implements the reference kernel's
out-of-range-corners-are-zero semantics without per-corner masks; fully
out-of-window samples are masked in the (tiny) lerp weights.

SMALL levels can instead take a dense separable-lerp matmul path:
bilinear lerp weights are separable (w = wy(y) * wx(x), each factor
2-sparse, and the out-of-range mask factorizes per axis), so sampling a
level is ONE MXU matmul ``lhs[q, cells] @ grid[cells, C]`` per group,
where ``lhs`` sums the P weighted outer products per query row, and the
backward's dvalue is ``lhs^T @ dout`` — no scatter.  Levels with at
most _DENSE_MAX_CELLS padded cells take it.
"""
from __future__ import annotations

import os as _os
import sys as _sys
from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name as _checkpoint_name

from .pallas_scatter import scatter_add_rows, scatter_add_rows_expand

# levels whose zero-bordered grid has at most this many cells take the
# dense separable-lerp matmul path instead of the per-group take.
_DENSE_MAX_CELLS = int(_os.environ.get(
    "DISTILLBEV_ATTN_DENSE_MAX_CELLS", 512))

# use the Pallas VMEM-accumulator RMW kernel for the backward's dvalue
# scatter (TPU only; measured ~1.2x XLA's scatter-add row rate)
_PALLAS_SCATTER = _os.environ.get(
    "DISTILLBEV_ATTN_PALLAS_SCATTER", "1") == "1"

# cap on take rows processed per scan step: peak per-step temps are
# [rows_bm, 4C] where rows_bm = Q * L * P for one (batch, head) group.
# Chunking is a PERF knob, not just a memory guard: [chunk, 4C] temps
# small enough to live on-chip let the take/combine/scatter pipeline
# instead of round-tripping HBM.  Round-4 sweep at the full SCA shape
# (K=20k, 4 levels, P=8): fwd is fastest at ~160-190k-row chunks
# (125 -> 105 ms) and the backward at ~128k (446 -> 363 ms), while
# the TSA shape (160k rows) is fastest UNchunked — hence separate
# fwd/bwd defaults sitting just above the TSA row count.
# Override with DISTILLBEV_ATTN_MAX_GATHER_ROWS[_BWD].
_MAX_GATHER_ROWS = int(_os.environ.get(
    "DISTILLBEV_ATTN_MAX_GATHER_ROWS", 196608))
_MAX_GATHER_ROWS_BWD = int(_os.environ.get(
    "DISTILLBEV_ATTN_MAX_GATHER_ROWS_BWD", 131072))


def _max_rows():
    # read through the module object so tests can monkeypatch the
    # module attribute and have call sites observe it
    return _sys.modules[__name__]._MAX_GATHER_ROWS


def _max_rows_bwd():
    return _sys.modules[__name__]._MAX_GATHER_ROWS_BWD


def _is_dense(h: int, w: int) -> bool:
    return (h + 2) * (w + 2) <= _DENSE_MAX_CELLS


# ---------------------------------------------------------------------------
# layouts


def _pad_level_grid_plain(value: jnp.ndarray, h: int,
                          w: int) -> jnp.ndarray:
    """[B, h*w, M, C] one level -> [B, M, h+2, w+2, C] zero-bordered
    padded grid."""
    bsz, hw, m, c = value.shape
    v = value.reshape(bsz, h, w, m, c).transpose(0, 3, 1, 2, 4)
    return jnp.pad(v, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))


def _supercell_level(value: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """[B, h*w, M, C] one level -> [B, M, (h+1)*(w+1), 4C] supercell
    table: row (y0, x0) = the 2x2 window [v00, v01, v10, v11] of the
    zero-bordered grid (corner order y-major: v01 = v(y0, x0+1))."""
    bsz, _, m, c = value.shape
    pv = _pad_level_grid_plain(value, h, w)
    sc = jnp.stack([pv[:, :, :-1, :-1], pv[:, :, :-1, 1:],
                    pv[:, :, 1:, :-1], pv[:, :, 1:, 1:]], axis=-2)
    return sc.reshape(bsz, m, (h + 1) * (w + 1), 4 * c)


def _level_split(value: jnp.ndarray, spatial_shapes):
    out, offset = [], 0
    for h, w in spatial_shapes:
        out.append(jax.lax.dynamic_slice_in_dim(
            value, offset, h * w, axis=1))
        offset += h * w
    return out


def _build_table(value: jnp.ndarray, spatial_shapes, levels):
    """Concatenate the supercell tables of ``levels`` into one
    [B*M, cells_bm, 4C] per-group table; returns (table,
    bases [len(levels)], cells_bm)."""
    per_level = _level_split(value, spatial_shapes)
    tabs, bases, cells = [], [], 0
    for i in levels:
        h, w = spatial_shapes[i]
        tabs.append(_supercell_level(per_level[i], h, w))
        bases.append(cells)
        cells += (h + 1) * (w + 1)
    bsz, m = value.shape[0], value.shape[2]
    table = jnp.concatenate(tabs, axis=2).reshape(
        bsz * m, cells, 4 * value.shape[3])
    return table, bases, cells


def _transpose_bm(a: jnp.ndarray) -> jnp.ndarray:
    """[B, Q, M, ...] -> [B*M, Q, ...] (b-major, matching
    _build_table's group order)."""
    a = jnp.moveaxis(a, 2, 1)
    return a.reshape((a.shape[0] * a.shape[1],) + a.shape[2:])


def _untranspose_bm(a: jnp.ndarray, bsz: int, m: int) -> jnp.ndarray:
    """[B*M, Q, ...] -> [B, Q, M, ...]."""
    a = a.reshape((bsz, m) + a.shape[1:])
    return jnp.moveaxis(a, 1, 2)


# ---------------------------------------------------------------------------
# window coordinates (leading dims generic; level axis at -2 of coords)


def _window_coords_multi(loc: jnp.ndarray, hs, ws, dt):
    """loc [..., L, P, 2] normalized (x, y); hs/ws python lists of
    per-level sizes.  Returns int32 window origins y0i/x0i in PADDED
    grid coords [..., L, P], corner lerp weights w4 [..., L, P, 4]
    (y-major corner order, fully-out samples zeroed) in dtype ``dt``,
    and (lx, ly, ok) fp32 residuals."""
    hv = jnp.asarray(hs, jnp.float32).reshape(-1, 1)
    wv = jnp.asarray(ws, jnp.float32).reshape(-1, 1)
    x = loc[..., 0] * wv - 0.5
    y = loc[..., 1] * hv - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0
    ok = ((x0 >= -1) & (x0 <= wv - 1) & (y0 >= -1) & (y0 <= hv - 1))
    x0i = jnp.clip(x0, -1, wv - 1).astype(jnp.int32) + 1
    y0i = jnp.clip(y0, -1, hv - 1).astype(jnp.int32) + 1
    lxd = lx.astype(dt)
    lyd = ly.astype(dt)
    zero = jnp.zeros_like(lxd)
    w4 = jnp.stack([
        jnp.where(ok, (1 - lxd) * (1 - lyd), zero),
        jnp.where(ok, lxd * (1 - lyd), zero),
        jnp.where(ok, (1 - lxd) * lyd, zero),
        jnp.where(ok, lxd * lyd, zero)], axis=-1)
    return y0i, x0i, w4, (lx, ly, ok)


def _local_ids(y0i, x0i, strides, bases):
    """[..., L, P] window origins -> per-group flat supercell row ids
    (level bases applied; NO group offset — each scan step indexes its
    own table)."""
    sv = jnp.asarray(strides, jnp.int32).reshape(-1, 1)
    bv = jnp.asarray(bases, jnp.int32).reshape(-1, 1)
    return bv + y0i * sv + x0i


# ---------------------------------------------------------------------------
# dense separable-lerp matmul path (small levels)


def _axis_coords(t: jnp.ndarray, n: int):
    t0 = jnp.floor(t)
    l = t - t0
    ok = (t0 >= -1) & (t0 <= n - 1)
    t0i = jnp.clip(t0, -1, n - 1).astype(jnp.int32) + 1
    return t0i, l, ok


def _dense_lhs(loc: jnp.ndarray, wgt: jnp.ndarray, h: int, w: int, dt):
    """loc [..., P, 2], wgt [..., P] -> [..., (h+2)*(w+2)] folded lerp
    matrix: one row per query summing the P weighted outer products
    wy x wx (attention weights folded in).  Built as broadcast mul +
    sum over P — an einsum here lowers to batched tiny matmuls
    (docs/PERF.md pitfall)."""
    x0i, lx, okx = _axis_coords(loc[..., 0] * w - 0.5, w)
    y0i, ly, oky = _axis_coords(loc[..., 1] * h - 0.5, h)
    lx = lx.astype(dt)
    ly = ly.astype(dt)
    zx, zy = jnp.zeros_like(lx), jnp.zeros_like(ly)
    ix = jnp.arange(w + 2, dtype=jnp.int32)
    iy = jnp.arange(h + 2, dtype=jnp.int32)
    wx = (jnp.where(ix == x0i[..., None],
                    jnp.where(okx, 1 - lx, zx)[..., None], 0) +
          jnp.where(ix == x0i[..., None] + 1,
                    jnp.where(okx, lx, zx)[..., None], 0))
    wy = (jnp.where(iy == y0i[..., None],
                    jnp.where(oky, 1 - ly, zy)[..., None], 0) +
          jnp.where(iy == y0i[..., None] + 1,
                    jnp.where(oky, ly, zy)[..., None], 0))
    wy = wy * wgt.astype(dt)[..., None]
    lhs = jnp.sum(wy[..., :, None] * wx[..., None, :], axis=-3)
    return lhs.reshape(lhs.shape[:-2] + (-1,))


# ---------------------------------------------------------------------------
# forward


def _level_groups(spatial_shapes):
    dense = [i for i, (h, w) in enumerate(spatial_shapes)
             if _is_dense(h, w)]
    gather = [i for i, (h, w) in enumerate(spatial_shapes)
              if not _is_dense(h, w)]
    return gather, dense


def _chunk_q(arrs, q, n_chunks):
    """Pad + reshape [Q, ...] arrays to chunk-major [nc, qc, ...]."""
    qc = -(-q // n_chunks)
    pad = n_chunks * qc - q
    out = []
    for a in arrs:
        a = jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
        out.append(a.reshape((n_chunks, qc) + a.shape[1:]))
    return out, qc


def _attn_chunked(value, spatial_shapes, loc, weight):
    """[B, Q, M, C] output; a lax.scan over the B*M groups, each step
    sampling from its own (VMEM-sized) table, with an inner query
    chunking only when a group's row count exceeds _MAX_GATHER_ROWS."""
    bsz, _, m, c = value.shape
    q, num_levels, p = loc.shape[1], loc.shape[3], loc.shape[4]
    dt = value.dtype
    bm = bsz * m
    gather_lvls, dense_lvls = _level_groups(spatial_shapes)

    xs = {"loc": _transpose_bm(loc), "wgt": _transpose_bm(weight)}
    if gather_lvls:
        table, gbases, _ = _build_table(value, spatial_shapes,
                                        gather_lvls)
        xs["tab"] = table
        hs_g = [spatial_shapes[i][0] for i in gather_lvls]
        ws_g = [spatial_shapes[i][1] for i in gather_lvls]
        strides_g = [w + 1 for w in ws_g]
    per_level = _level_split(value, spatial_shapes) if dense_lvls \
        else []
    for i in dense_lvls:
        h, w = spatial_shapes[i]
        xs[f"pg{i}"] = _pad_level_grid_plain(
            per_level[i], h, w).reshape(bm, (h + 2) * (w + 2), c)

    rows_bm = q * max(1, len(gather_lvls)) * p
    n_chunks = max(1, -(-rows_bm // _max_rows()))

    def chunk_fn(tab_g, pgs, locc, wgtc):
        qc = locc.shape[0]
        out = jnp.zeros((qc, c), jnp.float32)
        if gather_lvls:
            lg = locc[:, gather_lvls]
            wg = wgtc[:, gather_lvls]
            y0i, x0i, w4, _ = _window_coords_multi(lg, hs_g, ws_g, dt)
            ids = _local_ids(y0i, x0i, strides_g, gbases)
            wf = w4 * wg.astype(dt)[..., None]     # [qc, Lg, P, 4]
            # LANE-PRESERVING combine: the old
            # ``rows.reshape(qc, -1, c)`` split the 128-lane 4C rows
            # into (4, C) — a physical relayout copy that cost more
            # than the take itself at full size (457 ms/step,
            # reshape.21912 in the round-4 profile).  Instead the
            # corner weights broadcast ONTO the lanes, the sample axis
            # reduces in 4C-lane space, and only the tiny [qc, 4C]
            # accumulator pays a lane-crossing fold.
            # SAMPLE-MAJOR order (round 5): the take uses 2-D indices
            # [lp, qc] so (a) the weighted sum reduces the MAJOR axis,
            # which XLA accumulates without the physical {0,2,1}
            # relayout of the [qc, lp, 4C] window rows it emitted for
            # the middle-axis reduce (copy.13155, 119 ms/step, round-5
            # profile), and (b) no [R, 1] index vector is materialized
            # in the one-scalar-per-row T(1,128) layout
            # (reshape.23067-74, ~190 ms/step of the same profile).
            lp = ids.size // qc                    # Lg * P samples/query
            ids_t = ids.reshape(qc, lp).T          # [lp, qc]
            rows = tab_g.at[ids_t].get(
                mode="promise_in_bounds")          # [lp, qc, 4C]
            wf_t = jnp.moveaxis(wf.reshape(qc, lp, 4), 1, 0)
            w128 = jnp.broadcast_to(
                wf_t[..., None], (lp, qc, 4, c)).reshape(lp, qc, 4 * c)
            acc = jnp.sum(rows * w128, axis=0,
                          dtype=jnp.float32)       # [qc, 4C]
            out = out + acc.reshape(qc, 4, c).sum(axis=1)
        for pg, lvl in zip(pgs, dense_lvls):
            h, w = spatial_shapes[lvl]
            lhs = _dense_lhs(locc[:, lvl], wgtc[:, lvl], h, w, dt)
            out = out + jnp.dot(lhs, pg,
                                preferred_element_type=jnp.float32)
        return out

    def step(_, x):
        tab_g = x.get("tab")
        pgs = [x[f"pg{i}"] for i in dense_lvls]
        if n_chunks == 1:
            out = chunk_fn(tab_g, pgs, x["loc"], x["wgt"])
        else:
            (locs, wgts), qc = _chunk_q([x["loc"], x["wgt"]], q,
                                        n_chunks)
            out = jax.lax.map(
                lambda lw: chunk_fn(tab_g, pgs, lw[0], lw[1]),
                (locs, wgts)).reshape(n_chunks * qc, c)[:q]
        return None, out

    _, out = jax.lax.scan(step, None, xs)            # [BM, Q, C]
    # cast before the untranspose: the [BM, Q, C] -> [B, Q, M, C]
    # relayout is copy-bound, halve its bytes first
    return _untranspose_bm(out.astype(dt), bsz, m)


# ---------------------------------------------------------------------------
# custom VJP: hand-written recompute-in-backward


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _attn_cvjp(value, spatial_shapes, loc, weight):
    return _attn_chunked(value, spatial_shapes, loc, weight)


def _attn_cvjp_fwd(value, spatial_shapes, loc, weight):
    # residuals are just the op inputs — the hand-written backward
    # recomputes every take/lerp, so NO [rows, 4C] temp survives the
    # forward (the reference hand-writes this backward for the same
    # reason, multi_scale_deformable_attn_function.py:1-162)
    return _attn_chunked(value, spatial_shapes, loc, weight), \
        (value, loc, weight)


def _attn_cvjp_bwd(spatial_shapes, res, g):
    value, loc, weight = res
    bsz, hw_total, m, c = value.shape
    q, num_levels, p = loc.shape[1], loc.shape[3], loc.shape[4]
    dt = value.dtype
    bm = bsz * m
    gather_lvls, dense_lvls = _level_groups(spatial_shapes)

    # one supercell table over ALL levels per group: the dloc/dwgt
    # corner dot products need the windows on dense levels too
    all_lvls = list(range(num_levels))
    table, tbases, _ = _build_table(value, spatial_shapes, all_lvls)
    hs = [h for h, _ in spatial_shapes]
    ws = [w for _, w in spatial_shapes]
    tstrides = [w + 1 for w in ws]

    hv = jnp.asarray(hs, jnp.float32).reshape(-1, 1)
    wv = jnp.asarray(ws, jnp.float32).reshape(-1, 1)
    # dvalue scatters run per (group, level): the supercell
    # accumulators are 0.8-12 MB and the Pallas RMW kernel (VMEM
    # accumulator, measured ~1.2x XLA's scatter-add row rate) needs
    # 128-lane-aligned rows
    use_pallas = (_PALLAS_SCATTER and (4 * c) % 128 == 0
                  and jax.default_backend() == "tpu")

    xs = {"tab": table, "loc": _transpose_bm(loc),
          "wgt": _transpose_bm(weight), "g": _transpose_bm(g)}

    rows_bm = q * num_levels * p
    n_chunks = max(1, -(-rows_bm // _max_rows_bwd()))

    def chunk_bwd(tab_g, dvals, locc, wgtc, gc):
        """One query chunk of one group.  Returns (dvals', dloc_c,
        dwgt_c) with dvals the group's per-level supercell
        accumulators."""
        qc = locc.shape[0]
        y0i, x0i, w4, (lx, ly, ok) = _window_coords_multi(
            locc, hs, ws, dt)
        ids = _local_ids(y0i, x0i, tstrides, tbases)  # [qc, L, P]
        lp = num_levels * p
        # SAMPLE-MAJOR 2-D-index take (see chunk_fn): skips the
        # [R, 1] T(1,128) index materializations (reshape.22988-94,
        # ~100 ms/step, round-5 profile)
        ids_t = ids.reshape(qc, lp).T                 # [lp, qc]
        rows = tab_g.at[ids_t].get(
            mode="promise_in_bounds")                 # [lp, qc, 4C]

        # dout contracted with each corner: g[..., k] = <dout, v_k>.
        # Lane-preserving (see chunk_fn): gc tiles onto the 4C lanes,
        # and the per-corner lane-block reduction runs as ONE MXU
        # matmul against a static [4C, 4] corner-selector — the
        # reshape-to-(4, C) formulations all forced multi-ms physical
        # relayouts of the [R, 4C] window rows (reshape.21824 /
        # reshape.22133 in the round-4 profiles).
        g128 = jnp.concatenate([gc.astype(dt)] * 4, axis=-1)  # [qc, 4C]
        # implicit [1, qc, 4C] -> [lp, qc, 4C] broadcast fuses into the
        # multiply; a reshape-of-broadcast materialized a 131 MB
        # operand (broadcast_in_dim.5104, round-4 profile)
        prod = rows * g128[None, :, :]
        sel = jnp.repeat(jnp.eye(4, dtype=dt), c, axis=0)     # [4C, 4]
        gdot = jnp.moveaxis(jnp.dot(
            prod.reshape(-1, 4 * c), sel,
            preferred_element_type=jnp.float32
        ).reshape(lp, qc, 4), 0, 1).reshape(qc, num_levels, p, 4)
        dwgt = jnp.sum(w4.astype(jnp.float32) * gdot, axis=-1)

        g00, g01 = gdot[..., 0], gdot[..., 1]
        g10, g11 = gdot[..., 2], gdot[..., 3]
        okf = ok.astype(jnp.float32)
        wgt_f = wgtc.astype(jnp.float32) * okf
        dx = (-(1 - ly) * g00 + (1 - ly) * g01 - ly * g10 + ly * g11) \
            * wgt_f * wv
        dy = (-(1 - lx) * g00 - lx * g01 + (1 - lx) * g10 + lx * g11) \
            * wgt_f * hv
        dloc = jnp.stack([dx, dy], axis=-1)           # [qc, L, P, 2]

        # dvalue payload: (w_k * wgt) * dout as ONE 4C-wide supercell
        # row per sample.  Both factors reach the lanes as broadcast
        # index maps (the old [qc, P, 4, C] outer product needed a
        # lane-merge copy per level).  Levels are BUCKETED so one
        # scatter kernel covers as many levels as fit a VMEM
        # accumulator — the per-row RMW rate is level-size-independent
        # (~0.67 ms per 128k-row call, round-4 profile), so fewer
        # calls win outright.
        buckets, cur, cur_cells = [], [], 0
        for lvl in gather_lvls:
            h, w = spatial_shapes[lvl]
            cells = (h + 1) * (w + 1)
            if cur and cur_cells + cells > 16384:
                buckets.append(cur)
                cur, cur_cells = [], 0
            cur.append(lvl)
            cur_cells += cells
        if cur:
            buckets.append(cur)

        by_gi = {}
        for bucket in buckets:
            bases_b, base = [], 0
            for lvl in bucket:
                h, w = spatial_shapes[lvl]
                bases_b.append(base)
                base += (h + 1) * (w + 1)
            wqb = w4[:, bucket] * wgtc[:, bucket].astype(dt)[..., None]
            if use_pallas:
                # in-kernel update expansion: the update rows are
                # rank-1 (corner weights x tiled dout row), so only
                # the compact factors travel to the kernel — the XLA
                # formulation materialized [R, 4C] fp32 update rows
                # plus ~180 ms/step of corner-broadcast writes
                # (broadcast.61666-69, round-5 profile)
                w_flat = wqb.astype(jnp.float32).reshape(qc, -1)
                sids_sq = jnp.concatenate(
                    [(bases_b[bi] + y0i[:, lvl]
                      * (spatial_shapes[lvl][1] + 1)
                      + x0i[:, lvl]).T
                     for bi, lvl in enumerate(bucket)],
                    axis=0)                     # [Lb*P, qc] s-major
                acc = scatter_add_rows_expand(
                    sids_sq, w_flat, g128.astype(jnp.float32), base)
            else:
                w128b = jnp.concatenate(
                    [jnp.broadcast_to(wqb[..., k:k + 1],
                                      wqb.shape[:-1] + (c,))
                     for k in range(4)], axis=-1)   # [qc, Lb, P, 4C]
                updb = (w128b * g128[:, None, None, :]).reshape(
                    -1, 4 * c).astype(jnp.float32)
                sids = jnp.stack(
                    [bases_b[bi]
                     + y0i[:, lvl] * (spatial_shapes[lvl][1] + 1)
                     + x0i[:, lvl] for bi, lvl in enumerate(bucket)],
                    axis=1).reshape(-1)         # [qc*Lb*P], updb order
                acc = jnp.zeros((base, 4 * c), jnp.float32).at[
                    sids].add(updb, mode="promise_in_bounds")
            for bi, lvl in enumerate(bucket):
                h, w = spatial_shapes[lvl]
                cells = (h + 1) * (w + 1)
                gi = gather_lvls.index(lvl)
                part = jax.lax.slice_in_dim(
                    acc, bases_b[bi], bases_b[bi] + cells, axis=0)
                by_gi[gi] = part if dvals is None else dvals[gi] + part
        new_dvals = tuple(by_gi[gi] for gi in range(len(gather_lvls)))
        return new_dvals, dloc, dwgt

    def step(_, x):
        tab_g = x["tab"]
        if n_chunks == 1:
            dvals, dloc, dwgt = chunk_bwd(tab_g, None, x["loc"],
                                          x["wgt"], x["g"])
        else:
            (locs, wgts), qc = _chunk_q([x["loc"], x["wgt"]], q,
                                        n_chunks)
            (gs,), _ = _chunk_q([x["g"]], q, n_chunks)
            dvals0 = tuple(
                jnp.zeros(((hs[i] + 1) * (ws[i] + 1), 4 * c),
                          jnp.float32) for i in gather_lvls)

            def inner(dvals, args):
                dvals, dloc_c, dwgt_c = chunk_bwd(tab_g, dvals, *args)
                return dvals, (dloc_c, dwgt_c)
            dvals, (dlocs, dwgts) = jax.lax.scan(
                inner, dvals0, (locs, wgts, gs))
            dloc = dlocs.reshape((n_chunks * qc,) + dlocs.shape[2:])[:q]
            dwgt = dwgts.reshape((n_chunks * qc,) + dwgts.shape[2:])[:q]

        # dense-level dvalue: one transposed matmul per level (no
        # scatter; lhs is built over the full query axis — cells are
        # small by construction on these levels)
        dvd = []
        for lvl in dense_lvls:
            h, w = spatial_shapes[lvl]
            lhs = _dense_lhs(x["loc"][:, lvl], x["wgt"][:, lvl],
                             h, w, dt)                # [q, cells]
            dvd.append(jnp.einsum("qk,qc->kc", lhs, x["g"].astype(dt),
                                  preferred_element_type=jnp.float32))
        return None, {"dval": dvals, "dloc": dloc, "dwgt": dwgt,
                      "dvd": tuple(dvd)}

    _, ys = jax.lax.scan(step, None, xs)

    parts = [None] * num_levels
    for gi, lvl in enumerate(gather_lvls):
        h, w = spatial_shapes[lvl]
        grid = ys["dval"][gi].reshape(bsz, m, h + 1, w + 1, 4, c)
        parts[lvl] = _fold_supercell(grid, h, w)
    for di, lvl in enumerate(dense_lvls):
        h, w = spatial_shapes[lvl]
        core = ys["dvd"][di].reshape(
            bsz, m, h + 2, w + 2, c)[:, :, 1:h + 1, 1:w + 1]
        parts[lvl] = core.transpose(0, 2, 3, 1, 4).reshape(
            bsz, h * w, m, c)
    dval = jnp.concatenate(parts, axis=1)
    dloc = _untranspose_bm(ys["dloc"].astype(loc.dtype), bsz, m)
    dwgt = _untranspose_bm(ys["dwgt"].astype(weight.dtype), bsz, m)
    return dval.astype(value.dtype), dloc, dwgt


def _fold_supercell(acc: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """[B, M, h+1, w+1, 4, C] supercell-grid grads -> [B, h*w, M, C].

    Supercell (y0, x0) corner k=(j, i) (y-major) contributes to padded
    cell (y0+j, x0+i); the core cells are y in [1, h], x in [1, w]."""
    bsz, m = acc.shape[0], acc.shape[1]
    c = acc.shape[-1]
    core = (acc[:, :, 1:h + 1, 1:w + 1, 0] +
            acc[:, :, 1:h + 1, 0:w, 1] +
            acc[:, :, 0:h, 1:w + 1, 2] +
            acc[:, :, 0:h, 0:w, 3])
    return core.transpose(0, 2, 3, 1, 4).reshape(bsz, h * w, m, c)


_attn_cvjp.defvjp(_attn_cvjp_fwd, _attn_cvjp_bwd)


def ms_deform_attn(value: jnp.ndarray,
                   spatial_shapes: Sequence[Tuple[int, int]],
                   sampling_locations: jnp.ndarray,
                   attention_weights: jnp.ndarray) -> jnp.ndarray:
    """Multi-scale deformable attention.

    Args:
        value: [B, sum(H_l*W_l), M, C] multi-level flattened features.
        spatial_shapes: static ((H_0, W_0), ...) per level.
        sampling_locations: [B, Q, M, L, P, 2] normalized (x, y) in [0,1].
        attention_weights: [B, Q, M, L, P] (softmax-normalized by caller).

    Returns: [B, Q, M*C]
    """
    bsz, _, m, c = value.shape
    q = sampling_locations.shape[1]
    num_levels = len(spatial_shapes)
    assert sampling_locations.shape[3] == num_levels
    shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    out = _attn_cvjp(value, shapes, sampling_locations,
                     attention_weights)
    # named so remat policies can SAVE the sampled output: with
    # jax.checkpoint_policies.save_only_these_names("msda_out") an
    # encoder-layer remat skips re-running the sampling core in the
    # backward replay (its custom-vjp residuals are op INPUTS, which
    # replay from cheap linears) — see transformer/encoder.py
    out = _checkpoint_name(out, "msda_out")
    return out.reshape(bsz, q, m * c)
