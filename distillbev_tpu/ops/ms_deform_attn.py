"""Multi-scale deformable attention sampling core.

Capability parity with the mmcv CUDA extension the reference loads
(reference: mmdet3d/models/transformer_modules/
multi_scale_deformable_attn_function.py:1-162 — `_ext.ms_deform_attn_forward`
/ `backward`, used by BEVFormer's spatial cross-attention, temporal
self-attention and the DETR decoders).

TPU-native design.  XLA:TPU's gather/scatter engines are ROW-RATE
bound, and the fast path is the flattest form: a single-axis row take
from a 2-D table with a 1-D int32 index vector (measured 236M rows/s
on v5e at [23634, 128] bf16 — tools/analysis_tools/
bench_pallas_gather.py) vs ~45M rows/s for the batched multi-dim
window gathers the round-2 layout used.  The kernel is therefore built
around ONE flat take per chunk:

* The value grids are expanded into a SUPERCELL table: each cell
  (y0, x0) of the zero-bordered grid stores its full 2x2 bilinear
  window as one contiguous 4C-wide row ``[v(y0,x0), v(y0,x0+1),
  v(y0+1,x0), v(y0+1,x0+1)]`` (128 lanes exactly at the BEVFormer head
  dim C=32).  Batch, head and level are all folded into the row id, so
  sampling EVERY level of every head is one `jnp.take` of
  [rows, 4C] — one row per sample point.
* The lerp + attention-weight combine is a broadcast multiply + fp32
  axis reduction on the VPU (an einsum here lowers to batched tiny
  matmuls at ~0.03 TF/s — see docs/PERF.md).
* The hand-written backward (custom VJP, recompute-in-bwd like the
  reference CUDA op) re-takes the same rows for the dloc/dwgt corner
  dot products, and scatter-adds dvalue as ONE 4C-wide row per sample
  into a zero supercell accumulator, slabbed into <=250k-row targets
  (XLA's fast scatter path degrades ~7x above that), with a four-phase
  fold back to the plain grid at the end.

The zero border implements the reference kernel's
out-of-range-corners-are-zero semantics without per-corner masks; fully
out-of-window samples are masked in the (tiny) lerp weights.

SMALL levels can instead take a dense separable-lerp matmul path:
bilinear lerp weights are separable (w = wy(y) * wx(x), each factor
2-sparse, and the out-of-range mask factorizes per axis), so sampling a
level is ONE MXU matmul ``lhs[row, cells] @ grid[cells, C]`` where
``lhs`` sums the P weighted outer products per (query, head) row, and
the backward's dvalue is ``lhs^T @ dout`` — no scatter.  With the flat
take at ~236M rows/s the crossover moved far down from round 2's ~6k
cells; levels with at most _DENSE_MAX_CELLS padded cells take it.
"""
from __future__ import annotations

import os as _os
from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

# levels whose zero-bordered grid has at most this many cells take the
# dense separable-lerp matmul path instead of the flat-take walk.
_DENSE_MAX_CELLS = int(_os.environ.get(
    "DISTILLBEV_ATTN_DENSE_MAX_CELLS", 512))

# peak take/scatter temp is [rows, 4C] per chunk (rows counted over
# batch x queries x heads x points x gather-levels); cap the row count
# so those buffers stay bounded even at BEVFormer-SCA sizes (B*Q*M*P*L
# reaches 24M at bev 200x200 — unchunked, the backward temps OOM a
# 16 GB chip).  Override with DISTILLBEV_ATTN_MAX_GATHER_ROWS; measured
# on v5e: the walks are row-rate bound, larger chunks only grow temps.
_MAX_GATHER_ROWS = int(_os.environ.get(
    "DISTILLBEV_ATTN_MAX_GATHER_ROWS", 1 << 19))

# XLA lowers scatter-add through a fast direct path only while the
# target stays small (measured cliff between 250k and 650k rows on
# v5e) — dvalue accumulators are slabbed into groups of (batch x head)
# grids each at most this many rows, one scatter op per slab per chunk.
_MAX_SCATTER_TARGET_ROWS = int(_os.environ.get(
    "DISTILLBEV_ATTN_MAX_SCATTER_ROWS", 250_000))


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
    """Concatenate the supercell tables of ``levels`` into one flat
    [B*M*cells_bm, 4C] table; returns (table, bases [len(levels)],
    cells_bm)."""
    per_level = _level_split(value, spatial_shapes)
    tabs, bases, cells = [], [], 0
    for i in levels:
        h, w = spatial_shapes[i]
        tabs.append(_supercell_level(per_level[i], h, w))
        bases.append(cells)
        cells += (h + 1) * (w + 1)
    bsz, m = value.shape[0], value.shape[2]
    table = jnp.concatenate(tabs, axis=2).reshape(
        bsz * m * cells, 4 * value.shape[3])
    return table, bases, cells


# ---------------------------------------------------------------------------
# vectorized window coordinates (all gather levels at once)


def _window_coords_multi(loc: jnp.ndarray, hs, ws, dt):
    """loc [B, Q, M, Lg, P, 2] normalized (x, y); hs/ws python lists of
    per-level sizes.  Returns int32 window origins y0i/x0i in PADDED
    grid coords [B, Q, M, Lg, P], corner lerp weights w4
    [B, Q, M, Lg, P, 4] (y-major corner order, fully-out samples
    zeroed) in dtype ``dt``, and (lx, ly, ok) fp32 residuals."""
    hv = jnp.asarray(hs, jnp.float32).reshape(1, 1, 1, -1, 1)
    wv = jnp.asarray(ws, jnp.float32).reshape(1, 1, 1, -1, 1)
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


def _flat_ids(y0i, x0i, strides, bases, cells_bm):
    """[B, Q, M, Lg, P] window origins -> flat supercell row ids into
    the [B*M*cells_bm, 4C] table."""
    b, q, m = y0i.shape[:3]
    sv = jnp.asarray(strides, jnp.int32).reshape(1, 1, 1, -1, 1)
    bv = jnp.asarray(bases, jnp.int32).reshape(1, 1, 1, -1, 1)
    bm = (jax.lax.broadcasted_iota(jnp.int32, (b, 1, m, 1, 1), 0) * m +
          jax.lax.broadcasted_iota(jnp.int32, (b, 1, m, 1, 1), 2))
    return bm * cells_bm + bv + y0i * sv + x0i


def _take_windows(table, ids, c):
    """Flat row take: ids [B, Q, M, Lg, P] -> windows
    [B, Q, M, Lg, P, 4, C]."""
    rows = table.at[ids.reshape(-1)].get(mode="promise_in_bounds")
    return rows.reshape(ids.shape + (4, c))


# ---------------------------------------------------------------------------
# dense separable-lerp matmul path (small levels)


def _axis_coords(t: jnp.ndarray, n: int):
    t0 = jnp.floor(t)
    l = t - t0
    ok = (t0 >= -1) & (t0 <= n - 1)
    t0i = jnp.clip(t0, -1, n - 1).astype(jnp.int32) + 1
    return t0i, l, ok


def _dense_lhs(loc: jnp.ndarray, wgt: jnp.ndarray, h: int, w: int, dt):
    """[B, Q, M, (h+2)*(w+2)] folded lerp matrix: one row per (q, m)
    summing the P weighted outer products wy x wx (attention weights
    folded in).  Built as broadcast mul + sum over P — an einsum here
    lowers to batched tiny matmuls (docs/PERF.md pitfall)."""
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
    lhs = jnp.sum(wy[..., :, None] * wx[..., None, :], axis=3)
    return lhs.reshape(lhs.shape[:3] + (-1,))


def _dense_sample(pgrid: jnp.ndarray, loc: jnp.ndarray,
                  wgt: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Dense-matmul sampling of one small level, attention weights and
    P-reduction folded: [B, Q, M, C].  pgrid [B, M, (h+2)*(w+2), C]."""
    dt = pgrid.dtype
    lhs = _dense_lhs(loc, wgt, h, w, dt)
    return jnp.einsum("bqmk,bmkc->bqmc", lhs, pgrid,
                      preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# forward


def _level_groups(spatial_shapes):
    dense = [i for i, (h, w) in enumerate(spatial_shapes)
             if _is_dense(h, w)]
    gather = [i for i, (h, w) in enumerate(spatial_shapes)
              if not _is_dense(h, w)]
    return gather, dense


def _fwd_chunk(table, cells_bm, hs, ws, strides, bases, c,
               loc_g, wgt_g):
    """One query chunk over the gather levels: [B, Qc, M, C] fp32."""
    dt = table.dtype
    y0i, x0i, w4, _ = _window_coords_multi(loc_g, hs, ws, dt)
    ids = _flat_ids(y0i, x0i, strides, bases, cells_bm)
    win = _take_windows(table, ids, c)          # [B,Qc,M,Lg,P,4,C]
    wf = w4 * wgt_g.astype(dt)[..., None]       # attention folded
    return jnp.sum(win * wf[..., None], axis=(3, 4, 5),
                   dtype=jnp.float32)


def _attn_chunked(value, spatial_shapes, loc, weight):
    """[B, Q, M, C] output with the query axis processed in sequential
    chunks when the take row count is large."""
    bsz, _, m, c = value.shape
    q, p = loc.shape[1], loc.shape[4]
    gather_lvls, dense_lvls = _level_groups(spatial_shapes)
    dt = value.dtype
    out = jnp.zeros((bsz, q, m, c), jnp.float32)

    if dense_lvls:
        per_level = _level_split(value, spatial_shapes)
        for i in dense_lvls:
            h, w = spatial_shapes[i]
            pg = _pad_level_grid_plain(per_level[i], h, w).reshape(
                bsz, m, (h + 2) * (w + 2), c)
            out = out + _dense_sample(pg, loc[:, :, :, i],
                                      weight[:, :, :, i], h, w)

    if gather_lvls:
        table, bases, cells_bm = _build_table(
            value, spatial_shapes, gather_lvls)
        hs = [spatial_shapes[i][0] for i in gather_lvls]
        ws = [spatial_shapes[i][1] for i in gather_lvls]
        strides = [w + 1 for w in ws]
        loc_g = loc[:, :, :, gather_lvls]
        wgt_g = weight[:, :, :, gather_lvls]
        rows = bsz * q * m * p * len(gather_lvls)
        n_chunks = max(1, -(-rows // _MAX_GATHER_ROWS))
        if n_chunks == 1:
            out = out + _fwd_chunk(table, cells_bm, hs, ws, strides,
                                   bases, c, loc_g, wgt_g)
        else:
            (locs, wgts), qc = _chunk_qaxis([loc_g, wgt_g], q, n_chunks)
            part = jax.lax.map(
                lambda lw: _fwd_chunk(table, cells_bm, hs, ws, strides,
                                      bases, c, lw[0], lw[1]),
                (locs, wgts))                     # [nc, B, qc, M, C]
            part = jnp.moveaxis(part, 0, 1).reshape(
                bsz, n_chunks * qc, m, c)[:, :q]
            out = out + part
    return out.astype(dt)


def _chunk_qaxis(arrs, q, n_chunks):
    """Pad + reshape [B, Q, ...] arrays to chunk-major [nc, B, qc, ...]."""
    qc = -(-q // n_chunks)
    pad = n_chunks * qc - q
    out = []
    for a in arrs:
        a = jnp.pad(a, ((0, 0), (0, pad)) + ((0, 0),) * (a.ndim - 2))
        a = a.reshape((a.shape[0], n_chunks, qc) + a.shape[2:])
        out.append(jnp.moveaxis(a, 1, 0))
    return out, qc


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


def _bwd_chunk(table, cells_bm, hs, ws, strides, bases, c,
               locc, wgtc, gc):
    """Gradients for one query chunk over ALL levels (the corner dot
    products serve gather and dense levels alike).

    Returns (dloc [B,Qc,M,L,P,2] f32, dwgt [B,Qc,M,L,P] f32,
    ids [B,Qc,M,L,P] int32, upd [B,Qc,M,L,P,4C] value-dtype)."""
    dt = table.dtype
    y0i, x0i, w4, (lx, ly, ok) = _window_coords_multi(locc, hs, ws, dt)
    ids = _flat_ids(y0i, x0i, strides, bases, cells_bm)
    win = _take_windows(table, ids, c)          # [B,Qc,M,L,P,4,C]

    # dout contracted with each corner: g[..., corner] = <dout, v_c>.
    # broadcast mul + fp32 lane reduction (einsum here = tiny matmuls)
    doutb = gc[:, :, :, None, None, None, :]    # [B,Qc,M,1,1,1,C]
    gdot = jnp.sum(win * doutb.astype(dt), axis=-1,
                   dtype=jnp.float32)           # [B,Qc,M,L,P,4]
    dwgt = jnp.sum(w4.astype(jnp.float32) * gdot, axis=-1)

    g00, g01 = gdot[..., 0], gdot[..., 1]
    g10, g11 = gdot[..., 2], gdot[..., 3]
    okf = ok.astype(jnp.float32)
    wgt_f = wgtc.astype(jnp.float32) * okf
    hv = jnp.asarray(hs, jnp.float32).reshape(1, 1, 1, -1, 1)
    wv = jnp.asarray(ws, jnp.float32).reshape(1, 1, 1, -1, 1)
    dx = (-(1 - ly) * g00 + (1 - ly) * g01 - ly * g10 + ly * g11) \
        * wgt_f * wv
    dy = (-(1 - lx) * g00 - lx * g01 + (1 - lx) * g10 + lx * g11) \
        * wgt_f * hv
    dloc = jnp.stack([dx, dy], axis=-1)

    # dvalue payload: (w_c * wgt) * dout as ONE 4C-wide supercell row
    # per sample (XLA's fast scatter path is row-count bound and only
    # takes rank-1 rows; the four phases fold after accumulation)
    r = wgtc.astype(dt)[..., None] * gc[:, :, :, None, None, :] \
        .astype(dt)                              # [B,Qc,M,L,P,C]
    upd = w4[..., None] * r[..., None, :]        # [B,Qc,M,L,P,4,C]
    upd = upd.reshape(upd.shape[:5] + (4 * c,))
    return dloc, dwgt, ids, upd


def _attn_cvjp_bwd(spatial_shapes, res, g):
    value, loc, weight = res
    bsz, hw_total, m, c = value.shape
    q, num_levels, p = loc.shape[1], loc.shape[3], loc.shape[4]
    dt = value.dtype
    gather_lvls, dense_lvls = _level_groups(spatial_shapes)

    # one supercell table over ALL levels: the dloc/dwgt corner dot
    # products need the windows on dense levels too
    all_lvls = list(range(num_levels))
    table, tbases, tcells_bm = _build_table(value, spatial_shapes,
                                            all_lvls)
    hs = [h for h, _ in spatial_shapes]
    ws = [w for _, w in spatial_shapes]
    strides = [w + 1 for w in ws]

    rows = bsz * q * m * p * num_levels
    n_chunks = max(1, -(-rows // _MAX_GATHER_ROWS))
    (locs, wgts, gs), qc = _chunk_qaxis([loc, weight, g], q, n_chunks)

    # scatter bookkeeping covers only the gather levels (dense levels
    # get their dvalue from a transposed matmul, no scatter rows)
    sbases, scells_bm = {}, 0
    for i in gather_lvls:
        h, w = spatial_shapes[i]
        sbases[i] = scells_bm
        scells_bm += (h + 1) * (w + 1)
    # table row id -> scatter row id differs per level by a constant;
    # map via per-level offset vector indexed by the level axis
    bm = bsz * m
    if gather_lvls:
        grp = max(1, _MAX_SCATTER_TARGET_ROWS // scells_bm)
        n_slabs = -(-bm // grp)
        slab_bm = [min(grp, bm - s * grp) for s in range(n_slabs)]
    else:
        grp, slab_bm = 1, []
    acc0 = (
        tuple(jnp.zeros((gbm * scells_bm, 4 * c), jnp.float32)
              for gbm in slab_bm),
        tuple(jnp.zeros(
            (bsz, m,
             (spatial_shapes[i][0] + 2) * (spatial_shapes[i][1] + 2), c),
            jnp.float32) for i in dense_lvls))

    def chunk_bwd(acc, args):
        dval_acc, dense_acc = acc
        locc, wgtc, gc = args
        dloc, dwgt, ids, upd = _bwd_chunk(
            table, tcells_bm, hs, ws, strides, tbases, c,
            locc, wgtc, gc)

        new_dense = list(dense_acc)
        for di, lvl in enumerate(dense_lvls):
            h, w = spatial_shapes[lvl]
            lhs = _dense_lhs(locc[:, :, :, lvl], wgtc[:, :, :, lvl],
                             h, w, dt)
            new_dense[di] = new_dense[di] + jnp.einsum(
                "bqmk,bqmc->bmkc", lhs, gc.astype(dt),
                preferred_element_type=jnp.float32)

        new_acc = list(dval_acc)
        if gather_lvls:
            # remap table row ids -> scatter row ids: subtract the
            # (bm * tcells_bm + tbase) components, rebuild with the
            # scatter-only bases over a per-(b, m) grid of scells_bm
            loc_ids = ids - _flat_ids(
                jnp.zeros_like(ids), jnp.zeros_like(ids),
                [0] * num_levels, tbases, tcells_bm)   # y0*stride + x0
            soff = jnp.asarray(
                [sbases.get(i, 0) for i in range(num_levels)],
                jnp.int32).reshape(1, 1, 1, -1, 1)
            sids = soff + loc_ids        # LOCAL per-(b, m) scatter ids
            # [B,Qc,M,L,P] -> [B*M, Qc*Lg*P] bm-major, gather lvls only
            sids = sids[:, :, :, gather_lvls].transpose(
                0, 2, 1, 3, 4).reshape(bm, -1)
            upd_g = upd[:, :, :, gather_lvls].transpose(
                0, 2, 1, 3, 4, 5).reshape(bm, -1, 4 * c) \
                .astype(jnp.float32)
            new_acc = []
            for s, (acc_s, gbm) in enumerate(zip(dval_acc, slab_bm)):
                i0 = s * grp
                rel = jnp.arange(gbm, dtype=jnp.int32)[:, None] \
                    * scells_bm
                idx_s = (sids[i0:i0 + gbm] + rel).reshape(-1)
                new_acc.append(acc_s.at[idx_s].add(
                    upd_g[i0:i0 + gbm].reshape(-1, 4 * c),
                    mode="promise_in_bounds"))
        return (tuple(new_acc), tuple(new_dense)), (dloc, dwgt)

    (dval_slabs, dense_accs), (dlocs, dwgts) = jax.lax.scan(
        chunk_bwd, acc0, (locs, wgts, gs))

    if gather_lvls:
        dval_bm = jnp.concatenate(dval_slabs).reshape(
            bsz, m, scells_bm, 4, c)
    parts = [None] * num_levels
    for di, lvl in enumerate(dense_lvls):
        h, w = spatial_shapes[lvl]
        core = dense_accs[di].reshape(
            bsz, m, h + 2, w + 2, c)[:, :, 1:h + 1, 1:w + 1]
        parts[lvl] = core.transpose(0, 2, 3, 1, 4).reshape(
            bsz, h * w, m, c)
    for lvl in gather_lvls:
        h, w = spatial_shapes[lvl]
        grid = dval_bm[:, :, sbases[lvl]:sbases[lvl] +
                       (h + 1) * (w + 1)].reshape(
            bsz, m, h + 1, w + 1, 4, c)
        parts[lvl] = _fold_supercell(grid, h, w)
    dval = jnp.concatenate(parts, axis=1)
    dloc = jnp.moveaxis(dlocs, 0, 1).reshape(
        (bsz, -1) + loc.shape[2:])[:, :q].astype(loc.dtype)
    dwgt = jnp.moveaxis(dwgts, 0, 1).reshape(
        (bsz, -1) + weight.shape[2:])[:, :q].astype(weight.dtype)
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
    return out.reshape(bsz, q, m * c)
