"""Multi-scale deformable attention sampling core.

Capability parity with the mmcv CUDA extension the reference loads
(reference: mmdet3d/models/transformer_modules/
multi_scale_deformable_attn_function.py:1-162 — `_ext.ms_deform_attn_forward`
/ `backward`, used by BEVFormer's spatial cross-attention, temporal
self-attention and the DETR decoders).

TPU-native design: the CUDA kernel is a per-thread gather + bilinear
interpolation + weighted accumulation with a hand-written backward.
TPU gathers/scatters are bound by segment/row count, not bytes, so both
walks use duplicated layouts chosen independently:

* GATHERS read a ROW-DUPLICATED ("superrow") zero-bordered grid —
  ``grid2[y, x] = concat(grid[y, x], grid[y+1, x])`` — so the full 2x2
  bilinear window of a sample is grid2[y0, x0:x0+2], ONE contiguous
  4C-byte segment (one gather row per sample; 2x grid build cost,
  measured cheaper than the 4x window-duplicated build).
* The backward's dvalue SCATTER-adds land in a WINDOW-DUPLICATED
  ("supercell") accumulator of shape [(h+1)*(w+1), 4C] per (b, m):
  each sample contributes its whole (w_ij*wgt)*dout window as ONE
  4C-wide row (vs four corner rows in the plain layout / two rows in
  superrow).  The accumulator starts at zero — the supercell grid is
  never materialized from the values — and the four phases fold into
  the plain grid at the end.  (A true multi-row windowed scatter
  measured 27x slower: XLA's fast scatter path only takes rank-1 rows.)

The zero border implements the reference kernel's
out-of-range-corners-are-zero semantics without per-corner masks; fully
out-of-window samples are masked in the (tiny) lerp weights.  The lerp +
(levels x points) contraction fuses on the VPU/MXU.  The hand-written
backward recomputes the windows (superrow gathers again) and
accumulates dvalue in the supercell layout.

SMALL levels skip the gather/scatter walks entirely: bilinear lerp
weights are separable (w = wy(y) * wx(x), each factor 2-sparse, and the
out-of-range mask factorizes per axis), so sampling a level is ONE MXU
matmul ``lhs[row, cells] @ grid[cells, C]`` where ``lhs`` sums the P
weighted outer products wy x wx per (query, head) row — the attention
weights and the P-axis reduction fold into the lhs build.  The
backward's dvalue is the transposed matmul ``lhs^T @ dout`` — no
scatter at all.  Measured on v5e at flagship SCA chunk shapes
(6.3M samples/level/call): dense fwd 16/53 ms vs gather 120/119 ms for
the (15,25)/(29,50) FPN levels; past ~6k padded cells the matmul's
rows x cells x C FLOPs overtake the row-count-bound gather and the
gather path wins (the 200x200 BEV levels of TSA/decoder stay on it).
Levels with at most _DENSE_MAX_CELLS padded cells take the dense path;
dloc/dwgt still use the window gathers (they need per-corner dot
products, which do not factorize).
"""
from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def _pad_level_grid(value: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """[B, h*w, M, C] one level -> [B, M, h+1, w+2, 2, C] zero-bordered
    row-duplicated superrow grid: out[..., y, x, j, c] = padded[y+j, x, c]
    where padded is the (h+2, w+2) zero-bordered grid.  Window origins
    y0 lie in [0, h], so superrow y0 holds exactly rows (y0, y0+1)."""
    bsz, hw, m, c = value.shape
    v = value.reshape(bsz, h, w, m, c).transpose(0, 3, 1, 2, 4)
    pv = jnp.pad(v, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    return jnp.stack([pv[:, :, :-1], pv[:, :, 1:]], axis=-2)


def _pad_level_grid_plain(value: jnp.ndarray, h: int,
                          w: int) -> jnp.ndarray:
    """[B, h*w, M, C] one level -> [B, M, (h+2)*(w+2), C] zero-bordered
    PLAIN padded grid (dense-matmul levels; no duplication needed)."""
    bsz, hw, m, c = value.shape
    v = value.reshape(bsz, h, w, m, c).transpose(0, 3, 1, 2, 4)
    pv = jnp.pad(v, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
    return pv.reshape(bsz, m, (h + 2) * (w + 2), c)


def _split_levels(value: jnp.ndarray, spatial_shapes,
                  superrow_all: bool = False) -> List[jnp.ndarray]:
    """[B, sum(HW), M, C] -> per-level zero-bordered grids: superrow for
    gather levels, plain padded for dense-matmul levels (unless
    ``superrow_all`` — the backward's dloc/dwgt window gathers need the
    superrow layout for every level)."""
    out, offset = [], 0
    for h, w in spatial_shapes:
        v = jax.lax.dynamic_slice_in_dim(value, offset, h * w, axis=1)
        if not superrow_all and _is_dense(h, w):
            out.append(_pad_level_grid_plain(v, h, w))
        else:
            out.append(_pad_level_grid(v, h, w))
        offset += h * w
    return out


def _window_coords(loc_xy, h: int, w: int, dt):
    """Sampling location -> clipped window origin + lerp weights.

    Returns (y0i, x0i) int32 window origins in PADDED grid coords
    (always in range for a (2,2) slice) and the four lerp weights
    (w00, w01, w10, w11) with fully-out-of-range samples zeroed —
    partially-out windows are handled exactly by the zero border.
    """
    x = loc_xy[..., 0] * w - 0.5
    y = loc_xy[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = (x - x0).astype(dt)
    ly = (y - y0).astype(dt)
    ok = ((x0 >= -1) & (x0 <= w - 1) &
          (y0 >= -1) & (y0 <= h - 1))
    x0i = jnp.clip(x0, -1, w - 1).astype(jnp.int32) + 1
    y0i = jnp.clip(y0, -1, h - 1).astype(jnp.int32) + 1
    zero = jnp.zeros_like(lx)
    w00 = jnp.where(ok, (1 - lx) * (1 - ly), zero)
    w01 = jnp.where(ok, lx * (1 - ly), zero)
    w10 = jnp.where(ok, (1 - lx) * ly, zero)
    w11 = jnp.where(ok, lx * ly, zero)
    return y0i, x0i, (w00, w01, w10, w11), (lx, ly, ok)


# levels whose zero-bordered grid has at most this many cells take the
# dense separable-lerp matmul path instead of the gather/scatter walks
# (measured crossover ~6k cells on v5e; 2048 keeps a safety margin and
# covers the two small FPN levels of BEVFormer's SCA).
import os as _os
_DENSE_MAX_CELLS = int(_os.environ.get(
    "DISTILLBEV_ATTN_DENSE_MAX_CELLS", 2048))


def _is_dense(h: int, w: int) -> bool:
    return (h + 2) * (w + 2) <= _DENSE_MAX_CELLS


def _axis_coords(t: jnp.ndarray, n: int):
    """One axis of _window_coords: pixel coord t -> clipped padded-grid
    origin t0i (int32), lerp fraction l, in-range mask ok."""
    t0 = jnp.floor(t)
    l = t - t0
    ok = (t0 >= -1) & (t0 <= n - 1)
    t0i = jnp.clip(t0, -1, n - 1).astype(jnp.int32) + 1
    return t0i, l, ok


def _dense_factors(loc_xy: jnp.ndarray, h: int, w: int, dt):
    """Separable 2-sparse lerp factors for the dense-matmul path.

    Returns wy [B, Q, M, P, h+2], wx [B, Q, M, P, w+2] in dtype ``dt``
    with per-axis out-of-range zeroing; their outer product reproduces
    exactly the four _window_coords corner weights (the combined mask
    okx & oky factorizes because a zeroed factor zeroes the product).
    """
    x0i, lx, okx = _axis_coords(loc_xy[..., 0] * w - 0.5, w)
    y0i, ly, oky = _axis_coords(loc_xy[..., 1] * h - 0.5, h)
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
    return wy, wx


def _dense_lhs(loc: jnp.ndarray, wgt: jnp.ndarray, h: int, w: int, dt):
    """[B, Q, M, (h+2)*(w+2)] folded lerp matrix: one row per (q, m)
    summing the P weighted outer products wy x wx (attention weights
    folded in)."""
    wy, wx = _dense_factors(loc, h, w, dt)
    wy = wy * wgt.astype(dt)[..., None]
    lhs = jnp.sum(wy[..., :, None] * wx[..., None, :], axis=3)
    return lhs.reshape(lhs.shape[:3] + (-1,))


def _dense_sample(pgrid: jnp.ndarray, loc: jnp.ndarray,
                  wgt: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Dense-matmul sampling of one small level, attention weights and
    P-reduction folded: [B, Q, M, C]."""
    dt = pgrid.dtype
    lhs = _dense_lhs(loc, wgt, h, w, dt)
    return jnp.einsum("bqmk,bmkc->bqmc", lhs, pgrid,
                      preferred_element_type=jnp.float32).astype(dt)


_GATHER_DNUMS = jax.lax.GatherDimensionNumbers(
    offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
    start_index_map=(0, 1))


def _window_gather(vt: jnp.ndarray, y0i, x0i) -> jnp.ndarray:
    """vt [B, M, H1, W2, 2, C] superrow grid; y0i/x0i [B, Q, M, P]
    window origins -> [B, Q, M, P, 2, 2, C] bilinear windows indexed
    [..., i (x), j (y), c] — note x-major corner order (the superrow
    slice grid2[y0, x0:x0+2] is ONE contiguous 4C segment)."""
    b, m, h1, w2, _, c = vt.shape
    q, p = y0i.shape[1], y0i.shape[3]
    idx = jnp.stack([y0i, x0i], -1)                   # [B,Q,M,P,2]
    idx = idx.transpose(0, 2, 1, 3, 4).reshape(b, m, q * p, 2)

    def g2(op, ind):
        return jax.lax.gather(op, ind, _GATHER_DNUMS,
                              slice_sizes=(1, 2, 2, c), mode="clip")

    win = jax.vmap(jax.vmap(g2))(vt, idx)             # [B,M,QP,2,2,C]
    return win.reshape(b, m, q, p, 2, 2, c).transpose(
        0, 2, 1, 3, 4, 5, 6)


def _bilinear_sample(vt: jnp.ndarray, loc_xy: jnp.ndarray,
                     h: int, w: int) -> jnp.ndarray:
    """Bilinear sample with zero padding outside.

    Args:
        vt: [B, M, h+1, w+2, 2, C] one level's superrow grid.
        loc_xy: [B, Q, M, P, 2] normalized sampling locations in [0, 1]
            (align_corners=False pixel convention: x_pix = x*W - 0.5).

    Returns: [B, Q, M, P, C]
    """
    # lerp weights in the VALUE dtype: sampling locations are forced
    # fp32 (reference point_sampling semantics), and fp32 weights would
    # promote every [B,Q,M,P,C] corner product — under bf16 mixed
    # precision that doubles the largest attention temps in HBM
    y0i, x0i, (w00, w01, w10, w11), _ = _window_coords(
        loc_xy, h, w, vt.dtype)
    win = _window_gather(vt, y0i, x0i)      # [..., i (x), j (y), c]
    return (win[..., 0, 0, :] * w00[..., None] +
            win[..., 1, 0, :] * w01[..., None] +
            win[..., 0, 1, :] * w10[..., None] +
            win[..., 1, 1, :] * w11[..., None])


def _bilinear_sample_grads(vt, loc_xy, wgt, dout, h, w, base: int,
                           want_scatter: bool = True):
    """Hand-derived backward of (bilinear sample x attention weight)
    for one level: returns (dloc_xy, dwgt, gidx, updates).

    vt [B,M,h+1,w+2,2,C] superrow grid (gathers only); loc_xy
    [B,Q,M,P,2]; wgt [B,Q,M,P]; dout [B,Q,M,C].  Mirrors the reference
    CUDA backward (multi_scale_deformable_attn_function.py /
    ms_deform_attn_backward): everything is recomputed here, nothing
    saved from the forward.

    Instead of scattering dvalue here, returns the scatter payload —
    ``gidx`` [B,Q,M,P] LOCAL supercell ids (this level's supercells
    live at [base, base + (h+1)*(w+1)) within each (b, m) group) and
    ``updates`` [B,Q,M,P,4C] whole-window contributions ((i, j, c)
    minor-to-major reversed — the duplicated layout's memory order) —
    so the caller can emit single-ROW scatter-adds of width 4C: ONE
    row per sample instead of the four corner rows of the plain
    layout (XLA's fast scatter path is row-count bound and only
    handles rank-1 row updates; a true multi-row windowed scatter
    measured 27x slower on v5e).
    """
    dt = vt.dtype
    b, m = vt.shape[0], vt.shape[1]
    w1 = w + 1                      # supercell-accumulator row width
    c = vt.shape[-1]
    y0i, x0i, (w00, w01, w10, w11), (lx, ly, ok) = _window_coords(
        loc_xy, h, w, dt)
    win = _window_gather(vt, y0i, x0i)      # [B,Q,M,P,2(i),2(j),C]

    # dout contracted with each corner: g[bqmp, i, j] = <dout, v_ij>.
    # The channel reduction accumulates in fp32 (like the forward's
    # preferred_element_type) so bf16 inputs don't degrade dloc/dwgt.
    gdot = jnp.einsum("bqmc,bqmpijc->bqmpij", dout, win,
                      preferred_element_type=jnp.float32)
    g00, g01 = gdot[..., 0, 0], gdot[..., 1, 0]   # (y0,x0), (y0,x0+1)
    g10, g11 = gdot[..., 0, 1], gdot[..., 1, 1]   # (y0+1,x0), +1,+1

    # ws[..., i, j] = lerp weight of corner (y0+j, x0+i)
    ws = jnp.stack([jnp.stack([w00, w10], -1),
                    jnp.stack([w01, w11], -1)], -2)  # [B,Q,M,P,2,2]
    dwgt = jnp.einsum("bqmpij,bqmpij->bqmp", ws.astype(jnp.float32),
                      gdot)

    okf = ok.astype(jnp.float32)
    lxf, lyf = lx.astype(jnp.float32), ly.astype(jnp.float32)
    wgt_f = wgt.astype(jnp.float32) * okf
    dx = (-(1 - lyf) * g00 + (1 - lyf) * g01 - lyf * g10 + lyf * g11) \
        * wgt_f
    dy = (-(1 - lxf) * g00 - lxf * g01 + (1 - lxf) * g10 + lxf * g11) \
        * wgt_f
    dloc = jnp.stack([dx * w, dy * h], axis=-1).astype(loc_xy.dtype)

    if not want_scatter:
        # dense-matmul level: the caller computes dvalue as lhs^T @ dout
        return dloc, dwgt.astype(wgt.dtype), None, None
    # dvalue payload: (w_ij * wgt) * dout as ONE 4C-wide supercell row
    # per sample in the duplicated layout; the caller folds the four
    # phases after accumulation.
    r = wgt.astype(dt)[..., None] * dout[:, :, :, None, :]
    upd = ws.astype(dt)[..., None] * \
        r[:, :, :, :, None, None, :]                # [B,Q,M,P,2,2,C]
    upd = upd.reshape(upd.shape[:4] + (4 * c,))     # [..., (i j c)]
    lidx = y0i * w1 + x0i + base                    # [B,Q,M,P]
    return dloc, dwgt.astype(wgt.dtype), lidx, upd


def _fold_level_grid(acc: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """[B, M, h+1, w+1, 2, 2, C] supercell-grid grads -> [B, h*w, M, C].

    Supercell (y0, x0) phase (i, j) contributes to padded cell
    (y0+j, x0+i); the core cells are y in [1, h], x in [1, w]."""
    b, m = acc.shape[0], acc.shape[1]
    c = acc.shape[-1]
    core = (acc[:, :, 1:h + 1, 1:w + 1, 0, 0] +
            acc[:, :, 1:h + 1, 0:w, 1, 0] +
            acc[:, :, 0:h, 1:w + 1, 0, 1] +
            acc[:, :, 0:h, 0:w, 1, 1])
    return core.transpose(0, 2, 3, 1, 4).reshape(b, h * w, m, c)


def _attn_all_levels(pvals, spatial_shapes, loc, weight):
    """[B, Q, M, L, P, 2] locations -> [B, Q, M, C] over padded grids."""
    dt = pvals[0].dtype
    bsz, m = pvals[0].shape[0], pvals[0].shape[1]
    q, c = loc.shape[1], pvals[0].shape[-1]
    out = jnp.zeros((bsz, q, m, c), dt)
    for lvl, (h, w) in enumerate(spatial_shapes):
        if _is_dense(h, w):
            out = out + _dense_sample(pvals[lvl], loc[:, :, :, lvl],
                                      weight[:, :, :, lvl], h, w)
            continue
        sampled = _bilinear_sample(pvals[lvl], loc[:, :, :, lvl], h, w)
        # keep the sampled temp in the value dtype (fp32 softmax weights
        # would promote the [B,Q,M,P,C] buffer — under bf16 mixed
        # precision that doubles the largest attention temps); the P-axis
        # reduction accumulates fp32 via preferred_element_type
        out = out + jnp.einsum(
            "bqmpc,bqmp->bqmc", sampled,
            weight[:, :, :, lvl].astype(dt),
            preferred_element_type=jnp.float32).astype(dt)
    return out


# peak gather temp is [B*M*Qc*P, 4C] per chunk; cap the row count so the
# (8,128)-tile padded buffers stay small even at BEVFormer-SCA sizes
# (B*Q*M*P can reach 10M rows at bev 200x200 — unchunked, those temps
# OOM a 16 GB chip in the backward).  Chunks stay large enough that the
# gather/MXU work amortizes the loop overhead.  Override with
# DISTILLBEV_ATTN_MAX_GATHER_ROWS (log2 values make sense: 17-20;
# measured on v5e: 2^18 beats 2^19/2^20 — the walks are row-rate
# bound, larger chunks only grow the temps).
_MAX_GATHER_ROWS = int(_os.environ.get(
    "DISTILLBEV_ATTN_MAX_GATHER_ROWS", 1 << 18))


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


def _attn_chunked(value, spatial_shapes, loc, weight):
    """[B, Q, M, C] output with the query axis processed in sequential
    chunks when the gather row count is large."""
    bsz, _, m, c = value.shape
    q, p = loc.shape[1], loc.shape[4]
    rows = bsz * q * m * p
    n_chunks = max(1, -(-rows // _MAX_GATHER_ROWS))
    pvals = _split_levels(value, spatial_shapes)
    if n_chunks == 1:
        return _attn_all_levels(pvals, spatial_shapes, loc, weight)
    (locs, wgts), qc = _chunk_qaxis([loc, weight], q, n_chunks)
    out = jax.lax.map(
        lambda lw: _attn_all_levels(pvals, spatial_shapes, lw[0], lw[1]),
        (locs, wgts))                          # [nc, B, qc, M, C]
    out = jnp.moveaxis(out, 0, 1).reshape(bsz, n_chunks * qc, m, c)
    return out[:, :q]


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _attn_cvjp(value, spatial_shapes, loc, weight):
    return _attn_chunked(value, spatial_shapes, loc, weight)


def _attn_cvjp_fwd(value, spatial_shapes, loc, weight):
    # residuals are just the op inputs — the hand-written backward
    # recomputes every gather/lerp, so NO [B,Q,M,P,C] temp survives the
    # forward (the reference hand-writes this backward for the same
    # reason, multi_scale_deformable_attn_function.py:1-162)
    return _attn_chunked(value, spatial_shapes, loc, weight), \
        (value, loc, weight)


# XLA lowers scatter-add through a fast direct path only while the
# target stays small (measured cliff between 250k and 650k rows of 32:
# 50M vs 7M update-rows/s on v5e) — dvalue accumulators are therefore
# SLABBED into groups of (batch x head) grids each at most this many
# rows, one scatter op per slab per chunk.
_MAX_SCATTER_TARGET_ROWS = int(_os.environ.get(
    "DISTILLBEV_ATTN_MAX_SCATTER_ROWS", 250_000))


def _attn_cvjp_bwd(spatial_shapes, res, g):
    value, loc, weight = res
    bsz, hw_total, m, c = value.shape
    q, num_levels, p = loc.shape[1], loc.shape[3], loc.shape[4]
    rows = bsz * q * m * p
    n_chunks = max(1, -(-rows // _MAX_GATHER_ROWS))
    (locs, wgts, gs), qc = _chunk_qaxis([loc, weight, g], q, n_chunks)
    # superrow grids for ALL levels: dloc/dwgt need the per-corner dot
    # products (window gathers) even on dense-matmul levels
    pvals = _split_levels(value, spatial_shapes, superrow_all=True)
    dense_lvls = [i for i, (h, w) in enumerate(spatial_shapes)
                  if _is_dense(h, w)]
    gather_lvls = [i for i, (h, w) in enumerate(spatial_shapes)
                   if not _is_dense(h, w)]
    # per-(b, m) supercell count and per-level local offsets — scatter
    # bookkeeping covers only the gather levels (dense levels get their
    # dvalue from a transposed matmul, no scatter rows at all)
    lbases, cells_bm = {}, 0
    for i in gather_lvls:
        h, w = spatial_shapes[i]
        lbases[i] = cells_bm
        cells_bm += (h + 1) * (w + 1)
    bm = bsz * m
    if gather_lvls:
        grp = max(1, _MAX_SCATTER_TARGET_ROWS // cells_bm)
        n_slabs = -(-bm // grp)
        slab_bm = [min(grp, bm - s * grp) for s in range(n_slabs)]
    else:
        grp, slab_bm = 1, []
    acc0 = (
        tuple(jnp.zeros((gbm * cells_bm, 4 * c), jnp.float32)
              for gbm in slab_bm),
        tuple(jnp.zeros(
            (bsz, m,
             (spatial_shapes[i][0] + 2) * (spatial_shapes[i][1] + 2), c),
            jnp.float32) for i in dense_lvls))

    def chunk_bwd(acc, args):
        dval_acc, dense_acc = acc
        locc, wgtc, gc = args
        idxs, ups = [], []
        dls = [None] * num_levels
        dws = [None] * num_levels
        new_dense = list(dense_acc)
        for lvl, (h, w) in enumerate(spatial_shapes):
            dense = _is_dense(h, w)
            dl, dw, lidx, up = _bilinear_sample_grads(
                pvals[lvl], locc[:, :, :, lvl], wgtc[:, :, :, lvl],
                gc, h, w, lbases.get(lvl, 0), want_scatter=not dense)
            dls[lvl] = dl
            dws[lvl] = dw
            if dense:
                di = dense_lvls.index(lvl)
                dt = pvals[lvl].dtype
                lhs = _dense_lhs(locc[:, :, :, lvl],
                                 wgtc[:, :, :, lvl], h, w, dt)
                new_dense[di] = new_dense[di] + jnp.einsum(
                    "bqmk,bqmc->bmkc", lhs, gc.astype(dt),
                    preferred_element_type=jnp.float32)
            else:
                # [B, Qc, M, P] -> [B*M, Qc*P] bm-major
                idxs.append(lidx.transpose(0, 2, 1, 3).reshape(bm, -1))
                ups.append(up.transpose(0, 2, 1, 3, 4).reshape(
                    bm, -1, 4 * c))
        new_acc = list(dval_acc)
        if idxs:
            idx_bm = jnp.concatenate(idxs, axis=1)
            up_bm = jnp.concatenate(ups, axis=1).astype(jnp.float32)
            # one small-target row scatter per slab (stays on XLA's fast
            # path); each sample adds ONE 4C-wide supercell row
            new_acc = []
            for s, (acc_s, gbm) in enumerate(zip(dval_acc, slab_bm)):
                i0 = s * grp
                rel = jnp.arange(gbm, dtype=jnp.int32)[:, None] \
                    * cells_bm
                idx_s = (idx_bm[i0:i0 + gbm] + rel).reshape(-1)
                new_acc.append(acc_s.at[idx_s].add(
                    up_bm[i0:i0 + gbm].reshape(-1, 4 * c)))
        return (tuple(new_acc), tuple(new_dense)), \
            (jnp.stack(dls, axis=3), jnp.stack(dws, axis=3))

    (dval_slabs, dense_accs), (dlocs, dwgts) = jax.lax.scan(
        chunk_bwd, acc0, (locs, wgts, gs))
    if gather_lvls:
        dval_bm = jnp.concatenate(dval_slabs).reshape(
            bsz, m, cells_bm, 2, 2, c)
    parts = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        if _is_dense(h, w):
            di = dense_lvls.index(lvl)
            core = dense_accs[di].reshape(
                bsz, m, h + 2, w + 2, c)[:, :, 1:h + 1, 1:w + 1]
            parts.append(core.transpose(0, 2, 3, 1, 4).reshape(
                bsz, h * w, m, c))
        else:
            grid = dval_bm[:, :, lbases[lvl]:lbases[lvl] +
                           (h + 1) * (w + 1)].reshape(
                bsz, m, h + 1, w + 1, 2, 2, c)
            parts.append(_fold_level_grid(grid, h, w))
    dval = jnp.concatenate(parts, axis=1)
    dloc = jnp.moveaxis(dlocs, 0, 1).reshape(
        (bsz, n_chunks * qc) + loc.shape[2:])[:, :q]
    dwgt = jnp.moveaxis(dwgts, 0, 1).reshape(
        (bsz, n_chunks * qc) + weight.shape[2:])[:, :q]
    return dval.astype(value.dtype), dloc, dwgt


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
