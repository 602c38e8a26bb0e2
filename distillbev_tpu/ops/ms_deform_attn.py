"""Multi-scale deformable attention sampling core.

Capability parity with the mmcv CUDA extension the reference loads
(reference: mmdet3d/models/transformer_modules/
multi_scale_deformable_attn_function.py:1-162 — `_ext.ms_deform_attn_forward`
/ `backward`, used by BEVFormer's spatial cross-attention, temporal
self-attention and the DETR decoders).

TPU-native design: the CUDA kernel is a per-thread gather + bilinear
interpolation + weighted accumulation with a hand-written backward.  Here
each bilinear sample is ONE windowed (2, 2, C) slice-gather from a
zero-bordered value grid — the 2x2xC window holds all four corners as two
C- and 2C-contiguous segments, so the TPU gather walks HALF the rows of a
per-corner formulation at twice the row width (row-walk time, not bytes,
bounds these gathers).  The zero border implements the reference kernel's
out-of-range-corners-are-zero semantics without per-corner masks; fully
out-of-window samples are masked in the (tiny) lerp weights.  The lerp +
(levels x points) contraction fuses on the VPU/MXU.  The hand-written
backward recomputes the windows and emits dvalue as ONE windowed
scatter-add per level (vs four chained full-buffer scatters).
"""
from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def _pad_level_grid(value: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """[B, h*w, M, C] one level -> [B, M, h+2, w+2, C] zero-bordered."""
    bsz, hw, m, c = value.shape
    v = value.reshape(bsz, h, w, m, c).transpose(0, 3, 1, 2, 4)
    return jnp.pad(v, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))


def _split_levels(value: jnp.ndarray,
                  spatial_shapes) -> List[jnp.ndarray]:
    """[B, sum(HW), M, C] -> per-level zero-bordered grids."""
    out, offset = [], 0
    for h, w in spatial_shapes:
        v = jax.lax.dynamic_slice_in_dim(value, offset, h * w, axis=1)
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


_GATHER_DNUMS = jax.lax.GatherDimensionNumbers(
    offset_dims=(1, 2, 3), collapsed_slice_dims=(),
    start_index_map=(0, 1))


def _window_gather(vt: jnp.ndarray, y0i, x0i) -> jnp.ndarray:
    """vt [B, M, H2, W2, C]; y0i/x0i [B, Q, M, P] padded-grid window
    origins -> [B, Q, M, P, 2, 2, C] bilinear windows."""
    b, m, h2, w2, c = vt.shape
    q, p = y0i.shape[1], y0i.shape[3]
    idx = jnp.stack([y0i, x0i], -1)                   # [B,Q,M,P,2]
    idx = idx.transpose(0, 2, 1, 3, 4).reshape(b, m, q * p, 2)

    def g2(op, ind):
        return jax.lax.gather(op, ind, _GATHER_DNUMS,
                              slice_sizes=(2, 2, c), mode="clip")

    win = jax.vmap(jax.vmap(g2))(vt, idx)             # [B,M,QP,2,2,C]
    return win.reshape(b, m, q, p, 2, 2, c).transpose(
        0, 2, 1, 3, 4, 5, 6)


def _bilinear_sample(vt: jnp.ndarray, loc_xy: jnp.ndarray,
                     h: int, w: int) -> jnp.ndarray:
    """Bilinear sample with zero padding outside.

    Args:
        vt: [B, M, h+2, w+2, C] one level's zero-bordered grid.
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
    win = _window_gather(vt, y0i, x0i)
    return (win[..., 0, 0, :] * w00[..., None] +
            win[..., 0, 1, :] * w01[..., None] +
            win[..., 1, 0, :] * w10[..., None] +
            win[..., 1, 1, :] * w11[..., None])


def _bilinear_sample_grads(vt, loc_xy, wgt, dout, h, w, base: int):
    """Hand-derived backward of (bilinear sample x attention weight)
    for one level: returns (dloc_xy, dwgt, gidx, rows).

    vt [B,M,h+2,w+2,C]; loc_xy [B,Q,M,P,2]; wgt [B,Q,M,P];
    dout [B,Q,M,C].  Mirrors the reference CUDA backward
    (multi_scale_deformable_attn_function.py / ms_deform_attn_backward):
    everything is recomputed here, nothing saved from the forward.

    Instead of scattering dvalue here, returns the scatter payload —
    ``gidx`` [B,Q,M,P,4] GLOBAL flat padded-grid cell ids (this level's
    cells live at [base, base + B*M*(h+2)*(w+2))) and ``rows``
    [B,Q,M,P,4,C] corner contributions — so the caller can emit ONE
    scatter-add per chunk across all levels and corners (XLA lowers
    each scatter op as a serial pass over the whole target, so fewer,
    bigger scatters win; measured 4-5x on the chained-per-corner form).
    """
    dt = vt.dtype
    b, m, h2, w2, c = vt.shape
    y0i, x0i, (w00, w01, w10, w11), (lx, ly, ok) = _window_coords(
        loc_xy, h, w, dt)
    win = _window_gather(vt, y0i, x0i)              # [B,Q,M,P,2,2,C]

    # dout contracted with each corner: g_ij[bqmp] = <dout_bqm, v_ij>.
    # The channel reduction accumulates in fp32 (like the forward's
    # preferred_element_type) so bf16 inputs don't degrade dloc/dwgt.
    gdot = jnp.einsum("bqmc,bqmpijc->bqmpij", dout, win,
                      preferred_element_type=jnp.float32)
    g00, g01 = gdot[..., 0, 0], gdot[..., 0, 1]
    g10, g11 = gdot[..., 1, 0], gdot[..., 1, 1]

    ws = jnp.stack([jnp.stack([w00, w01], -1),
                    jnp.stack([w10, w11], -1)], -2)  # [B,Q,M,P,2,2]
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

    # dvalue payload: (w_ij * wgt) * dout per corner.  Cell ids are
    # LOCAL to each (b, m) group — the caller assembles slab-relative
    # ids so each scatter's target stays on XLA's fast path.
    r = wgt.astype(dt)[..., None] * dout[:, :, :, None, :]
    rows = ws.astype(dt).reshape(ws.shape[:4] + (4,))[..., None] * \
        r[:, :, :, :, None, :]                      # [B,Q,M,P,4,C]
    cell00 = y0i * w2 + x0i
    lidx = cell00[..., None] + jnp.asarray(
        [0, 1, w2, w2 + 1], jnp.int32) + base       # [B,Q,M,P,4]
    return dloc, dwgt.astype(wgt.dtype), lidx, rows


def _unpad_level_grid(dvt: jnp.ndarray) -> jnp.ndarray:
    """[B, M, h+2, w+2, C] padded-grid grads -> [B, h*w, M, C]."""
    b, m, h2, w2, c = dvt.shape
    core = dvt[:, :, 1:h2 - 1, 1:w2 - 1]
    return core.transpose(0, 2, 3, 1, 4).reshape(
        b, (h2 - 2) * (w2 - 2), m, c)


def _attn_all_levels(pvals, spatial_shapes, loc, weight):
    """[B, Q, M, L, P, 2] locations -> [B, Q, M, C] over padded grids."""
    dt = pvals[0].dtype
    bsz, m = pvals[0].shape[0], pvals[0].shape[1]
    q, c = loc.shape[1], pvals[0].shape[-1]
    out = jnp.zeros((bsz, q, m, c), dt)
    for lvl, (h, w) in enumerate(spatial_shapes):
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
# DISTILLBEV_ATTN_MAX_GATHER_ROWS (log2 values make sense: 17-20).
import os as _os
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
    pvals = _split_levels(value, spatial_shapes)
    # per-(b, m) padded cell count and per-level local offsets
    lbases, cells_bm = [], 0
    for h, w in spatial_shapes:
        lbases.append(cells_bm)
        cells_bm += (h + 2) * (w + 2)
    bm = bsz * m
    grp = max(1, _MAX_SCATTER_TARGET_ROWS // cells_bm)
    n_slabs = -(-bm // grp)
    slab_bm = [min(grp, bm - s * grp) for s in range(n_slabs)]
    acc0 = tuple(jnp.zeros((gbm * cells_bm, c), jnp.float32)
                 for gbm in slab_bm)

    def chunk_bwd(dval_acc, args):
        locc, wgtc, gc = args
        idxs, rows_, dls, dws = [], [], [], []
        for lvl, (h, w) in enumerate(spatial_shapes):
            dl, dw, lidx, rr = _bilinear_sample_grads(
                pvals[lvl], locc[:, :, :, lvl], wgtc[:, :, :, lvl],
                gc, h, w, lbases[lvl])
            # [B, Qc, M, P, 4] -> [B*M, Qc*P*4] bm-major
            idxs.append(lidx.transpose(0, 2, 1, 3, 4).reshape(bm, -1))
            rows_.append(rr.transpose(0, 2, 1, 3, 4, 5).reshape(
                bm, -1, c))
            dls.append(dl)
            dws.append(dw)
        idx_bm = jnp.concatenate(idxs, axis=1)
        row_bm = jnp.concatenate(rows_, axis=1).astype(jnp.float32)
        # one small-target scatter per slab (stays on XLA's fast path)
        new_acc = []
        for s, (acc_s, gbm) in enumerate(zip(dval_acc, slab_bm)):
            i0 = s * grp
            rel = jnp.arange(gbm, dtype=jnp.int32)[:, None] * cells_bm
            idx_s = (idx_bm[i0:i0 + gbm] + rel).reshape(-1)
            new_acc.append(acc_s.at[idx_s].add(
                row_bm[i0:i0 + gbm].reshape(-1, c)))
        return tuple(new_acc), (jnp.stack(dls, axis=3),
                                jnp.stack(dws, axis=3))

    dval_slabs, (dlocs, dwgts) = jax.lax.scan(chunk_bwd, acc0,
                                              (locs, wgts, gs))
    dval_bm = jnp.concatenate(dval_slabs).reshape(bsz, m, cells_bm, c)
    parts = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        grid = dval_bm[:, :, lbases[lvl]:lbases[lvl] +
                       (h + 2) * (w + 2)].reshape(
            bsz, m, h + 2, w + 2, c)
        parts.append(_unpad_level_grid(grid))
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
