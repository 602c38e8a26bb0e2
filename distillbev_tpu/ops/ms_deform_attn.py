"""Multi-scale deformable attention sampling core.

Capability parity with the mmcv CUDA extension the reference loads
(reference: mmdet3d/models/transformer_modules/
multi_scale_deformable_attn_function.py:1-162 — `_ext.ms_deform_attn_forward`
/ `backward`, used by BEVFormer's spatial cross-attention, temporal
self-attention and the DETR decoders).

TPU-native design: the CUDA kernel is a per-thread gather + bilinear
interpolation + weighted accumulation with a hand-written backward.  Here
the same math is expressed as 4 batched gathers (`take_along_axis` on the
flattened spatial axis) + VPU-fused lerp + an einsum contraction over
(levels x points), all statically shaped per level — XLA differentiates it
exactly (bilinear sampling is piecewise-linear, so autodiff reproduces the
CUDA backward), fuses the lerp chain, and maps the final contraction onto
the MXU.  Out-of-range samples contribute zero, matching the align_corners
=False zero-padding border semantics of the reference kernel.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _bilinear_gather(value: jnp.ndarray,
                     loc_xy: jnp.ndarray,
                     h: int, w: int) -> jnp.ndarray:
    """Bilinear sample with zero padding outside.

    Args:
        value: [B, H*W, M, C] one level's features (M = heads).
        loc_xy: [B, Q, M, P, 2] normalized sampling locations in [0, 1]
            (align_corners=False pixel convention: x_pix = x*W - 0.5).
        h, w: static spatial dims of this level.

    Returns: [B, Q, M, P, C]
    """
    bsz, _, m, c = value.shape
    x = loc_xy[..., 0] * w - 0.5
    y = loc_xy[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def corner(yi, xi):
        ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        flat = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        # flat: [B, Q, M, P] -> gather rows of value's spatial axis
        bq = flat.shape[1] * flat.shape[3]
        idx = flat.transpose(0, 2, 1, 3).reshape(bsz, m, -1)  # [B,M,Q*P]
        v = jnp.take_along_axis(
            value.transpose(0, 2, 1, 3),          # [B, M, H*W, C]
            idx[..., None], axis=2)               # [B, M, Q*P, C]
        v = v.reshape(bsz, m, flat.shape[1], flat.shape[3], c)
        v = v.transpose(0, 2, 1, 3, 4)            # [B, Q, M, P, C]
        return jnp.where(ok[..., None], v, 0.0)

    # lerp weights in the VALUE dtype: sampling locations are forced
    # fp32 (reference point_sampling semantics), and fp32 weights would
    # promote every [B,Q,M,P,C] corner product — under bf16 mixed
    # precision that doubles the largest attention temps in HBM
    dt = value.dtype
    w00 = ((1 - lx) * (1 - ly)).astype(dt)
    w01 = (lx * (1 - ly)).astype(dt)
    w10 = ((1 - lx) * ly).astype(dt)
    w11 = (lx * ly).astype(dt)
    out = (corner(y0i, x0i) * w00[..., None] +
           corner(y0i, x0i + 1) * w01[..., None] +
           corner(y0i + 1, x0i) * w10[..., None] +
           corner(y0i + 1, x0i + 1) * w11[..., None])
    return out


def _bilinear_gather_bwd(value, loc_xy, wgt, dout, h, w):
    """Hand-derived backward of (bilinear gather x attention weight)
    for one level: returns (dvalue, dloc_xy, dwgt).

    value [B,HW,M,C]; loc_xy [B,Q,M,P,2]; wgt [B,Q,M,P];
    dout [B,Q,M,C].  Mirrors the reference CUDA backward
    (multi_scale_deformable_attn_function.py / ms_deform_attn_backward):
    everything is recomputed here, nothing saved from the forward.
    """
    bsz, hw, m, c = value.shape
    x = loc_xy[..., 0] * w - 0.5
    y = loc_xy[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = (x - x0).astype(value.dtype)
    ly = (y - y0).astype(value.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    value_t = value.transpose(0, 2, 1, 3)              # [B,M,HW,C]
    q, p = x.shape[1], x.shape[3]

    def corner_vals(yi, xi):
        ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        flat = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        idx = flat.transpose(0, 2, 1, 3).reshape(bsz, m, -1)
        v = jnp.take_along_axis(value_t, idx[..., None], axis=2)
        v = v.reshape(bsz, m, q, p, c).transpose(0, 2, 1, 3, 4)
        return jnp.where(ok[..., None], v, 0.0), ok, flat

    corners = [corner_vals(y0i, x0i), corner_vals(y0i, x0i + 1),
               corner_vals(y0i + 1, x0i), corner_vals(y0i + 1, x0i + 1)]
    ws = [(1 - lx) * (1 - ly), lx * (1 - ly),
          (1 - lx) * ly, lx * ly]
    dws_dx = [-(1 - ly), (1 - ly), -ly, ly]
    dws_dy = [-(1 - lx), -lx, (1 - lx), lx]

    # dout contracted with each corner: g_c[bqmp] = <dout_bqm, v_c>.
    # The channel reduction accumulates in fp32 (like the forward's
    # preferred_element_type) so bf16 inputs don't degrade dloc/dwgt.
    gdot = [jnp.einsum("bqmc,bqmpc->bqmp", dout, v,
                       preferred_element_type=jnp.float32)
            for (v, _, _) in corners]
    sampled_dot = sum(wc.astype(jnp.float32) * gc
                      for wc, gc in zip(ws, gdot))
    dwgt = sampled_dot                                  # [B,Q,M,P] fp32

    wgt_t = wgt.astype(value.dtype)
    wgt_f = wgt.astype(jnp.float32)
    dx = sum(dwx.astype(jnp.float32) * gc
             for dwx, gc in zip(dws_dx, gdot)) * wgt_f
    dy = sum(dwy.astype(jnp.float32) * gc
             for dwy, gc in zip(dws_dy, gdot)) * wgt_f
    dloc = jnp.stack([dx * w, dy * h], axis=-1).astype(loc_xy.dtype)

    # dvalue: scatter-add w_c * wgt * dout rows into each corner cell
    dval_t = jnp.zeros((bsz, m, hw, c), jnp.float32)
    rows_base = jnp.einsum("bqmp,bqmc->bmqpc", wgt_t, dout)
    for (v, ok, flat), wc in zip(corners, ws):
        rows = rows_base * wc.transpose(0, 2, 1, 3)[..., None]
        idx = jnp.where(ok, flat, hw).transpose(0, 2, 1, 3)
        dval_t = dval_t.at[
            jnp.arange(bsz)[:, None, None],
            jnp.arange(m)[None, :, None],
            idx.reshape(bsz, m, -1)].add(
            rows.reshape(bsz, m, -1, c).astype(jnp.float32),
            mode="drop")
    dvalue = dval_t.transpose(0, 2, 1, 3).astype(value.dtype)
    return dvalue, dloc, dwgt.astype(wgt.dtype)


def _attn_all_levels(value, spatial_shapes, loc, weight):
    """[B, Q, M, L, P, 2] locations -> [B, Q, M, C] for all levels."""
    bsz, _, m, c = value.shape
    q = loc.shape[1]
    out = jnp.zeros((bsz, q, m, c), value.dtype)
    offset = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = jax.lax.dynamic_slice_in_dim(value, offset, h * w, axis=1)
        sampled = _bilinear_gather(v, loc[:, :, :, lvl], h, w)
        # keep the sampled temp in the value dtype (fp32 softmax weights
        # would promote the [B,Q,M,P,C] buffer — under bf16 mixed
        # precision that doubles the largest attention temps); the P-axis
        # reduction accumulates fp32 via preferred_element_type
        out = out + jnp.einsum(
            "bqmpc,bqmp->bqmc", sampled,
            weight[:, :, :, lvl].astype(value.dtype),
            preferred_element_type=jnp.float32).astype(value.dtype)
        offset += h * w
    return out


# peak gather temp is [B*M*Qc*P, C] per corner; cap the row count so the
# (8,128)-tile padded buffers stay small even at BEVFormer-SCA sizes
# (B*Q*M*P can reach 10M rows at bev 200x200 — unchunked, those temps
# OOM a 16 GB chip in the backward).  At head_dim=32 the lane padding
# is 4x, so each corner's backward scatter payload is rows*128*4 B of
# fp32: 2^18 rows -> ~80 MB per corner (~0.7 GB live in the while
# body), measured to fit the FULL-SIZE BEVFormer distill step beside
# the rest of the graph on one 16 GB v5e.  Chunks stay large enough
# that the gather/MXU work amortizes the loop overhead.  Override with
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
    if n_chunks == 1:
        return _attn_all_levels(value, spatial_shapes, loc, weight)
    (locs, wgts), qc = _chunk_qaxis([loc, weight], q, n_chunks)
    out = jax.lax.map(
        lambda lw: _attn_all_levels(value, spatial_shapes, lw[0], lw[1]),
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


def _attn_cvjp_bwd(spatial_shapes, res, g):
    value, loc, weight = res
    bsz, hw_total, m, c = value.shape
    q, num_levels, p = loc.shape[1], loc.shape[3], loc.shape[4]
    rows = bsz * q * m * p
    n_chunks = max(1, -(-rows // _MAX_GATHER_ROWS))
    (locs, wgts, gs), qc = _chunk_qaxis([loc, weight, g], q, n_chunks)

    def chunk_bwd(dval_acc, args):
        locc, wgtc, gc = args
        dval_c = jnp.zeros((bsz, hw_total, m, c), jnp.float32)
        dls, dws = [], []
        offset = 0
        for lvl, (h, w) in enumerate(spatial_shapes):
            v = jax.lax.dynamic_slice_in_dim(value, offset, h * w,
                                             axis=1)
            dv, dl, dw = _bilinear_gather_bwd(
                v, locc[:, :, :, lvl], wgtc[:, :, :, lvl], gc, h, w)
            dval_c = jax.lax.dynamic_update_slice_in_dim(
                dval_c,
                jax.lax.dynamic_slice_in_dim(
                    dval_c, offset, h * w, axis=1) + dv.astype(
                    jnp.float32),
                offset, axis=1)
            dls.append(dl)
            dws.append(dw)
            offset += h * w
        return dval_acc + dval_c, (jnp.stack(dls, axis=3),
                                   jnp.stack(dws, axis=3))

    dval, (dlocs, dwgts) = jax.lax.scan(
        chunk_bwd, jnp.zeros((bsz, hw_total, m, c), jnp.float32),
        (locs, wgts, gs))
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
