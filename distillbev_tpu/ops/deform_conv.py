"""Modulated deformable convolution v2 (DCNv2) — TPU-native.

Capability parity with the reference's mmcv ``ModulatedDeformConv2dPack``
sites (reference: centerpoint_head.py:125-243 DCN feature adaptation,
view_transformer_mine.py:298-308 depth-net DCN stage; CUDA kernel in
mmcv/ops/modulated_deform_conv.py).

TPU-native formulation: instead of the CUDA per-pixel im2col gather
kernel, the K = kh*kw sampling locations are evaluated with the shared
bilinear sampler (4 vectorized corner gathers over the flattened spatial
axis), modulation is a broadcast multiply, and the conv itself becomes a
single ``[B*H*W, K*C] x [K*C, C_out]`` matmul on the MXU.  Everything is
static-shape and fully differentiable (gathers transpose to scatters in
the VJP automatically).

Small input grids additionally take a dense separable-lerp matmul path
(same trick as ops/ms_deform_attn's small FPN levels, docs/PERF.md):
bilinear lerp weights factorize per axis (w = wy(y)*wx(x)), and the
per-axis OOB mask factorizes too, so sampling all K taps of all output
pixels is ONE MXU matmul ``lhs[(q*K) rows, cells] @ grid[cells, C]``
with modulation folded into the lhs build — and the backward's dvalue
is ``lhs^T @ dout``, NO scatter.  Gathers pay random-row HBM latency
fwd AND a slower scatter-add bwd.  Measured at the flagship depth-net
shape ([24, 16, 44, 256], K=9, bf16) the two are a WASH in isolation
(fwd+bwd 4.46 vs 4.42 ms/call) but the dense path wins ~19 ms/step
IN-GRAPH (the gather backward lowers to four per-corner scatter-add
fusions at ~60M rows/s, docs/PERF.md r4 lever 1), so the gate defaults
ON: ``DISTILLBEV_DCN_DENSE_MAX_CELLS`` default 1024 — cells (h*w of
the sampled grid) up to that bound take the dense path, larger grids
gather; a 2^28-element lhs guard caps dense memory.  Set to 0 to force
the gather path everywhere.  Both paths are parity-tested.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from .grid_sample import bilinear_sample_pixels

def _dense_max_cells() -> int:
    """Ceiling for the dense separable-lerp path, read lazily so
    setting DISTILLBEV_DCN_DENSE_MAX_CELLS after import takes effect.

    Default 1024 covers the flagship depth-net grid (16x44 -> 828
    padded cells).  The round-3 ISOLATED microbench scored dense vs
    gather a wash (4.46 vs 4.42 ms fwd+bwd at [24, 16, 44, 256]), but
    IN-STEP the gather path's backward lowers to four per-corner
    [152k, 256] scatter-adds at ~60M rows/s (~10 ms/step) plus 8
    corner-gather fusions (~9 ms/step) that the matmul path replaces
    with MXU work: bench.py measured 16.94 -> 18.45 samples/s
    (236.1 -> 216.8 ms) flipping this on (docs/PERF.md round 4)."""
    return int(os.environ.get("DISTILLBEV_DCN_DENSE_MAX_CELLS", 1024))


def _axis_weights(t: jnp.ndarray, n: int, dt) -> jnp.ndarray:
    """Per-axis lerp weight rows: ``t [...]`` pixel coords ->
    ``[..., n+2]`` two-hot rows on the 1px-zero-padded axis.  Matches
    bilinear_sample_pixels' per-corner OOB zeroing: a corner is live iff
    floor(t) is in [-1, n-1] (the padded cells 0 and n+1 are zeros, so a
    half-out sample reads real data on one side and zero on the other).
    Built as two one-hot compares — an einsum/matmul here would hit the
    batched-tiny-matmul pathology (docs/PERF.md)."""
    t0 = jnp.floor(t)
    l = (t - t0).astype(dt)
    ok = (t0 >= -1) & (t0 <= n - 1)
    t0i = jnp.clip(t0, -1, n - 1).astype(jnp.int32) + 1
    z = jnp.zeros_like(l)
    idx = jnp.arange(n + 2, dtype=jnp.int32)
    return (jnp.where(idx == t0i[..., None],
                      jnp.where(ok, 1 - l, z)[..., None], 0) +
            jnp.where(idx == t0i[..., None] + 1,
                      jnp.where(ok, l, z)[..., None], 0))


def _sample_dense(x: jnp.ndarray, py: jnp.ndarray, px: jnp.ndarray,
                  mask: jnp.ndarray) -> jnp.ndarray:
    """Modulated bilinear sampling as one dense matmul.

    x [B, H, W, C]; py/px [B, R] fp32 pixel coords (R = Ho*Wo*K);
    mask [B, R] modulation.  Returns [B, R, C] == modulated samples.
    """
    b, h, w, c = x.shape
    dt = x.dtype
    grid = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    grid = grid.reshape(b, (h + 2) * (w + 2), c)
    wy = _axis_weights(py, h, dt) * mask.astype(dt)[..., None]
    wx = _axis_weights(px, w, dt)
    lhs = (wy[..., :, None] * wx[..., None, :]).reshape(
        b, -1, (h + 2) * (w + 2))
    return jnp.matmul(
        lhs, grid, preferred_element_type=jnp.float32).astype(dt)


def modulated_deform_conv2d(x: jnp.ndarray,
                            offset: jnp.ndarray,
                            mask: jnp.ndarray,
                            weight: jnp.ndarray,
                            bias: Optional[jnp.ndarray] = None,
                            stride: int = 1,
                            dilation: int = 1) -> jnp.ndarray:
    """DCNv2 forward.

    Args:
        x: [B, H, W, C] input (channels-last).
        offset: [B, Ho, Wo, 2*K] learned offsets, tap-major pairs
            (dy, dx) in row-major kernel order (mmcv channel layout).
        mask: [B, Ho, Wo, K] modulation scalars (already sigmoided).
        weight: [kh, kw, C, C_out].
        bias: optional [C_out].

    Returns [B, Ho, Wo, C_out].
    """
    b, h, w, c = x.shape
    kh, kw, _, c_out = weight.shape
    k = kh * kw
    _, ho, wo, _ = offset.shape
    pad_h = (kh - 1) * dilation // 2
    pad_w = (kw - 1) * dilation // 2

    # base sampling grid per output pixel and tap — coordinates in fp32
    # regardless of feature dtype (bf16 cannot resolve sub-pixel
    # positions at real spatial sizes; the lerp weights downstream cast
    # back to the feature dtype in bilinear_sample_pixels)
    oy = jnp.arange(ho, dtype=jnp.float32) * stride - pad_h
    ox = jnp.arange(wo, dtype=jnp.float32) * stride - pad_w
    ty = jnp.repeat(jnp.arange(kh, dtype=jnp.float32) * dilation, kw)
    tx = jnp.tile(jnp.arange(kw, dtype=jnp.float32) * dilation, kh)

    off = offset.reshape(b, ho, wo, k, 2).astype(jnp.float32)
    py = oy[None, :, None, None] + ty[None, None, None, :] + off[..., 0]
    px = ox[None, None, :, None] + tx[None, None, None, :] + off[..., 1]

    # Gate on the FULL dense lhs footprint [b, ho*wo*k, cells] as well
    # as the user's per-cell ceiling: the separable-lerp matmul
    # materializes rows*cells lerp weights, so a mid-size grid with many
    # output rows could otherwise blow HBM even when (h+2)*(w+2) alone
    # fits the env-var budget.  2^28 elements = 1 GiB of fp32 lhs.
    dense_lhs_elems = b * ho * wo * k * (h + 2) * (w + 2)
    if ((h + 2) * (w + 2) <= _dense_max_cells()
            and dense_lhs_elems <= 2 ** 28):
        samples = _sample_dense(x, py.reshape(b, -1), px.reshape(b, -1),
                                mask.reshape(b, -1))
        samples = samples.reshape(b, ho, wo, k, c)
    else:
        samples = bilinear_sample_pixels(
            x, px.reshape(b, ho, wo * k), py.reshape(b, ho, wo * k))
        samples = samples.reshape(b, ho, wo, k, c)
        samples = samples * mask[..., None]

    out = jnp.einsum("bhwkc,kco->bhwo", samples,
                     weight.reshape(k, c, c_out),
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out
