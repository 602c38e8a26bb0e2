"""RoIAlign on feature maps, TPU-native.

Equivalent of the mmcv CUDA ``RoIAlign`` the reference re-exports
(reference: mmdet3d/ops/__init__.py:2-5).  The CUDA kernel loops
threads over (roi, channel, bin, sample); here the whole op is one
vectorized bilinear gather — static shapes, no atomics, autodiff
backward.

Matches mmcv/torchvision semantics: ``aligned=True`` shifts sample
coordinates by -0.5 (pixel-center alignment); samples falling outside
[-1, H] x [-1, W] contribute zero; in-range coordinates are clamped to
the border before the 4-tap bilinear read.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _bilinear(features: jnp.ndarray, batch_idx: jnp.ndarray,
              y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Sample features [B, C, H, W] at (y, x) per roi -> [K, S, C]."""
    h, w = features.shape[2], features.shape[3]
    outside = (y < -1.0) | (y > h) | (x < -1.0) | (x > w)
    y = jnp.clip(y, 0.0, h - 1)
    x = jnp.clip(x, 0.0, w - 1)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly, lx = y - y0, x - x0
    hy, hx = 1.0 - ly, 1.0 - lx

    feats = jnp.transpose(features, (0, 2, 3, 1))          # [B, H, W, C]
    bidx = batch_idx[:, None]                              # [K, 1]

    def tap(yy, xx):
        return feats[bidx, yy, xx]                         # [K, S, C]

    val = (tap(y0, x0) * (hy * hx)[..., None] +
           tap(y0, x1) * (hy * lx)[..., None] +
           tap(y1, x0) * (ly * hx)[..., None] +
           tap(y1, x1) * (ly * lx)[..., None])
    return jnp.where(outside[..., None], 0.0, val)


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio",
                                   "aligned", "pool_mode"))
def roi_align(features: jnp.ndarray,
              rois: jnp.ndarray,
              output_size: int | tuple,
              spatial_scale: float = 1.0,
              sampling_ratio: int = 2,
              aligned: bool = True,
              pool_mode: str = "avg") -> jnp.ndarray:
    """RoIAlign over a batched feature map.

    Args:
        features: [B, C, H, W].
        rois: [K, 5] rows of (batch_idx, x1, y1, x2, y2) in input coords.
        output_size: int or (out_h, out_w).
        spatial_scale: multiply roi coords by this to reach feature coords.
        sampling_ratio: samples per bin edge (static; mmcv's adaptive
            ``<=0`` mode is dynamic-shaped, so a positive value is
            required here — 2 matches its typical resolved value).
        aligned: half-pixel alignment (mmcv default True).
        pool_mode: 'avg' | 'max' over the per-bin samples.

    Returns [K, C, out_h, out_w] float32.
    """
    if sampling_ratio <= 0:
        raise ValueError("sampling_ratio must be static positive on TPU")
    out_h, out_w = ((output_size, output_size)
                    if isinstance(output_size, int) else output_size)
    sr = sampling_ratio
    rois = rois.astype(jnp.float32)
    batch_idx = rois[:, 0].astype(jnp.int32)
    offset = 0.5 if aligned else 0.0
    x1 = rois[:, 1] * spatial_scale - offset
    y1 = rois[:, 2] * spatial_scale - offset
    x2 = rois[:, 3] * spatial_scale - offset
    y2 = rois[:, 4] * spatial_scale - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:                                        # legacy: min 1
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_w = roi_w / out_w                                  # [K]
    bin_h = roi_h / out_h

    # sample offsets within a bin: (s + 0.5) / sr for s in [0, sr)
    sub = (jnp.arange(sr, dtype=jnp.float32) + 0.5) / sr   # [sr]
    gy = (jnp.arange(out_h, dtype=jnp.float32)[:, None] +
          sub[None, :]).reshape(-1)                        # [out_h*sr]
    gx = (jnp.arange(out_w, dtype=jnp.float32)[:, None] +
          sub[None, :]).reshape(-1)                        # [out_w*sr]
    ys = y1[:, None] + bin_h[:, None] * gy[None, :]        # [K, out_h*sr]
    xs = x1[:, None] + bin_w[:, None] * gx[None, :]        # [K, out_w*sr]
    yy = jnp.repeat(ys, gx.shape[0], axis=1)               # [K, S]
    xx = jnp.tile(xs, (1, gy.shape[0]))

    samples = _bilinear(features, batch_idx, yy, xx)       # [K, S, C]
    k, _, c = samples.shape
    samples = samples.reshape(k, out_h, sr, out_w, sr, c)
    if pool_mode == "avg":
        pooled = samples.mean(axis=(2, 4))
    elif pool_mode == "max":
        pooled = samples.max(axis=(2, 4))
    else:
        raise ValueError(f"unknown pool_mode {pool_mode!r}")
    return jnp.transpose(pooled, (0, 3, 1, 2))             # [K, C, h, w]
