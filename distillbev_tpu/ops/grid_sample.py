"""Bilinear grid sampling (torch ``F.grid_sample`` capability).

Used by the temporal BEV warp (reference: bevdet.py shift_feature:267-321
uses grid_sample align_corners=True) and image-space warps.  Channels-last,
zero padding outside, differentiable.
"""
from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample_pixels(img: jnp.ndarray, px: jnp.ndarray,
                           py: jnp.ndarray) -> jnp.ndarray:
    """Sample ``img [B, H, W, C]`` at pixel coords ``px, py [B, h, w]``.

    Zero padding outside; exact pixel-coordinate convention (caller maps
    normalized grids to pixels per its align_corners choice).
    """
    b, h, w, c = img.shape
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    # lerp weights in the image dtype: coordinates stay fp32 (bf16
    # cannot resolve sub-pixel positions at real widths) but fp32
    # weights would promote every [.., C] corner product under bf16
    lx = (px - x0).astype(img.dtype)
    ly = (py - y0).astype(img.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def corner(yi, xi):
        ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        flat = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        v = jnp.take_along_axis(
            img.reshape(b, h * w, c),
            flat.reshape(b, -1)[..., None], axis=1)
        v = v.reshape(flat.shape + (c,))
        return jnp.where(ok[..., None], v, jnp.zeros((), v.dtype))

    return (corner(y0i, x0i) * ((1 - lx) * (1 - ly))[..., None] +
            corner(y0i, x0i + 1) * (lx * (1 - ly))[..., None] +
            corner(y0i + 1, x0i) * ((1 - lx) * ly)[..., None] +
            corner(y0i + 1, x0i + 1) * (lx * ly)[..., None])


def grid_sample(img: jnp.ndarray, grid: jnp.ndarray,
                align_corners: bool = True) -> jnp.ndarray:
    """torch-convention grid sample.

    img [B, H, W, C]; grid [B, h, w, 2] normalized (x, y) in [-1, 1].
    """
    b, h, w, c = img.shape
    gx, gy = grid[..., 0], grid[..., 1]
    if align_corners:
        px = (gx + 1) * 0.5 * (w - 1)
        py = (gy + 1) * 0.5 * (h - 1)
    else:
        px = ((gx + 1) * w - 1) * 0.5
        py = ((gy + 1) * h - 1) * 0.5
    return bilinear_sample_pixels(img, px, py)
