"""Scatter pillar features to a dense BEV canvas.

Capability parity with the reference's ``PointPillarsScatter``
(reference: mmdet3d/models/middle_encoders/pillar_scatter.py:10-102).

TPU-native: the reference loops over batch samples and index_puts into an
NCHW canvas; here a single unique-index scatter writes every sample's
pillars into the channels-last ``[B, ny, nx, C]`` canvas at once — voxel
coords are unique per sample, so the scatter is collision-free.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..builder import MIDDLE_ENCODERS


@MIDDLE_ENCODERS.register_module()
class PointPillarsScatter(nn.Module):
    in_channels: int = 64
    output_shape: Sequence[int] = (512, 512)   # (ny, nx)

    @nn.compact
    def __call__(self, voxel_feats, coords, voxel_mask):
        """voxel_feats [B, V, C]; coords [B, V, 3] (z, y, x);
        voxel_mask [B, V] -> canvas [B, ny, nx, C]."""
        b, v, c = voxel_feats.shape
        ny, nx = self.output_shape
        batch_idx = jnp.broadcast_to(
            jnp.arange(b, dtype=jnp.int32)[:, None], (b, v))
        flat = (batch_idx * ny + coords[..., 1]) * nx + coords[..., 2]
        flat = jnp.where(voxel_mask, flat, b * ny * nx)
        canvas = jnp.zeros((b * ny * nx + 1, c), voxel_feats.dtype)
        canvas = canvas.at[flat.reshape(-1)].set(
            voxel_feats.reshape(-1, c), mode="drop")
        return canvas[:-1].reshape(b, ny, nx, c)
