"""Scatter pillar features to a dense BEV canvas.

Capability parity with the reference's ``PointPillarsScatter``
(reference: mmdet3d/models/middle_encoders/pillar_scatter.py:10-102).

TPU-native: the reference loops over batch samples and index_puts into an
NCHW canvas; here one NARROW int32 scatter builds the inverse index
(canvas cell -> pillar row) and a gather materializes the channels-last
``[B, ny, nx, C]`` canvas — voxel coords are unique per sample, so the
inverse index is collision-free.  Scattering the feature rows directly
costs 7.2 ms at flagship sizes (TPU scatter pays per update row
regardless of who wins); the int-scatter + gather form is 0.8 ms.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builder import MIDDLE_ENCODERS


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _scatter_canvas(voxel_feats_flat, flat_cells, n_cells: int):
    """[BV, C] rows -> [n_cells, C] canvas via inverse-index gather.
    flat_cells == n_cells marks dropped rows.  Custom VJP keeps the
    backward a plain gather (autodiff of the gather would emit a
    BV-update-row scatter-add)."""
    bv, c = voxel_feats_flat.shape
    rows = jnp.arange(bv, dtype=jnp.int32)
    inv = jnp.full((n_cells + 1,), bv, jnp.int32).at[
        flat_cells].set(rows, mode="drop")[:-1]
    feats = jnp.concatenate(
        [voxel_feats_flat, jnp.zeros((1, c), voxel_feats_flat.dtype)],
        axis=0)
    return feats[jnp.minimum(inv, bv)]


def _scatter_canvas_fwd(voxel_feats_flat, flat_cells, n_cells):
    return _scatter_canvas(voxel_feats_flat, flat_cells, n_cells), \
        flat_cells


def _scatter_canvas_bwd(n_cells, flat_cells, g):
    dv = g[jnp.minimum(flat_cells, n_cells - 1)]
    dv = jnp.where((flat_cells < n_cells)[:, None], dv, 0.0)
    return dv.astype(g.dtype), None


_scatter_canvas.defvjp(_scatter_canvas_fwd, _scatter_canvas_bwd)


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
        canvas = _scatter_canvas(voxel_feats.reshape(-1, c),
                                 flat.reshape(-1), b * ny * nx)
        return canvas.reshape(b, ny, nx, c)
