"""Voxel feature encoders (non-pillar family).

Capability parity with the reference VFEs
(reference: mmdet3d/models/voxel_encoders/voxel_encoder.py —
HardSimpleVFE:14 (mean over points), DynamicSimpleVFE:49,
DynamicVFE:88, HardVFE:288; dynamic_voxel_encoder.py:71
DynamicVoxelEncoder wrapping dynamic voxelization + VFE for MVPFormer).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..builder import VOXEL_ENCODERS
from ..layers import make_norm
from ...ops.scatter import scatter_reduce
from ...ops.voxelize import compute_voxel_coords, unique_voxels


@VOXEL_ENCODERS.register_module()
class HardSimpleVFE(nn.Module):
    """Mean of points per voxel (reference voxel_encoder.py:14-46)."""
    num_features: int = 4

    @nn.compact
    def __call__(self, voxels, num_points, coords, voxel_mask,
                 train: bool = False):
        """voxels [B, V, P, C] -> [B, V, num_features]."""
        p = voxels.shape[2]
        pm = (jnp.arange(p)[None, None, :] < num_points[..., None])
        cnt = jnp.maximum(num_points, 1)[..., None].astype(voxels.dtype)
        mean = jnp.where(pm[..., None], voxels[..., :self.num_features],
                         0.0).sum(axis=2) / cnt
        return jnp.where(voxel_mask[..., None], mean, 0.0)


@VOXEL_ENCODERS.register_module()
class DynamicSimpleVFE(nn.Module):
    """Scatter-mean of raw point features (reference :49-85)."""
    voxel_size: Sequence[float] = (0.2, 0.2, 4)
    point_cloud_range: Sequence[float] = (0, -40, -3, 70.4, 40, 1)

    @nn.compact
    def __call__(self, points, point2voxel, coords, max_voxels: int,
                 valid=None, train: bool = False):
        ok = point2voxel < max_voxels
        if valid is not None:
            ok = ok & valid
        p2v = jnp.where(ok, point2voxel, max_voxels)
        return scatter_reduce(points, p2v, max_voxels, "mean")


@VOXEL_ENCODERS.register_module()
class DynamicVFE(nn.Module):
    """Full dynamic VFE: decorations + per-point MLP layers with
    voxel-max concat, final scatter-max (reference :88-285)."""
    in_channels: int = 4
    feat_channels: Sequence[int] = (64,)
    with_distance: bool = False
    with_cluster_center: bool = True
    with_voxel_center: bool = True
    voxel_size: Sequence[float] = (0.2, 0.2, 4)
    point_cloud_range: Sequence[float] = (0, -40, -3, 70.4, 40, 1)
    norm_cfg: Any = None
    mode: str = "max"

    @nn.compact
    def __call__(self, points, point2voxel, coords, max_voxels: int,
                 valid=None, train: bool = False):
        ok = point2voxel < max_voxels
        if valid is not None:
            ok = ok & valid
        idx = jnp.clip(point2voxel, 0, max_voxels - 1)
        feats = points
        decorations = [feats]
        if self.with_cluster_center:
            vmean = scatter_reduce(feats[:, :3], point2voxel, max_voxels,
                                   "mean")
            decorations.append(feats[:, :3] - vmean[idx])
        if self.with_voxel_center:
            vs = self.voxel_size
            pcr = self.point_cloud_range
            cxyz = coords[idx].astype(feats.dtype)
            centers = jnp.stack([
                cxyz[:, 2] * vs[0] + vs[0] / 2 + pcr[0],
                cxyz[:, 1] * vs[1] + vs[1] / 2 + pcr[1],
                cxyz[:, 0] * vs[2] + vs[2] / 2 + pcr[2]], axis=-1)
            decorations.append(feats[:, :3] - centers)
        if self.with_distance:
            decorations.append(jnp.linalg.norm(feats[:, :3], axis=-1,
                                               keepdims=True))
        x = jnp.concatenate(decorations, axis=-1)
        x = jnp.where(ok[:, None], x, 0.0)
        for i, ch in enumerate(self.feat_channels):
            last = i == len(self.feat_channels) - 1
            x = nn.Dense(ch, use_bias=False, name=f"linear_{i}")(x)
            norm = make_norm(dict(self.norm_cfg)
                             if self.norm_cfg else None)(name=f"norm_{i}")
            x = norm(x, use_running_average=not train, mask=ok)
            x = nn.relu(x)
            if not last:
                vmax = scatter_reduce(x, jnp.where(ok, point2voxel,
                                                   max_voxels),
                                      max_voxels, "max")
                x = jnp.concatenate([x, vmax[idx]], axis=-1)
        return scatter_reduce(x, jnp.where(ok, point2voxel, max_voxels),
                              max_voxels, self.mode)


@VOXEL_ENCODERS.register_module()
class HardVFE(nn.Module):
    """Hard-voxelized full VFE (reference :288-420)."""
    in_channels: int = 4
    feat_channels: Sequence[int] = (64,)
    with_distance: bool = False
    with_cluster_center: bool = True
    with_voxel_center: bool = True
    voxel_size: Sequence[float] = (0.2, 0.2, 4)
    point_cloud_range: Sequence[float] = (0, -40, -3, 70.4, 40, 1)
    norm_cfg: Any = None

    @nn.compact
    def __call__(self, voxels, num_points, coords, voxel_mask,
                 train: bool = False):
        b, v, p, _ = voxels.shape
        pm = (jnp.arange(p)[None, None, :] < num_points[..., None]) & \
            voxel_mask[..., None]
        feats = voxels
        decorations = [feats]
        if self.with_cluster_center:
            cnt = jnp.maximum(num_points, 1)[..., None].astype(
                feats.dtype)
            mean = jnp.where(pm[..., None], feats[..., :3],
                             0.0).sum(axis=2) / cnt
            decorations.append(feats[..., :3] - mean[:, :, None, :])
        if self.with_voxel_center:
            vs, pcr = self.voxel_size, self.point_cloud_range
            cz = coords[..., 0].astype(feats.dtype)
            cy = coords[..., 1].astype(feats.dtype)
            cx = coords[..., 2].astype(feats.dtype)
            centers = jnp.stack([
                cx * vs[0] + vs[0] / 2 + pcr[0],
                cy * vs[1] + vs[1] / 2 + pcr[1],
                cz * vs[2] + vs[2] / 2 + pcr[2]], axis=-1)
            decorations.append(feats[..., :3] - centers[:, :, None, :])
        if self.with_distance:
            decorations.append(jnp.linalg.norm(feats[..., :3], axis=-1,
                                               keepdims=True))
        x = jnp.concatenate(decorations, axis=-1)
        x = jnp.where(pm[..., None], x, 0.0)
        for i, ch in enumerate(self.feat_channels):
            last = i == len(self.feat_channels) - 1
            x = nn.Dense(ch, use_bias=False, name=f"linear_{i}")(x)
            norm = make_norm(dict(self.norm_cfg)
                             if self.norm_cfg else None)(name=f"norm_{i}")
            x = norm(x, use_running_average=not train, mask=pm)
            x = nn.relu(x)
            neg = jnp.finfo(x.dtype).min
            pooled = jnp.max(jnp.where(pm[..., None], x, neg), axis=2)
            pooled = jnp.where(pm.any(axis=2)[..., None], pooled, 0.0)
            if not last:
                rep = jnp.broadcast_to(pooled[:, :, None],
                                       x.shape[:3] + (ch,))
                x = jnp.concatenate([x, rep], axis=-1)
            else:
                x = pooled
        return jnp.where(voxel_mask[..., None], x, 0.0)


@VOXEL_ENCODERS.register_module()
class DynamicVoxelEncoder(nn.Module):
    """Dynamic voxelization + VFE in one call (reference
    dynamic_voxel_encoder.py:71-120, used by MVPFormer).  Returns
    (voxel_feats [V, C], voxel_coords [V, 3], num_voxels)."""
    voxel_layer: Any = None          # dict(voxel_size, point_cloud_range)
    voxel_encoder: Any = None        # VFE cfg
    max_voxels: int = 60000

    @nn.compact
    def __call__(self, points, valid, train: bool = False):
        from ..builder import build_voxel_encoder
        vl = dict(self.voxel_layer)
        vs = tuple(vl["voxel_size"])
        pcr = tuple(vl["point_cloud_range"])
        grid_xyz = np.floor(
            (np.asarray(pcr[3:]) - np.asarray(pcr[:3])) /
            np.asarray(vs) + 0.5).astype(np.int32)
        grid_zyx = jnp.asarray(grid_xyz[::-1].copy())
        coords, in_range = compute_voxel_coords(points, vs, pcr)
        ok = in_range & valid
        p2v, vcoords, nvox = unique_voxels(coords, ok, grid_zyx,
                                           self.max_voxels)
        vfe = build_voxel_encoder(dict(self.voxel_encoder))
        feats = vfe(points, p2v, vcoords, self.max_voxels, valid=ok,
                    train=train)
        return feats, vcoords, nvox
