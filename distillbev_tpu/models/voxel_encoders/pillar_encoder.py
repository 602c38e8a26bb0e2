"""Pillar voxel-feature encoders.

Capability parity with the reference's pillar VFE family
(reference: mmdet3d/models/voxel_encoders/pillar_encoder.py —
PillarFeatureNet:14, DynamicPillarFeatureNet:166, utils.py PFNLayer).

TPU-native design: batch-first static tensors ``[B, V, P, C]`` (V =
max_voxels, P = max_points) instead of the reference's dynamic
concatenated [N, P, C]; padding handled with masks; BatchNorm is the
masked variant so padded rows don't pollute statistics (the reference's
BN1d counts zero rows — at inference both use running stats, so
checkpoint parity holds).  The MVP ``virtual`` relabeling
(pillar_encoder.py:108-113) is a masked where instead of boolean-index
mutation.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..builder import VOXEL_ENCODERS
from ..layers import make_norm
from ...ops.scatter import scatter_reduce


class PFNLayer(nn.Module):
    """Linear -> masked BN -> ReLU -> masked max-pool over points.

    Setup-based so the dense ``__call__`` (on [B, V, P, C] voxel tensors)
    and the fused ``sorted_call`` (on sorted flat [N, C] points) share the
    same parameters — param tree is identical either way
    (``linear/kernel``, ``norm/...``)."""
    out_channels: int
    norm_cfg: Optional[dict] = None
    last_layer: bool = True
    mode: str = "max"
    # Reference parity quirk (reference utils.py PFNLayer.forward:159-168):
    # the reference max-pools over ALL P slots with no re-mask, so padded
    # slots contribute relu(BN(0)) — a per-channel floor on every pillar
    # that has at least one empty slot.  At eval (running BN stats) that
    # floor is a constant we replicate exactly; train-time BN statistics
    # already diverge by design (ours are masked), so the quirk is
    # eval-only.
    pad_pool_parity: bool = True

    def _pad_floor(self, dtype):
        """relu(BN(0)) per channel under running stats — what a padded
        slot contributes to the reference's max-pool."""
        zero = jnp.zeros((1, self.units), dtype)
        return nn.relu(self.norm(zero, use_running_average=True))[0]

    def setup(self):
        units = self.out_channels if self.last_layer \
            else self.out_channels // 2
        self.units = units
        self.linear = nn.Dense(units, use_bias=False, name="linear")
        self.norm = make_norm(dict(self.norm_cfg)
                              if self.norm_cfg else None)(name="norm")

    def __call__(self, feats, point_mask, train: bool = False):
        """feats [B, V, P, C]; point_mask [B, V, P] bool."""
        units = self.units
        x = self.linear(feats)
        x = self.norm(x, use_running_average=not train, mask=point_mask)
        x = nn.relu(x)
        if self.mode == "max":
            neg = jnp.finfo(x.dtype).min
            pooled = jnp.max(
                jnp.where(point_mask[..., None], x, neg), axis=2)
            pooled = jnp.where(
                point_mask.any(axis=2)[..., None], pooled, 0.0)
            if self.pad_pool_parity and not train and self.last_layer:
                has_pad = ~point_mask.all(axis=2)
                pooled = jnp.where(
                    has_pad[..., None],
                    jnp.maximum(pooled, self._pad_floor(x.dtype)),
                    pooled)
        else:  # avg
            cnt = jnp.maximum(point_mask.sum(axis=2), 1)[..., None]
            pooled = jnp.where(point_mask[..., None], x, 0.0).sum(2) / cnt
        if self.last_layer:
            return pooled
        rep = jnp.broadcast_to(pooled[:, :, None],
                               x.shape[:3] + (units,))
        return jnp.concatenate([x, rep], axis=-1)

    def sorted_call(self, feats, voxel_idx, keep, start_rows, cap: int,
                    num_segments: int, num_points=None,
                    train: bool = False):
        """Fused per-point variant: feats [N, C] sorted by voxel,
        voxel_idx [N] contiguous segment ids, keep [N] bool, start_rows
        [num_segments] physical first row per segment, cap = static
        max kept rows per segment (max_points).

        Returns pooled [num_segments, units] (last layer) or the
        per-point concat [N, 2*units] (intermediate layers) — the same
        math as ``__call__`` on the scattered [B, V, P, C] layout, on
        half the rows, with no scans and no big scatter."""
        from ...ops.segmented import capped_segment_reduce
        x = self.linear(feats)
        x = self.norm(x, use_running_average=not train, mask=keep)
        x = nn.relu(x)
        x = jnp.where(keep[:, None], x, 0.0)
        reduce = "max" if self.mode == "max" else "sum"
        pooled = capped_segment_reduce(x, voxel_idx, start_rows, cap,
                                       num_segments, reduce=reduce,
                                       valid=keep)
        if self.mode != "max" and num_points is not None:
            pooled = pooled / jnp.maximum(num_points, 1).astype(
                pooled.dtype)[:, None]
        if self.pad_pool_parity and not train and self.last_layer and \
                self.mode == "max" and num_points is not None:
            has_pad = num_points < cap
            pooled = jnp.where(
                has_pad[:, None],
                jnp.maximum(pooled, self._pad_floor(x.dtype)),
                pooled)
        if self.last_layer:
            return pooled
        idx = jnp.minimum(voxel_idx, num_segments - 1)
        return jnp.concatenate([x, pooled[idx]], axis=-1)


@VOXEL_ENCODERS.register_module()
class PillarFeatureNet(nn.Module):
    """Hard-voxelized pillar encoder with point decorations.

    Decorations (matching reference ordering): raw features, cluster-center
    offsets (xyz - pillar mean), pillar-center offsets (xy - cell center),
    optional distance.  ``virtual=True`` rewrites the MVP virtual-point
    flag channel: -1 -> 1 for virtual points, real points -> 0.
    """
    in_channels: int = 4
    feat_channels: Sequence[int] = (64,)
    with_distance: bool = False
    with_cluster_center: bool = True
    with_voxel_center: bool = True
    voxel_size: Sequence[float] = (0.2, 0.2, 4)
    point_cloud_range: Sequence[float] = (0, -40, -3, 70.4, 40, 1)
    norm_cfg: Any = None
    mode: str = "max"
    legacy: bool = True
    virtual: bool = False
    # bf16 PFN compute (decorations stay fp32 — voxel/cluster geometry
    # needs the mantissa; the linear/BN/pool traffic halves)
    compute_dtype: Any = None
    # eval-time padded-slot max-pool parity with the reference (see
    # PFNLayer.pad_pool_parity)
    pad_pool_parity: bool = True

    def setup(self):
        self.pfn_layers = [
            PFNLayer(ch, norm_cfg=self.norm_cfg,
                     last_layer=(i == len(self.feat_channels) - 1),
                     mode=self.mode,
                     pad_pool_parity=self.pad_pool_parity,
                     name=f"pfn_{i}")
            for i, ch in enumerate(self.feat_channels)]

    def __call__(self, voxels, num_points, coords, voxel_mask,
                 train: bool = False):
        """voxels [B, V, P, C]; num_points [B, V]; coords [B, V, 3] (z,y,x);
        voxel_mask [B, V] -> [B, V, feat_channels[-1]]."""
        b, v, p, _ = voxels.shape
        point_mask = (jnp.arange(p)[None, None, :] <
                      num_points[..., None]) & voxel_mask[..., None]
        feats = voxels
        if self.virtual:
            # flag channel is -2 from the end (last = timestamp)
            flag = feats[..., -2]
            new_flag = jnp.where(flag == -1, 1.0, 0.0)
            feats = feats.at[..., -2].set(new_flag)

        decorations = [feats]
        if self.with_cluster_center:
            cnt = jnp.maximum(num_points, 1)[..., None].astype(feats.dtype)
            mean = jnp.where(point_mask[..., None],
                             feats[..., :3], 0.0).sum(axis=2) / cnt
            decorations.append(feats[..., :3] - mean[:, :, None, :])
        if self.with_voxel_center:
            vx, vy = self.voxel_size[0], self.voxel_size[1]
            x_off = vx / 2 + self.point_cloud_range[0]
            y_off = vy / 2 + self.point_cloud_range[1]
            cx = coords[..., 2].astype(feats.dtype) * vx + x_off
            cy = coords[..., 1].astype(feats.dtype) * vy + y_off
            f_center = jnp.stack(
                [feats[..., 0] - cx[:, :, None],
                 feats[..., 1] - cy[:, :, None]], axis=-1)
            if self.legacy:
                # reference legacy mode mutates the raw block IN PLACE
                # (``f_center = features[:, :, :2]`` then in-place
                # subtraction, pillar_encoder.py:138-144): block 0's xy
                # ARE the center offsets, and with_distance below sees
                # the mutated values — checkpoint weights are trained
                # against this layout
                feats = jnp.concatenate([f_center, feats[..., 2:]],
                                        axis=-1)
                decorations[0] = feats
            decorations.append(f_center)
        if self.with_distance:
            decorations.append(
                jnp.linalg.norm(feats[..., :3], axis=-1, keepdims=True))
        x = jnp.concatenate(decorations, axis=-1)
        x = jnp.where(point_mask[..., None], x, 0.0)
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)

        for layer in self.pfn_layers:
            x = layer(x, point_mask, train=train)
        return jnp.where(voxel_mask[..., None], x, 0.0)

    def encode_sorted(self, sorted_pts, voxel_idx, slot, keep, coords,
                      num_points, num_segments: int, max_points: int,
                      voxel_mask=None, start_rows=None,
                      train: bool = False):
        """Fused pillar encoding straight from :func:`sorted_voxel_info`
        output — numerically identical to ``hard_voxelize`` +
        ``__call__`` (same kept point set, same masked statistics) but
        never materializes the [V, P, C] voxel tensor, whose scatter-fill
        alone costs ~60 ms/step on TPU (rows of 4-5 floats on 128-wide
        lanes).  Everything here is a segmented reduction over the
        already-sorted point array plus one [N, 10] x [10, C] matmul.

        Args (flat across batch; batch folded via voxel-id offsets):
            sorted_pts: [N, C_in] points sorted by voxel key.
            voxel_idx: [N] ascending segment ids (>= num_segments drops).
            slot/keep: [N] from sorted_voxel_info (keep = hard kept set).
            coords: [num_segments, 3] (z, y, x); num_points: [num_segments].
        Returns [num_segments, feat_channels[-1]].
        """
        from ...ops.segmented import capped_segment_reduce
        n = sorted_pts.shape[0]
        cap = int(max_points)
        if start_rows is None:
            # fallback scatter (callers should pass searchsorted-derived
            # start rows — a scatter walks all N update rows)
            row = jnp.arange(n, dtype=jnp.int32)
            start = keep & (slot == 0)
            start_rows = jnp.full((num_segments + 1,), n, jnp.int32).at[
                jnp.where(start, voxel_idx, num_segments)].set(
                row, mode="drop")[:-1]

        feats = sorted_pts
        if self.virtual:
            flag = feats[..., -2]
            feats = feats.at[..., -2].set(jnp.where(flag == -1, 1.0, 0.0))
        idx = jnp.minimum(voxel_idx, num_segments - 1)

        # per-voxel values the points need (cluster mean, voxel center)
        # are concatenated into ONE [V, 5] table and gathered in a
        # single pass: the [N]-row walks are row-rate bound, so two
        # narrow gathers cost two walks (~1.6 ms each at 1.2M points,
        # profile_step.py fusion/fusion.1) while one 5-wide gather
        # costs one
        per_voxel = []
        if self.with_cluster_center:
            sums = capped_segment_reduce(feats[:, :3], voxel_idx,
                                         start_rows, cap, num_segments,
                                         reduce="sum", valid=keep)
            cnt = jnp.maximum(num_points, 1).astype(feats.dtype)[:, None]
            per_voxel.append(sums / cnt)                   # mean xyz
        if self.with_voxel_center:
            vx, vy = self.voxel_size[0], self.voxel_size[1]
            x_off = vx / 2 + self.point_cloud_range[0]
            y_off = vy / 2 + self.point_cloud_range[1]
            cx_v = coords[:, 2].astype(feats.dtype) * vx + x_off
            cy_v = coords[:, 1].astype(feats.dtype) * vy + y_off
            per_voxel.append(jnp.stack([cx_v, cy_v], axis=-1))
        gathered = jnp.concatenate(per_voxel, axis=-1)[idx] \
            if per_voxel else None

        decorations = [feats]
        col = 0
        if self.with_cluster_center:
            mean_pts = gathered[:, col:col + 3]
            col += 3
            decorations.append(feats[:, :3] - mean_pts)
        if self.with_voxel_center:
            cx = gathered[:, col]
            cy = gathered[:, col + 1]
            f_center = jnp.stack(
                [feats[:, 0] - cx, feats[:, 1] - cy], axis=-1)
            if self.legacy:
                # see the dense path: reference legacy mode replaces the
                # raw block's xy with the center offsets in place
                feats = jnp.concatenate([f_center, feats[:, 2:]],
                                        axis=-1)
                decorations[0] = feats
            decorations.append(f_center)
        if self.with_distance:
            decorations.append(
                jnp.linalg.norm(feats[:, :3], axis=-1, keepdims=True))
        x = jnp.concatenate(decorations, axis=-1)
        x = jnp.where(keep[:, None], x, 0.0)
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)

        for layer in self.pfn_layers:
            x = layer.sorted_call(x, voxel_idx, keep, start_rows, cap,
                                  num_segments, num_points=num_points,
                                  train=train)
        if voxel_mask is not None:
            x = jnp.where(voxel_mask[:, None], x, 0.0)
        return x


@VOXEL_ENCODERS.register_module()
class DynamicPillarFeatureNet(nn.Module):
    """Dynamic-voxelization pillar encoder (per-point, no capacity cap).

    Reference: pillar_encoder.py:166-339 — decorates each point with the
    mean of its pillar (via DynamicScatter mean) and the pillar-center
    offset, runs per-point PFN layers, then reduces per pillar with max.
    Here the scatter/gather pair uses ops.scatter (sort + segmented scan).
    """
    in_channels: int = 4
    feat_channels: Sequence[int] = (64,)
    with_distance: bool = False
    with_cluster_center: bool = True
    with_voxel_center: bool = True
    voxel_size: Sequence[float] = (0.2, 0.2, 4)
    point_cloud_range: Sequence[float] = (0, -40, -3, 70.4, 40, 1)
    norm_cfg: Any = None
    mode: str = "max"
    legacy: bool = True
    virtual: bool = False

    @nn.compact
    def __call__(self, points, point2voxel, coords, max_voxels: int,
                 valid=None, train: bool = False):
        """points [N, C_in]; point2voxel [N] (== max_voxels for dropped);
        coords [max_voxels, 3] (z, y, x) -> [max_voxels, C_out]."""
        feats = points
        ok = point2voxel < max_voxels
        if valid is not None:
            ok = ok & valid
        if self.virtual:
            flag = feats[..., -2]
            feats = feats.at[..., -2].set(jnp.where(flag == -1, 1.0, 0.0))

        decorations = [feats]
        if self.with_cluster_center:
            vmean = scatter_reduce(feats[:, :3], point2voxel, max_voxels,
                                   "mean")
            idx = jnp.clip(point2voxel, 0, max_voxels - 1)
            decorations.append(feats[:, :3] - vmean[idx])
        if self.with_voxel_center:
            vx, vy = self.voxel_size[0], self.voxel_size[1]
            x_off = vx / 2 + self.point_cloud_range[0]
            y_off = vy / 2 + self.point_cloud_range[1]
            idx = jnp.clip(point2voxel, 0, max_voxels - 1)
            cxy = coords[idx]
            cx = cxy[:, 2].astype(feats.dtype) * vx + x_off
            cy = cxy[:, 1].astype(feats.dtype) * vy + y_off
            decorations.append(jnp.stack(
                [feats[:, 0] - cx, feats[:, 1] - cy], axis=-1))
        if self.with_distance:
            decorations.append(
                jnp.linalg.norm(feats[:, :3], axis=-1, keepdims=True))
        x = jnp.concatenate(decorations, axis=-1)
        x = jnp.where(ok[:, None], x, 0.0)

        for i, ch in enumerate(self.feat_channels):
            last = i == len(self.feat_channels) - 1
            units = ch
            x = nn.Dense(units, use_bias=False, name=f"linear_{i}")(x)
            norm = make_norm(dict(self.norm_cfg)
                             if self.norm_cfg else None)(name=f"norm_{i}")
            x = norm(x, use_running_average=not train, mask=ok)
            x = nn.relu(x)
            if not last:
                vmax = scatter_reduce(x, point2voxel, max_voxels, "max")
                idx = jnp.clip(point2voxel, 0, max_voxels - 1)
                x = jnp.concatenate([x, vmax[idx]], axis=-1)
        out = scatter_reduce(x, point2voxel, max_voxels, self.mode)
        return out
