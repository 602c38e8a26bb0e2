"""Voxelization — hard (fixed capacity) and dynamic (coords only).

Capability parity with the reference's CUDA/CPU voxel layer
(reference: mmdet3d/ops/voxel/voxelize.py:10-76 wrapping
src/voxelization_cuda.cu): buckets LiDAR points into pillars/voxels.

TPU-native design: the CUDA version builds a coord->voxel hash map with
atomics and emits dynamically many voxels; here everything is static-shape:

    point -> voxel coord (floor-div)           [vectorized]
    sort points by flat voxel key              [XLA sort]
    unique voxels = key-change boundaries      [vectorized]
    slot-in-voxel = position within segment    [segmented scan]
    scatter to [max_voxels, max_points, C]     [unique-index scatter]

Overflow semantics match the reference's deterministic CPU path: voxels
beyond ``max_voxels`` and points beyond ``max_points`` per voxel are
dropped, in sorted-key order (the reference drops in arrival order —
both are valid subsamplings; ours is deterministic under permutation).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from .segmented import (position_in_segment, segment_ids_from_starts,
                        segment_starts, sort_by_key)


class VoxelizationOutput(NamedTuple):
    """Static-shape voxelization result.

    voxels: [max_voxels, max_points, C] padded point features.
    coords: [max_voxels, 3] int32 (z, y, x) voxel coords; -1 for padding.
    num_points: [max_voxels] int32 points actually in each voxel.
    num_voxels: [] int32 count of real voxels.
    """
    voxels: jnp.ndarray
    coords: jnp.ndarray
    num_points: jnp.ndarray
    num_voxels: jnp.ndarray


def compute_voxel_coords(points: jnp.ndarray,
                         voxel_size: Sequence[float],
                         point_cloud_range: Sequence[float]
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-point integer voxel coords (z, y, x) and validity mask.

    Matches the reference's dynamic_voxelize semantics
    (voxelization_cuda.cu dynamic path): coord = floor((p - min) / size),
    invalid if outside the grid.
    """
    vs = jnp.asarray(voxel_size, points.dtype)
    lo = jnp.asarray(point_cloud_range[:3], points.dtype)
    hi = jnp.asarray(point_cloud_range[3:], points.dtype)
    grid = jnp.floor((hi - lo) / vs + 0.5).astype(jnp.int32)  # (gx, gy, gz)
    c = jnp.floor((points[:, :3] - lo[None]) / vs[None]).astype(jnp.int32)
    valid = ((c[:, 0] >= 0) & (c[:, 0] < grid[0]) &
             (c[:, 1] >= 0) & (c[:, 1] < grid[1]) &
             (c[:, 2] >= 0) & (c[:, 2] < grid[2]))
    coords_zyx = jnp.stack([c[:, 2], c[:, 1], c[:, 0]], axis=-1)
    return coords_zyx, valid


def dynamic_voxelize(points: jnp.ndarray,
                     voxel_size: Sequence[float],
                     point_cloud_range: Sequence[float]) -> jnp.ndarray:
    """Per-point (z, y, x) coords with -1 rows for out-of-range points
    (reference: ops/voxel/voxelize.py:10-36 return convention)."""
    coords, valid = compute_voxel_coords(points, voxel_size,
                                         point_cloud_range)
    return jnp.where(valid[:, None], coords, -1)


class SortedVoxelInfo(NamedTuple):
    """Sorted-point view of a hard voxelization — same point/voxel
    selection as :func:`hard_voxelize` but WITHOUT materializing the
    ``[max_voxels, max_points, C]`` tensor (whose scatter-fill is the
    single most expensive op of the pillar path on TPU: ~60 ms for
    1.2M points — rows of 4-5 floats waste the 128-wide lanes).

    Consumers (fused pillar encoders) operate directly on the sorted
    point array with segmented reductions.

    sorted_pts:  [N, C] points sorted by flat voxel key.
    voxel_idx:   [N] int32 segment id per sorted point (ascending;
                 dropped/invalid rows carry ids >= max_voxels).
    slot:        [N] int32 position within the voxel.
    keep:        [N] bool — exactly hard_voxelize's kept set
                 (valid & voxel_idx < max_voxels & slot < max_points).
    coords:      [max_voxels, 3] int32 (z, y, x); -1 padding.
    num_points:  [max_voxels] int32 kept points per voxel.
    num_voxels:  [] int32.
    start_rows:  [max_voxels] int32 first sorted row of each voxel
                 (= N for voxels beyond num_voxels).
    """
    sorted_pts: jnp.ndarray
    voxel_idx: jnp.ndarray
    slot: jnp.ndarray
    keep: jnp.ndarray
    coords: jnp.ndarray
    num_points: jnp.ndarray
    num_voxels: jnp.ndarray
    start_rows: jnp.ndarray


@partial(jax.jit, static_argnames=("voxel_size", "point_cloud_range",
                                   "max_points", "max_voxels",
                                   "presorted"))
def sorted_voxel_info(points: jnp.ndarray,
                      valid_points: jnp.ndarray,
                      voxel_size: Tuple[float, ...],
                      point_cloud_range: Tuple[float, ...],
                      max_points: int,
                      max_voxels: int,
                      presorted: bool = False) -> SortedVoxelInfo:
    """Hard voxelization metadata in sorted-point form (see
    :class:`SortedVoxelInfo`).  Selection semantics are bit-identical to
    :func:`hard_voxelize`; only the [V, P, C] materialization is skipped.

    ``presorted=True`` declares that the caller's points already arrive
    sorted ascending by the flat voxel key (invalid/padded rows last) —
    the contract the ``SortPointsByPillar`` pipeline transform
    establishes on the host.  The on-device sort + sorted-row gather
    (~22 ms/step at 4 x 300k points, the two ops XLA cannot fuse away)
    are then skipped entirely; only the vectorized key recompute
    remains.  Results are bit-identical to the sorting path given the
    contract (stable sort of an already-sorted array is the identity).
    """
    n, c = points.shape
    coords, in_range = compute_voxel_coords(points, voxel_size,
                                            point_cloud_range)
    valid = in_range & valid_points

    vs = jnp.asarray(voxel_size, points.dtype)
    lo = jnp.asarray(point_cloud_range[:3], points.dtype)
    hi = jnp.asarray(point_cloud_range[3:], points.dtype)
    grid = jnp.floor((hi - lo) / vs + 0.5).astype(jnp.int32)
    gx, gy = grid[0], grid[1]

    key = (coords[:, 0] * gy + coords[:, 1]) * gx + coords[:, 2]
    key = jnp.where(valid, key, jnp.iinfo(jnp.int32).max)

    if presorted:
        sorted_keys, sorted_pts = key, points
    else:
        sorted_keys, _, sorted_pts = sort_by_key(key, points)
    # gathering the bool mask / int coords by `order` costs ~12 / ~9 ms
    # per step at 1.2M points (row-walk bound); the mask is implied by
    # the key sentinel and coords recompute from the sorted points
    sorted_valid = sorted_keys != jnp.iinfo(jnp.int32).max
    sorted_coords, _ = compute_voxel_coords(sorted_pts, voxel_size,
                                            point_cloud_range)
    starts = (segment_starts(sorted_keys) & sorted_valid) | ~sorted_valid
    voxel_idx = segment_ids_from_starts(starts)
    slot = position_in_segment(starts)
    keep = sorted_valid & (voxel_idx < max_voxels) & (slot < max_points)
    num_voxels = jnp.sum((starts & sorted_valid &
                          (voxel_idx < max_voxels)).astype(jnp.int32))

    coords_meta, num_points, start_rows = _segment_meta_compact(
        sorted_keys, sorted_coords, max_voxels, n, max_points)
    return SortedVoxelInfo(sorted_pts, voxel_idx, slot, keep,
                           coords_meta, num_points, num_voxels,
                           start_rows)


def _segment_meta_compact(sorted_keys, sorted_coords, max_voxels: int,
                          n: int, max_points: int | None = None):
    """(coords [V, 3], num_points [V], start_rows [V]) from the sorted key
    array, without walking all N rows in a scatter.

    TPU scatter cost is walk-the-update-rows bound (the old single
    combined scatter here was 11.5 ms/step at 4 x 300k points), so the
    segment-start rows are COMPACTED first with a stable 1-bit sort
    (starts first, ascending row order — ~0.3 ms at 1M rows).  The v-th
    compacted row IS voxel v's start row; coords gather from it, and
    num_points = clip(next_start - start, max_points) using the fact
    that valid segments are contiguous and invalid rows sort last."""
    sentinel = jnp.iinfo(sorted_keys.dtype).max
    sorted_valid = sorted_keys != sentinel
    prev = jnp.concatenate([sorted_keys[:1] - 1, sorted_keys[:-1]])
    real_start = (sorted_keys != prev) & sorted_valid
    num_segments = jnp.sum(real_start.astype(jnp.int32))
    n_valid = jnp.sum(sorted_valid.astype(jnp.int32))
    m = min(n, max_voxels + 1)
    # blocked compaction of the start rows (segmented.py
    # compact_flagged_rows — 2x fewer sort passes than a global sort)
    from .segmented import compact_flagged_rows
    cand = compact_flagged_rows(real_start, m)
    v = jnp.arange(m, dtype=jnp.int32)
    in_seg = v < num_segments
    start_rows = jnp.where(in_seg, cand, n)
    nxt = jnp.concatenate([cand[1:], jnp.full((1,), n, jnp.int32)])
    next_start = jnp.where(v + 1 < num_segments, nxt, n_valid)
    seg_len = jnp.maximum(next_start - cand, 0)
    if max_points is not None:
        seg_len = jnp.minimum(seg_len, max_points)
    num_points = jnp.where(in_seg, seg_len, 0)
    coords = jnp.where(in_seg[:, None],
                       sorted_coords[jnp.minimum(cand, n - 1)], -1)
    if m < max_voxels:          # tiny-N case: pad to the static budget
        pad = max_voxels - m
        coords = jnp.concatenate(
            [coords, jnp.full((pad, 3), -1, jnp.int32)], 0)
        num_points = jnp.concatenate(
            [num_points, jnp.zeros((pad,), jnp.int32)], 0)
        start_rows = jnp.concatenate(
            [start_rows, jnp.full((pad,), n, jnp.int32)], 0)
    return (coords[:max_voxels], num_points[:max_voxels],
            start_rows[:max_voxels])


@partial(jax.jit, static_argnames=("voxel_size", "point_cloud_range",
                                   "max_points", "max_voxels"))
def hard_voxelize(points: jnp.ndarray,
                  valid_points: jnp.ndarray,
                  voxel_size: Tuple[float, ...],
                  point_cloud_range: Tuple[float, ...],
                  max_points: int,
                  max_voxels: int) -> VoxelizationOutput:
    """Fixed-capacity voxelization (reference hard_voxelize equivalent).

    Args:
        points: [N, C] padded point array (static N).
        valid_points: [N] bool mask for padding rows.
        voxel_size / point_cloud_range: static python tuples.
        max_points: capacity per voxel.
        max_voxels: static voxel budget.
    """
    n, c = points.shape
    coords, in_range = compute_voxel_coords(points, voxel_size,
                                            point_cloud_range)
    valid = in_range & valid_points

    vs = jnp.asarray(voxel_size, points.dtype)
    lo = jnp.asarray(point_cloud_range[:3], points.dtype)
    hi = jnp.asarray(point_cloud_range[3:], points.dtype)
    grid = jnp.floor((hi - lo) / vs + 0.5).astype(jnp.int32)
    gx, gy, gz = grid[0], grid[1], grid[2]
    n_cells = gx * gy * gz  # traced but only used in value computations

    # flat key (z, y, x) -> z*gy*gx + y*gx + x ; invalid -> huge sentinel
    key = (coords[:, 0] * gy + coords[:, 1]) * gx + coords[:, 2]
    key = jnp.where(valid, key, jnp.iinfo(jnp.int32).max)

    sorted_keys, order, sorted_pts = sort_by_key(key, points)
    sorted_valid = sorted_keys != jnp.iinfo(jnp.int32).max
    sorted_coords_v, _ = compute_voxel_coords(sorted_pts, voxel_size,
                                              point_cloud_range)
    starts = segment_starts(sorted_keys) & sorted_valid
    # treat every invalid row as its own (discarded) segment start so they
    # never extend a real segment
    starts = starts | ~sorted_valid
    voxel_idx = segment_ids_from_starts(starts)          # [N]
    slot = position_in_segment(starts)                   # [N]

    keep = sorted_valid & (voxel_idx < max_voxels) & (slot < max_points)
    flat_dst = jnp.where(keep, voxel_idx * max_points + slot,
                         max_voxels * max_points)
    voxels = jnp.zeros((max_voxels * max_points + 1, c), points.dtype)
    voxels = voxels.at[flat_dst].set(sorted_pts, mode="drop")
    voxels = voxels[:-1].reshape(max_voxels, max_points, c)

    num_voxels = jnp.sum((starts & sorted_valid &
                          (voxel_idx < max_voxels)).astype(jnp.int32))
    coords_out, num_points, _ = _segment_meta_compact(
        sorted_keys, sorted_coords_v, max_voxels, n, max_points)
    return VoxelizationOutput(voxels, coords_out, num_points, num_voxels)


@partial(jax.jit, static_argnames=("max_voxels",))
def unique_voxels(coords: jnp.ndarray,
                  valid: jnp.ndarray,
                  grid_size: jnp.ndarray,
                  max_voxels: int):
    """Compact per-point voxel coords into unique voxels.

    Used by dynamic voxel encoders (reference DynamicScatter's coord
    dedup, scatter_points_cuda.cu).  Returns:
        point2voxel: [N] int32 index into the compacted voxel list
            (= max_voxels for dropped/invalid points).
        voxel_coords: [max_voxels, 3] (z, y, x), -1 padded.
        num_voxels: [] int32.
        order / sorted_* helpers for follow-up segment reductions:
        (sorted_keys, order, sorted_valid).
    """
    gz, gy, gx = grid_size[0], grid_size[1], grid_size[2]
    key = (coords[:, 0] * gy + coords[:, 1]) * gx + coords[:, 2]
    key = jnp.where(valid, key, jnp.iinfo(jnp.int32).max)
    sorted_keys, order, sorted_valid = sort_by_key(key, valid)
    starts = (segment_starts(sorted_keys) & sorted_valid) | ~sorted_valid
    voxel_idx = segment_ids_from_starts(starts)
    voxel_idx = jnp.where(sorted_valid & (voxel_idx < max_voxels),
                          voxel_idx, max_voxels)

    # un-sort the mapping back to original point order
    n = coords.shape[0]
    point2voxel = jnp.zeros((n,), jnp.int32).at[order].set(voxel_idx)

    start_dst = jnp.where(starts & (voxel_idx < max_voxels), voxel_idx,
                          max_voxels)
    sorted_coords = coords[order]
    voxel_coords = jnp.full((max_voxels + 1, 3), -1, jnp.int32)
    voxel_coords = voxel_coords.at[start_dst].set(sorted_coords,
                                                  mode="drop")[:-1]
    num_voxels = jnp.sum((starts & sorted_valid &
                          (voxel_idx < max_voxels)).astype(jnp.int32))
    return point2voxel, voxel_coords, num_voxels
