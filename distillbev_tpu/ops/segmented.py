"""Sorted-segment reductions — the shared engine under the point-cloud ops.

The reference implements scatter-style reductions three separate times in
CUDA (bev_pool interval sums: ops/bev_pool/src/bev_pool_cuda.cu; dynamic
scatter max/mean: ops/voxel/src/scatter_points_cuda.cu; spconv
gather-scatter: ops/spconv/src/reordering*.cu).  CUDA's tool for all of
them is the atomic/warp scatter; the TPU has no atomics, and XLA scatter
with colliding indices serializes.  The TPU-native formulation used here:

    sort by segment key  ->  segmented scan  ->  unique-index scatter

A segmented scan composes per-element (value, start_flag) pairs with an
associative operator, so XLA lowers it to a log-depth parallel scan on the
VPU; the final scatter has *unique* indices (one row per segment), which
XLA lowers to a fast dense scatter.  Everything is statically shaped:
padding rows carry a sentinel key that lands in a trash segment.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def sort_by_key(keys: jnp.ndarray, *arrays) -> Tuple[jnp.ndarray, ...]:
    """Stable-sort ``keys`` ascending and reorder ``arrays`` alongside.

    Only the (key, index) pair goes through the sort network; payload
    arrays are gathered afterwards — cheaper than sorting wide rows.
    """
    n = keys.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    sorted_keys, order = jax.lax.sort_key_val(keys, idx, is_stable=True)
    return (sorted_keys, order) + tuple(a[order] for a in arrays)


def segment_starts(sorted_keys: jnp.ndarray) -> jnp.ndarray:
    """Boolean start-of-segment flags for an ascending key array."""
    prev = jnp.concatenate(
        [sorted_keys[:1] - 1, sorted_keys[:-1]])
    return sorted_keys != prev


def compact_flagged_rows(flags: jnp.ndarray, m: int,
                         block: int = 1024) -> jnp.ndarray:
    """Row ids of the first ``m`` True flags, ascending; rows beyond the
    flag count are ``n`` (sentinel).

    TPU formulation: a GLOBAL 1-bit compaction sort over N rows costs
    N*log2(N) comparator passes (~3.8 ms at 1.2M rows, profile r5);
    compaction is block-decomposable, so sort each ``block``-row tile
    independently (N*log2(block) — 2x fewer passes at 1024) and locate
    the v-th flag with a two-level lookup: a [N/block] per-block count
    cumsum picks the block, the in-block sorted offsets pick the row.
    """
    n = flags.shape[0]
    nb = -(-n // block)
    pad = nb * block - n
    row = jnp.arange(n, dtype=jnp.int32)
    big = jnp.int32(jnp.iinfo(jnp.int32).max)
    packed = jnp.where(flags, row, big)
    if pad:
        packed = jnp.concatenate(
            [packed, jnp.full((pad,), big, jnp.int32)])
    blocks = jax.lax.sort(packed.reshape(nb, block), dimension=1)
    cnt = flags.astype(jnp.int32).reshape(-1)
    if pad:
        cnt = jnp.concatenate([cnt, jnp.zeros((pad,), jnp.int32)])
    cnt = cnt.reshape(nb, block).sum(axis=1)
    block_cum = jnp.cumsum(cnt)                      # inclusive, [nb]
    v = jnp.arange(m, dtype=jnp.int32)
    # block of the v-th flag: first block with cum > v.  method='sort':
    # the default binary-scan lowering is log2(nb) DEPENDENT gather
    # passes over m queries and measured 16 ms/step SLOWER at the
    # flagship shapes (same pathology as the spconv rulebooks,
    # docs/PERF.md r4); the sorted-merge form is one tiny concat+sort
    b_of_v = jnp.searchsorted(block_cum, v, side="right",
                              method="sort").astype(jnp.int32)
    prev_cum = jnp.where(b_of_v > 0,
                         block_cum[jnp.maximum(b_of_v - 1, 0)], 0)
    k_of_v = v - prev_cum
    b_cl = jnp.minimum(b_of_v, nb - 1)
    cand = blocks[b_cl, jnp.minimum(k_of_v, block - 1)]
    total = block_cum[-1]
    return jnp.where((v < total) & (cand != big), cand, n)


def _seg_combine_sum(a, b):
    va, fa = a
    vb, fb = b
    return jnp.where(fb, vb, va + vb), fa | fb


def _seg_combine_max(a, b):
    va, fa = a
    vb, fb = b
    return jnp.where(fb, vb, jnp.maximum(va, vb)), fa | fb


def _segmented_scan(values: jnp.ndarray, starts: jnp.ndarray, combine):
    """Inclusive segmented scan along axis 0.  values [N, ...], starts [N]."""
    flags = starts
    if values.ndim > 1:
        flags = starts.reshape((-1,) + (1,) * (values.ndim - 1))
        flags = jnp.broadcast_to(flags, values.shape)
    out, _ = jax.lax.associative_scan(combine, (values, flags))
    return out


def segmented_cumsum(values: jnp.ndarray, starts: jnp.ndarray) -> jnp.ndarray:
    return _segmented_scan(values, starts, _seg_combine_sum)


def segmented_cummax(values: jnp.ndarray, starts: jnp.ndarray) -> jnp.ndarray:
    return _segmented_scan(values, starts, _seg_combine_max)


_PALLAS_SCAN = None


def _use_pallas_scan() -> bool:
    """Pallas single-pass scan on a single TPU chip (3.4x the XLA
    associative_scan at flagship splat sizes).  Disabled under multi-
    device GSPMD (a pallas_call inside a sharded jit needs shard_map)
    and on CPU/interpret platforms; override with env
    DISTILLBEV_PALLAS_SCAN=0/1."""
    global _PALLAS_SCAN
    if _PALLAS_SCAN is None:
        import os
        env = os.environ.get("DISTILLBEV_PALLAS_SCAN")
        if env is not None:
            _PALLAS_SCAN = env not in ("0", "false", "False")
        else:
            try:
                _PALLAS_SCAN = (jax.default_backend() not in
                                ("cpu",) and len(jax.devices()) == 1)
            except Exception:
                _PALLAS_SCAN = False
    return _PALLAS_SCAN


def _scan_sum(vals: jnp.ndarray, sorted_keys: jnp.ndarray,
              starts: jnp.ndarray) -> jnp.ndarray:
    """Segmented inclusive cumsum: Pallas kernel when eligible, else the
    XLA associative scan."""
    if _use_pallas_scan() and vals.ndim == 2 and vals.shape[-1] >= 8:
        from .pallas_segmented import (pad_rows_to_multiple,
                                       segmented_cumsum_pallas)
        tile = 512
        v, k, n = pad_rows_to_multiple(
            vals, sorted_keys, tile, pad_key=jnp.iinfo(jnp.int32).max)
        return segmented_cumsum_pallas(v, k, tile=tile)[:n]
    return segmented_cumsum(vals.astype(jnp.float32), starts)


def segment_ids_from_starts(starts: jnp.ndarray) -> jnp.ndarray:
    """Compacted 0-based segment index per sorted element."""
    return jnp.cumsum(starts.astype(jnp.int32)) - 1


def position_in_segment(starts: jnp.ndarray) -> jnp.ndarray:
    """0-based position of each element within its segment.

    The running max of start positions needs no SEGMENTED scan: start
    rows are the only nonzeros and positions are increasing, so a plain
    ``lax.cummax`` (optimized TPU lowering) gives each row its own
    segment's start index — far cheaper than the custom-combine
    associative scan it replaces."""
    n = starts.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    start_pos = jnp.where(starts, idx, 0)
    return idx - jax.lax.cummax(start_pos)


@partial(jax.jit, static_argnames=("cap", "num_segments", "reduce"))
def capped_segment_reduce(values: jnp.ndarray,
                          sorted_keys: jnp.ndarray,
                          start_rows: jnp.ndarray,
                          cap: int,
                          num_segments: int,
                          reduce: str = "max",
                          valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-segment reduction when contributing rows are capped.

    For segments whose contributing (valid) rows all lie within the first
    ``cap`` physical rows of the segment (e.g. hard-voxelized pillars with
    ``max_points`` kept slots), the reduction needs no cumulative scan:
    ceil(log2(cap)) shifted combine steps build a windowed suffix reduce,
    and a gather at the segment-start rows reads the answer.  Much lighter
    than ``associative_scan`` to compile AND run — no [N, C] scan tree,
    no [N, C] scatter.

    Args:
        values: [N, C] rows sorted so equal keys are contiguous.
        sorted_keys: [N] segment key per row (any contiguous labeling).
        start_rows: [num_segments] physical row of each segment's first
            row; rows >= N mean "empty segment" (result 0).
        cap: static bound on valid rows per segment.
        valid: [N] mask; invalid rows contribute nothing.

    Returns [num_segments, C] float32.
    """
    n = values.shape[0]
    if reduce == "max":
        # max is order-exact in any dtype — keep bf16 inputs bf16
        # (halves the shifted-combine traffic); sums accumulate fp32
        vals = values
        ident = jnp.asarray(-jnp.inf, vals.dtype)
        combine = jnp.maximum
    elif reduce in ("sum", "mean"):
        vals = values.astype(jnp.float32)
        ident = jnp.float32(0)
        combine = jnp.add
    else:
        raise ValueError(f"unknown reduce {reduce!r}")
    if valid is not None:
        mask = valid.reshape((-1,) + (1,) * (values.ndim - 1))
        vals = jnp.where(mask, vals, ident)

    x, k = vals, sorted_keys
    pad_key = jnp.full((1,), jnp.iinfo(sorted_keys.dtype).max,
                       sorted_keys.dtype)
    d = 1
    while d < cap:
        xs = jnp.concatenate(
            [x[d:], jnp.full((d,) + x.shape[1:], ident, x.dtype)])
        ks = jnp.concatenate([k[d:], jnp.broadcast_to(pad_key, (d,))])
        same = (ks == k).reshape((-1,) + (1,) * (x.ndim - 1))
        x = combine(x, jnp.where(same, xs, ident))
        d *= 2

    out = x[jnp.minimum(start_rows, n - 1)]
    empty = start_rows >= n
    out = jnp.where(empty.reshape((-1,) + (1,) * (out.ndim - 1)), 0.0, out)
    if reduce == "max":
        # segments whose every row was masked reduce to -inf -> 0 (matches
        # the empty-voxel convention of segment_reduce_sorted)
        out = jnp.where(jnp.isfinite(out), out, 0.0)
    return out


@partial(jax.jit, static_argnames=("num_segments", "reduce"))
def segment_reduce_sorted(values: jnp.ndarray,
                          sorted_keys: jnp.ndarray,
                          num_segments: int,
                          reduce: str = "sum",
                          valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Reduce rows sharing a key into ``[num_segments, ...]``.

    Args:
        values: [N, ...] rows, already ordered by ``sorted_keys``.
        sorted_keys: [N] ascending int keys in [0, num_segments) for valid
            rows; invalid rows may carry any key when masked by ``valid``.
        num_segments: static output rows.
        reduce: 'sum' | 'max' | 'mean'.
        valid: optional [N] mask; invalid rows contribute nothing.

    Returns [num_segments, ...]; empty segments are 0 (sum/mean) or 0 (max,
    by convention — matches a ReLU-style canvas where empty = 0).
    """
    if valid is not None:
        sorted_keys = jnp.where(valid, sorted_keys, num_segments)
    starts = segment_starts(sorted_keys)
    if reduce in ("sum", "mean"):
        # keep bf16 rows bf16 into the Pallas scan (it accumulates fp32
        # in-register; the [N, C] HBM read halves) — the XLA fallback
        # inside _scan_sum still casts fp32 for its carry chain
        vals = values
        if valid is not None:
            mask = valid.reshape((-1,) + (1,) * (values.ndim - 1))
            vals = jnp.where(mask, vals, jnp.zeros((), vals.dtype))
        scanned = _scan_sum(vals, sorted_keys, starts)
    elif reduce == "max":
        neg = jnp.full_like(values, -jnp.inf, dtype=jnp.float32)
        vals = values.astype(jnp.float32)
        if valid is not None:
            mask = valid.reshape((-1,) + (1,) * (values.ndim - 1))
            vals = jnp.where(mask, vals, neg)
        scanned = segmented_cummax(vals, starts)
    else:
        raise ValueError(f"unknown reduce {reduce!r}")

    # last row of each segment holds the full reduction.  TPU scatter cost
    # is walk-the-update-rows bound, so first COMPACT the segment-end rows
    # with a stable 1-bit sort (ends first, ascending row order — XLA sorts
    # 1M one-bit keys in ~0.3 ms), then scatter only the <= num_segments+1
    # compacted int32 row ids and gather the WIDE scanned rows.  Measured
    # 3.0 -> 0.3 ms per flagship bev_pool vs scattering all N row ids, and
    # 18.7 -> 10.7 ms vs the original wide-row scatter.
    n = sorted_keys.shape[0]
    nxt = jnp.concatenate([sorted_keys[1:], sorted_keys[-1:] + 1])
    ends = sorted_keys != nxt
    m = min(n, num_segments + 1)
    # blocked compaction of the end rows (see compact_flagged_rows —
    # 2x fewer sort passes than the old global 1-bit sort)
    cand = compact_flagged_rows(ends, m)
    in_range = cand < n
    cand_cl = jnp.minimum(cand, n - 1)
    cand_keys = jnp.where(in_range,
                          jnp.clip(sorted_keys[cand_cl], 0,
                                   num_segments),
                          num_segments)
    cand = cand_cl
    end_rows = jnp.full((num_segments + 1,), n, jnp.int32).at[
        cand_keys].set(cand, mode="drop")[:num_segments]
    # candidates with key == num_segments (sentinel or non-end) collide on
    # the trash row, which is discarded; real segment rows are unique.
    has = end_rows < n
    out = scanned[jnp.minimum(end_rows, n - 1)]
    out = jnp.where(has.reshape((-1,) + (1,) * (out.ndim - 1)), out, 0.0)
    if reduce == "mean":
        ones = jnp.ones((values.shape[0],), jnp.float32)
        if valid is not None:
            ones = jnp.where(valid, ones, 0.0)
        counts = segmented_cumsum(ones, starts)
        cnt = jnp.where(has, counts[jnp.minimum(end_rows, n - 1)], 0.0)
        out = out / jnp.maximum(cnt, 1.0).reshape(
            (-1,) + (1,) * (out.ndim - 1))
    if reduce == "max":
        out = jnp.where(jnp.isfinite(out), out, 0.0)
    return out


def segment_sum_by_key(values: jnp.ndarray,
                       keys: jnp.ndarray,
                       num_segments: int,
                       valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Unsorted convenience wrapper: sort + segment_reduce_sorted(sum)."""
    if valid is not None:
        keys = jnp.where(valid, keys, num_segments)
    sorted_keys, _, sorted_vals = sort_by_key(keys, values)
    return segment_reduce_sorted(sorted_vals, sorted_keys, num_segments,
                                 reduce="sum")
