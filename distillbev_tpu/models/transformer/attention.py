"""BEVFormer attention modules (deformable family).

Capability parity with the reference transformer attention stack
(reference: mmdet3d/models/transformer_modules/ —
SpatialCrossAttention:31 + MSDeformableAttention3D:178 with the
per-camera query rebatching:137-166 and hit-count normalization:168-172;
TemporalSelfAttention (num_bev_queue=2) temporal_self_attention.py;
CustomMSDeformableAttention decoder.py; all calling the mmcv CUDA
``ms_deform_attn`` kernel).

TPU-native design:
* the sampling core is ops/ms_deform_attn (batched gathers + fused lerp +
  MXU einsum), statically shaped per level;
* the reference's *dynamic* per-camera rebatching (max_len varies per
  step) becomes a *fixed-budget* top-K selection: each camera processes
  the K BEV queries with the most projected hits (K static, default
  0.4*num_query covers every hit query with measured margin on real
  6-camera geometry — see SpatialCrossAttention); results scatter-add
  back and normalize by per-query hit counts — same math, static shapes;
* everything is batch-first [B, Q, C].
"""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..builder import ATTENTION
from ...ops.ms_deform_attn import ms_deform_attn


def _grid_init(num_heads: int, num_levels: int, num_points: int
               ) -> np.ndarray:
    """Deformable-DETR sampling-offset bias init (reference
    spatial_cross_attention.py init_weights / mmcv)."""
    thetas = np.arange(num_heads, dtype=np.float32) * (
        2.0 * math.pi / num_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid.reshape(num_heads, 1, 1, 2),
                   (1, num_levels, num_points, 1))
    for i in range(num_points):
        grid[:, :, i] *= i + 1
    return grid.reshape(-1)


@ATTENTION.register_module()
class MSDeformableAttention3D(nn.Module):
    """Deformable sampling over multi-level image features with
    ``num_Z_anchors`` projected reference points per query."""
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 8

    @nn.compact
    def __call__(self, query, value, reference_points, spatial_shapes,
                 train: bool = False):
        """query [B', Q, C]; value [B', sum(HW), C];
        reference_points [B', Q, Z, 2] normalized; spatial_shapes static
        ((h, w), ...) -> [B', Q, C]."""
        bsz, q, _ = query.shape
        nv = value.shape[1]
        value = nn.Dense(self.embed_dims, name="value_proj")(value)
        value = value.reshape(bsz, nv, self.num_heads, -1)
        off_bias = self.param(
            "sampling_offsets_bias",
            lambda k: jnp.asarray(_grid_init(
                self.num_heads, self.num_levels, self.num_points)),
        )
        offsets = nn.Dense(
            self.num_heads * self.num_levels * self.num_points * 2,
            kernel_init=nn.initializers.zeros, use_bias=False,
            name="sampling_offsets")(query) + off_bias
        offsets = offsets.reshape(bsz, q, self.num_heads,
                                  self.num_levels, self.num_points, 2)
        weights = nn.Dense(self.num_heads * self.num_levels *
                           self.num_points, name="attention_weights")(
            query)
        weights = jax.nn.softmax(
            weights.reshape(bsz, q, self.num_heads,
                            self.num_levels * self.num_points), axis=-1)
        weights = weights.reshape(bsz, q, self.num_heads,
                                  self.num_levels, self.num_points)
        norm = jnp.asarray(
            [[w, h] for h, w in spatial_shapes], jnp.float32)
        offsets = offsets / norm[None, None, None, :, None, :]
        z = reference_points.shape[2]
        p_per_z = self.num_points // z
        offsets = offsets.reshape(bsz, q, self.num_heads,
                                  self.num_levels, p_per_z, z, 2)
        locs = reference_points[:, :, None, None, None, :, :] + offsets
        locs = locs.reshape(bsz, q, self.num_heads, self.num_levels,
                            self.num_points, 2)
        out = ms_deform_attn(value, tuple(spatial_shapes), locs, weights)
        return out


@ATTENTION.register_module()
class SpatialCrossAttention(nn.Module):
    """Camera-aware cross attention from BEV queries to image features.

    K policy (the static top-K budget replacing the reference's dynamic
    per-camera rebatching, spatial_cross_attention.py:137-166): a BEV
    query hits camera ``i`` iff one of its pillar points projects inside
    that camera's frustum, so the hit set is the wedge of the BEV plane
    inside the camera's horizontal FOV — a fraction FOV/360 of all
    queries (plus a boundary sliver from the pillar's z-extent).  The
    widest nuScenes camera (CAM_BACK, ~110deg FOV) measures a hit
    fraction of at most 0.35*Q against full 6-camera geometry
    (``test_model_bevformer.py::TestSCACoverage``, which also asserts
    dense == budgeted outputs), so the default ``K = 0.4*Q`` covers
    every hit query with a 14% margin; BEV-space aug (rotation/flip)
    permutes the wedge without changing its fraction.  Override
    ``max_queries_per_cam`` to trade compute for margin (cameras with
    FOV approaching 180deg need ~Q/2).
    """
    embed_dims: int = 256
    num_cams: int = 6
    dropout: float = 0.1
    deformable_attention: Any = None
    max_queries_per_cam: Optional[int] = None   # static budget; None=0.4Q

    @staticmethod
    def budget(q: int, max_queries_per_cam: Optional[int] = None) -> int:
        """The static per-camera query budget K (see class docstring)."""
        k = max_queries_per_cam or max(2 * q // 5, 1)
        return min(k, q)

    @staticmethod
    def select(reference_points_cam, bev_mask, k: int):
        """Precompute the per-camera top-K query selection.

        Everything here depends only on the frame geometry
        (reference_points_cam / bev_mask), NOT on the query content, so
        it is identical across the encoder's layers — the encoder
        computes it ONCE per frame and threads it through the layer
        scan instead of paying the [N_cam, B, Q] top_k sort + ref
        gather 6x per frame (docs/PERF.md round 4).

        Returns (idx [N_cam, B, K], sel_ref [N_cam, B, K, D, 2],
        has_hit [N_cam, B, K] bool, hit_count [B, Q] fp32)."""
        hits = bev_mask.sum(-1)                      # [N_cam, B, Q]
        _, idx = jax.lax.top_k(hits, k)              # [N_cam, B, K]
        sel_ref = jnp.take_along_axis(
            reference_points_cam, idx[..., None, None], axis=2)
        has_hit = jnp.take_along_axis(hits, idx, axis=2) > 0
        hit_count = (hits > 0).astype(jnp.float32).transpose(
            1, 2, 0).sum(-1)                         # [B, Q]
        return idx, sel_ref, has_hit, hit_count

    @nn.compact
    def __call__(self, query, value, reference_points_cam, bev_mask,
                 spatial_shapes, query_pos=None, residual=None,
                 precomputed_select=None, train: bool = False):
        """query [B, Q, C]; value [B, N_cam, sum(HW), C];
        reference_points_cam [N_cam, B, Q, D, 2]; bev_mask
        [N_cam, B, Q, D] bool -> [B, Q, C].  ``precomputed_select``:
        optional output of :meth:`select` (layer-invariant hoist)."""
        inp_residual = query if residual is None else residual
        if query_pos is not None:
            query = query + query_pos
        bsz, q, c = query.shape
        n_cam = value.shape[1]
        d = reference_points_cam.shape[3]
        k = self.budget(q, self.max_queries_per_cam)

        da_cfg = dict(self.deformable_attention or {})
        da_cfg.pop("type", None)
        da = MSDeformableAttention3D(embed_dims=self.embed_dims,
                                     name="deformable_attention",
                                     **{kk: v for kk, v in da_cfg.items()
                                        if kk in ("num_heads",
                                                  "num_levels",
                                                  "num_points")})

        # all cameras in ONE attention call (cams fold into batch):
        # 6x fewer op instances per layer than a python camera loop —
        # smaller HLO and bigger fusions on the chunked sampling core
        if precomputed_select is not None:
            # the select's K wins: the encoder may run a reduced budget
            # (e.g. no-grad history frames at the measured exact-cover
            # fraction instead of the default margin, bevformer.py)
            idx, sel_ref, has_hit, hit_count = precomputed_select
            k = idx.shape[-1]
        else:
            idx, sel_ref, has_hit, hit_count = self.select(
                reference_points_cam, bev_mask, k)
        sel_q = jnp.take_along_axis(
            query[None], idx[..., None], axis=2)     # [N, B, K, C]
        nb = n_cam * bsz
        out = da(sel_q.reshape(nb, k, c),
                 value.transpose(1, 0, 2, 3).reshape(
                     nb, value.shape[2], c),
                 sel_ref.reshape(nb, k, d, 2), spatial_shapes,
                 train=train).reshape(n_cam, bsz, k, c)
        out = jnp.where(has_hit[..., None], out, 0.0)
        # one scatter per sample row: cams concat into the update axis
        idx_b = idx.transpose(1, 0, 2).reshape(bsz, n_cam * k)
        out_b = out.transpose(1, 0, 2, 3).reshape(bsz, n_cam * k, c)
        slots = jax.vmap(lambda i, o: jnp.zeros(
            (q, c), out_b.dtype).at[i].add(o))(idx_b, out_b)

        # hit-count normalization in the slot dtype (fp32 counts would
        # promote the [B, Q, C] stream under bf16 mixed precision)
        count = hit_count.astype(slots.dtype)
        slots = slots / jnp.maximum(count, 1.0)[..., None]
        slots = nn.Dense(self.embed_dims, name="output_proj")(slots)
        if train and self.dropout > 0:
            slots = nn.Dropout(self.dropout, deterministic=not train)(
                slots)
        return slots + inp_residual


@ATTENTION.register_module()
class TemporalSelfAttention(nn.Module):
    """Deformable self-attention over [prev_bev, curr] value queue."""
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 1
    num_points: int = 4
    num_bev_queue: int = 2
    dropout: float = 0.1

    @nn.compact
    def __call__(self, query, value=None, identity=None, query_pos=None,
                 reference_points=None, spatial_shapes=None,
                 train: bool = False):
        """query [B, Q, C]; value [B*2, Q, C] stacked (prev, curr) or
        None (duplicated query); reference_points [B, Q, 1, 2]."""
        bsz, q, c = query.shape
        if value is None:
            value = jnp.stack([query, query], axis=1).reshape(
                bsz * 2, q, c)
        if identity is None:
            identity = query
        if query_pos is not None:
            query = query + query_pos
        nq = self.num_bev_queue
        # condition the offsets on (prev value, query)
        query_c = jnp.concatenate(
            [value[0::nq].reshape(bsz, q, c), query], axis=-1)
        value = nn.Dense(self.embed_dims, name="value_proj")(value)
        off_bias = self.param(
            "sampling_offsets_bias",
            lambda k: jnp.tile(jnp.asarray(_grid_init(
                self.num_heads, self.num_levels, self.num_points)), nq))
        offsets = nn.Dense(
            self.num_heads * nq * self.num_levels * self.num_points * 2,
            kernel_init=nn.initializers.zeros, use_bias=False,
            name="sampling_offsets")(query_c) + off_bias
        offsets = offsets.reshape(bsz, q, self.num_heads, nq,
                                  self.num_levels, self.num_points, 2)
        weights = nn.Dense(
            self.num_heads * nq * self.num_levels * self.num_points,
            name="attention_weights")(query_c)
        weights = weights.reshape(
            bsz, q, self.num_heads, nq,
            self.num_levels * self.num_points)
        weights = jax.nn.softmax(weights, axis=-1).reshape(
            bsz, q, self.num_heads, nq, self.num_levels, self.num_points)
        # fold the queue axis into batch (reference :212-216)
        weights = weights.transpose(0, 3, 1, 2, 4, 5).reshape(
            bsz * nq, q, self.num_heads, self.num_levels,
            self.num_points)
        offsets = offsets.transpose(0, 3, 1, 2, 4, 5, 6).reshape(
            bsz * nq, q, self.num_heads, self.num_levels,
            self.num_points, 2)
        norm = jnp.asarray([[w, h] for h, w in spatial_shapes],
                           jnp.float32)
        if reference_points.shape[0] == bsz:
            # same refs for both queue slots
            ref = jnp.stack([reference_points] * nq, axis=1).reshape(
                (bsz * nq,) + reference_points.shape[1:])
        else:
            # hybrid refs [B*2, Q, 1, 2]: prev slot pre-shifted by ego
            # motion (reference encoder.forward hybird_ref_2d)
            ref = reference_points
        locs = ref[:, :, None, :, None, :] + \
            offsets / norm[None, None, None, :, None, :]
        value = value.reshape(bsz * nq, q, self.embed_dims)
        vh = value.reshape(bsz * nq, q, self.num_heads, -1)
        out = ms_deform_attn(vh, tuple(spatial_shapes), locs, weights)
        # average the two queue outputs (reference :250-256)
        out = out.reshape(bsz, nq, q, self.embed_dims).mean(axis=1)
        out = nn.Dense(self.embed_dims, name="output_proj")(out)
        if train and self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out + identity


@ATTENTION.register_module()
class CustomMSDeformableAttention(nn.Module):
    """Plain deformable attention (decoder cross-attn,
    reference decoder.py CustomMSDeformableAttention)."""
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 1
    num_points: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(self, query, value, reference_points, spatial_shapes,
                 query_pos=None, identity=None, train: bool = False):
        """query [B, Q, C]; value [B, sum(HW), C];
        reference_points [B, Q, 2] or [B, Q, 4] normalized."""
        if identity is None:
            identity = query
        if query_pos is not None:
            query = query + query_pos
        bsz, q, _ = query.shape
        nv = value.shape[1]
        value = nn.Dense(self.embed_dims, name="value_proj")(value)
        vh = value.reshape(bsz, nv, self.num_heads, -1)
        off_bias = self.param(
            "sampling_offsets_bias",
            lambda k: jnp.asarray(_grid_init(
                self.num_heads, self.num_levels, self.num_points)))
        offsets = nn.Dense(
            self.num_heads * self.num_levels * self.num_points * 2,
            kernel_init=nn.initializers.zeros, use_bias=False,
            name="sampling_offsets")(query) + off_bias
        offsets = offsets.reshape(bsz, q, self.num_heads,
                                  self.num_levels, self.num_points, 2)
        weights = nn.Dense(self.num_heads * self.num_levels *
                           self.num_points, name="attention_weights")(
            query)
        weights = jax.nn.softmax(weights.reshape(
            bsz, q, self.num_heads,
            self.num_levels * self.num_points), axis=-1).reshape(
            bsz, q, self.num_heads, self.num_levels, self.num_points)
        if reference_points.shape[-1] == 2:
            norm = jnp.asarray([[w, h] for h, w in spatial_shapes],
                               jnp.float32)
            locs = reference_points[:, :, None, None, None, :] + \
                offsets / norm[None, None, None, :, None, :]
        else:
            locs = reference_points[:, :, None, None, None, :2] + \
                offsets / self.num_points * \
                reference_points[:, :, None, None, None, 2:] * 0.5
        out = ms_deform_attn(vh, tuple(spatial_shapes), locs, weights)
        out = nn.Dense(self.embed_dims, name="output_proj")(out)
        if train and self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out + identity


class MultiheadAttention(nn.Module):
    """Standard MHA with residual (decoder self-attention)."""
    embed_dims: int = 256
    num_heads: int = 8
    dropout: float = 0.1

    @nn.compact
    def __call__(self, query, key=None, value=None, query_pos=None,
                 key_pos=None, identity=None, train: bool = False):
        if key is None:
            key = query
        if value is None:
            value = key
        if identity is None:
            identity = query
        qq = query + query_pos if query_pos is not None else query
        kk = key + key_pos if key_pos is not None else key
        out = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.embed_dims,
            name="attn", deterministic=not train,
            dropout_rate=self.dropout)(qq, kk, value)
        return out + identity


class FFN(nn.Module):
    embed_dims: int = 256
    feedforward_channels: int = 512
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, identity=None, train: bool = False):
        if identity is None:
            identity = x
        y = nn.Dense(self.feedforward_channels, name="fc1")(x)
        y = nn.relu(y)
        if train and self.dropout > 0:
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(self.embed_dims, name="fc2")(y)
        if train and self.dropout > 0:
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return y + identity
