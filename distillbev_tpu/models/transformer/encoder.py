"""BEVFormer encoder: TSA -> SCA -> FFN layers over the BEV query grid.

Capability parity with the reference encoder
(reference: mmdet3d/models/transformer_modules/encoder.py —
BEVFormerEncoder:27 with get_reference_points:49-89 (3d pillar refs + 2d
bev refs) and fp32 point_sampling:91-146; BEVFormerLayer:238 with the
TSA->norm->SCA->norm->FFN->norm operation order).

TPU-native: ``point_sampling`` is a single fused einsum over the static
``lidar2img`` stack; the per-layer loop is unrolled python (6 layers,
one trace) or — with ``scan_layers=True`` — an ``nn.scan`` over ONE
stacked layer, shrinking the compiled HLO ~6x (the full-size student's
unrolled graph crashes this environment's remote TPU compile worker).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..builder import TRANSFORMERS
from .attention import (FFN, SpatialCrossAttention, TemporalSelfAttention)


def get_reference_points_3d(h: int, w: int, z: float,
                            num_points_in_pillar: int) -> np.ndarray:
    """[P, H*W, 3] normalized pillar reference points (reference :62-72)."""
    zs = (np.linspace(0.5, z - 0.5, num_points_in_pillar) / z)
    xs = (np.linspace(0.5, w - 0.5, w) / w)
    ys = (np.linspace(0.5, h - 0.5, h) / h)
    out = np.zeros((num_points_in_pillar, h, w, 3), np.float32)
    out[..., 0] = xs[None, None, :]
    out[..., 1] = ys[None, :, None]
    out[..., 2] = zs[:, None, None]
    return out.reshape(num_points_in_pillar, h * w, 3)


def get_reference_points_2d(h: int, w: int) -> np.ndarray:
    """[H*W, 1, 2] normalized BEV-plane reference points."""
    ys, xs = np.meshgrid(np.linspace(0.5, h - 0.5, h) / h,
                         np.linspace(0.5, w - 0.5, w) / w,
                         indexing="ij")
    return np.stack([xs.reshape(-1), ys.reshape(-1)],
                    -1).reshape(h * w, 1, 2).astype(np.float32)


def point_sampling(ref_3d: jnp.ndarray, pc_range: Sequence[float],
                   lidar2img: jnp.ndarray, img_shape: Tuple[int, int]):
    """Project pillar reference points into each camera (fp32; reference
    encoder.py:91-146).

    ref_3d [P, Q, 3] normalized; lidar2img [B, N, 4, 4];
    -> reference_points_cam [N, B, Q, P, 2], bev_mask [N, B, Q, P].
    """
    pcr = jnp.asarray(pc_range, jnp.float32)
    pts = ref_3d.astype(jnp.float32)
    xyz = jnp.stack([
        pts[..., 0] * (pcr[3] - pcr[0]) + pcr[0],
        pts[..., 1] * (pcr[4] - pcr[1]) + pcr[1],
        pts[..., 2] * (pcr[5] - pcr[2]) + pcr[2]], axis=-1)
    hom = jnp.concatenate([xyz, jnp.ones_like(xyz[..., :1])], -1)
    # [B, N, P, Q, 4] = l2i [B,N,4,4] @ hom [P,Q,4]
    cam = jnp.einsum("bnij,pqj->bnpqi", lidar2img.astype(jnp.float32),
                     hom)
    eps = 1e-5
    depth = cam[..., 2:3]
    mask = depth > eps
    uv = cam[..., 0:2] / jnp.maximum(depth, eps)
    uv = uv / jnp.asarray([img_shape[1], img_shape[0]], jnp.float32)
    mask = (mask[..., 0] & (uv[..., 0] > 0.0) & (uv[..., 0] < 1.0) &
            (uv[..., 1] > 0.0) & (uv[..., 1] < 1.0))
    # -> [N, B, Q, P, 2] / [N, B, Q, P]
    uv = uv.transpose(1, 0, 3, 2, 4)
    mask = mask.transpose(1, 0, 3, 2)
    return uv, mask


class BEVFormerLayer(nn.Module):
    """One encoder layer: TSA -> LN -> SCA -> LN -> FFN -> LN."""
    embed_dims: int = 256
    num_heads: int = 8
    feedforward_channels: int = 512
    num_levels: int = 4
    num_points_sca: int = 8
    num_points_tsa: int = 4
    dropout: float = 0.1
    num_cams: int = 6
    max_queries_per_cam: Optional[int] = None

    @nn.compact
    def __call__(self, query, value, prev_bev, ref_2d, ref_cam,
                 bev_mask, bev_pos, spatial_shapes, bev_hw, shift=None,
                 prev_valid=None, sca_select=None, init_query=None,
                 train: bool = False):
        bsz, q, c = query.shape
        tsa_value = None
        tsa_ref = ref_2d
        if prev_bev is not None:
            # query dtype rules the TSA stack (a fp32 prev_bev would
            # promote the whole encoder under bf16 mixed precision)
            pb = prev_bev.astype(query.dtype)
            # the reference builds the TSA value stack ONCE per encoder
            # call as [prev_bev, INITIAL bev_query] and passes the SAME
            # stack to every layer (reference encoder.py:199-207 +
            # the layer's self_attn call) — NOT restacked with the
            # current layer's query (round-4 whole-model golden)
            q1 = init_query.astype(query.dtype) if init_query is not \
                None else query
            if prev_valid is not None:
                # per-sample "no history" -> reference prev_bev=None
                # semantics (TSA restacks the CURRENT query in both
                # queue slots) without a separate trace; the scene-reset
                # state machine zeroes can_bus deltas, so the prev-slot
                # ref shift/rotation are no-ops in that case too
                pb = jnp.where(prev_valid[:, None, None] > 0, pb, query)
                q1 = jnp.where(prev_valid[:, None, None] > 0, q1, query)
            tsa_value = jnp.stack([pb, q1], axis=1).reshape(
                bsz * 2, q, c)
            if shift is not None:
                # ego-motion shift applied to BOTH queue slots: the
                # reference's ``shift_ref_2d = ref_2d`` (no .clone())
                # mutates ref_2d in place, and its own comment keeps
                # the bug for reproducibility (reference
                # encoder.py:191-207) — checkpoint parity requires
                # matching it (round-4 whole-model golden)
                shifted = ref_2d + shift[:, None, None, :]
                tsa_ref = jnp.stack([shifted, shifted], axis=1).reshape(
                    (bsz * 2,) + ref_2d.shape[1:])
        query = TemporalSelfAttention(
            embed_dims=self.embed_dims, num_heads=self.num_heads,
            num_points=self.num_points_tsa, dropout=self.dropout,
            name="tsa")(query, value=tsa_value, query_pos=bev_pos,
                        reference_points=tsa_ref,
                        spatial_shapes=(bev_hw,), train=train)
        query = nn.LayerNorm(epsilon=1e-5, name="norm1")(query)
        query = SpatialCrossAttention(
            embed_dims=self.embed_dims, num_cams=self.num_cams,
            dropout=self.dropout,
            deformable_attention=dict(
                num_heads=self.num_heads, num_levels=self.num_levels,
                num_points=self.num_points_sca),
            max_queries_per_cam=self.max_queries_per_cam,
            name="sca")(query, value, ref_cam, bev_mask, spatial_shapes,
                        query_pos=None, precomputed_select=sca_select,
                        train=train)
        query = nn.LayerNorm(epsilon=1e-5, name="norm2")(query)
        query = FFN(embed_dims=self.embed_dims,
                    feedforward_channels=self.feedforward_channels,
                    dropout=self.dropout, name="ffn")(query, train=train)
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(query)


@TRANSFORMERS.register_module()
class BEVFormerEncoder(nn.Module):
    num_layers: int = 6
    pc_range: Any = None
    num_points_in_pillar: int = 4
    embed_dims: int = 256
    num_heads: int = 8
    feedforward_channels: int = 512
    num_levels: int = 4
    num_cams: int = 6
    dropout: float = 0.1
    return_intermediate: bool = False
    max_queries_per_cam: Optional[int] = None
    # rematerialize each encoder layer in the backward pass (the
    # reference's with_cp grad-checkpointing); the full-size student
    # (bev 200x200, 6 layers) needs this to fit one 16 GB v5e chip
    with_cp: bool = False
    # with with_cp: SAVE the deformable-attention sampled outputs
    # (named "msda_out", ~20-50 MB/layer bf16) instead of re-running
    # the sampling core in the backward replay — the sampling core is
    # the step-time bottleneck and its fwd is ~200 ms/layer full-size
    cp_save_attn: bool = True
    # lax.scan over ONE stacked layer instead of 6 unrolled copies:
    # identical math, ~6x smaller HLO (and proportionally faster
    # compiles).  Param tree changes from layer_{i}/... to layers/...
    # with a leading [num_layers] axis; training.param_utils handles
    # the conversion from per-layer torch checkpoints.
    scan_layers: bool = False

    def _cp_policy(self):
        if not self.cp_save_attn:
            return None
        import jax
        return jax.checkpoint_policies.save_only_these_names(
            "msda_out")

    @nn.compact
    def __call__(self, bev_query, value, bev_h: int, bev_w: int,
                 bev_pos=None, prev_bev=None, lidar2img=None,
                 img_shape=None, spatial_shapes=None, shift=None,
                 prev_valid=None, sca_budget=None,
                 train: bool = False):
        """bev_query [B, H*W, C]; value [B, N_cam, sum(HW), C];
        lidar2img [B, N_cam, 4, 4]."""
        pcr = list(self.pc_range)
        z_size = pcr[5] - pcr[2]
        ref_3d = jnp.asarray(get_reference_points_3d(
            bev_h, bev_w, z_size, self.num_points_in_pillar))
        # normalize z against the pillar height directly (reference
        # normalizes zs by Z then rescales with pc_range)
        ref_2d = jnp.asarray(get_reference_points_2d(bev_h, bev_w))
        ref_2d = jnp.broadcast_to(ref_2d[None],
                                  (bev_query.shape[0],) + ref_2d.shape)
        ref_cam, bev_mask = point_sampling(ref_3d, pcr, lidar2img,
                                           img_shape)
        # hoist the SCA top-K selection out of the layer loop: it
        # depends only on the frame geometry, so the [N_cam, B, Q]
        # top_k sort + ref gather run ONCE per frame instead of once
        # per layer (attention.py SpatialCrossAttention.select)
        from .attention import SpatialCrossAttention
        if sca_budget:
            q_total = bev_query.shape[1]
            if 0 < float(sca_budget) < 1:
                # fractional budget = fraction of Q (docs speak of
                # "0.35Q"); int() alone would truncate 0.35 to k=0 and
                # silently produce an empty SCA
                budget = max(int(float(sca_budget) * q_total), 1)
            else:
                budget = int(sca_budget)
                assert budget >= 1, (
                    f"sca_budget={sca_budget!r} truncates to <1 query; "
                    "pass an absolute count >=1 or a fraction in (0,1)")
            # clamp to Q: a full-size recipe's history budget must not
            # break --cfg-options runs at shrunken BEV grids
            budget = min(budget, q_total)
        else:
            budget = SpatialCrossAttention.budget(
                bev_query.shape[1], self.max_queries_per_cam)
        sca_select = SpatialCrossAttention.select(ref_cam, bev_mask,
                                                  budget)
        out = bev_query
        layer_kwargs = dict(
            embed_dims=self.embed_dims, num_heads=self.num_heads,
            feedforward_channels=self.feedforward_channels,
            num_levels=self.num_levels, num_cams=self.num_cams,
            dropout=self.dropout,
            max_queries_per_cam=self.max_queries_per_cam)
        if self.scan_layers:
            def body(mdl, carry, _xs):
                q = mdl(carry, value, prev_bev, ref_2d, ref_cam,
                        bev_mask, bev_pos, spatial_shapes,
                        (bev_h, bev_w), shift=shift,
                        prev_valid=prev_valid, sca_select=sca_select,
                        init_query=bev_query, train=train)
                return q, (q if self.return_intermediate else ())
            if self.with_cp and train:
                body = nn.remat(body, prevent_cse=False,
                                policy=self._cp_policy())
            scan = nn.scan(body, variable_axes={"params": 0},
                           split_rngs={"params": True, "dropout": True},
                           length=self.num_layers)
            out, ys = scan(BEVFormerLayer(**layer_kwargs, name="layers"),
                           out, None)
            if self.return_intermediate:
                return ys
            return out
        intermediate = []
        for i in range(self.num_layers):
            layer = BEVFormerLayer(**layer_kwargs, name=f"layer_{i}")
            if self.with_cp and train:
                def body(mdl, q, v, pb, r2, rc, bm, bp, sh, pv, sel,
                         q0):
                    return mdl(q, v, pb, r2, rc, bm, bp,
                               spatial_shapes, (bev_h, bev_w),
                               shift=sh, prev_valid=pv, sca_select=sel,
                               init_query=q0, train=train)
                out = nn.remat(body, policy=self._cp_policy())(
                    layer, out, value, prev_bev, ref_2d, ref_cam,
                    bev_mask, bev_pos, shift, prev_valid, sca_select,
                    bev_query)
            else:
                out = layer(out, value, prev_bev, ref_2d, ref_cam,
                            bev_mask, bev_pos, spatial_shapes,
                            (bev_h, bev_w), shift=shift,
                            prev_valid=prev_valid, sca_select=sca_select,
                            init_query=bev_query, train=train)
            if self.return_intermediate:
                intermediate.append(out)
        if self.return_intermediate:
            return jnp.stack(intermediate)
        return out
