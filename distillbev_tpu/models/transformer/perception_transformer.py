"""PerceptionTransformer: BEV feature construction + detection decoding.

Capability parity with the reference orchestrator
(reference: mmdet3d/models/transformer_modules/perception_transformer.py
:19-280 — can-bus MLP conditioning, ego-motion shift of prev BEV
reference points, optional rotation of prev BEV, cams/level embeddings,
encoder + decoder glue; and detr_transformer.py:20-330
DeformableDetrTransformerDistill for the single-scale LiDAR teachers).

TPU-native: can-bus scalars arrive as a [B, 18] array (not python meta
dicts); the prev-BEV rotation uses our grid_sample; everything is
batch-first and statically shaped.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..builder import TRANSFORMERS, build_transformer
from .encoder import BEVFormerEncoder
from .decoder import DetectionTransformerDecoder
from ...ops.grid_sample import grid_sample


def rotate_bev(bev: jnp.ndarray, angle_deg: jnp.ndarray) -> jnp.ndarray:
    """Rotate [B, H, W, C] BEV maps around their centers (reference uses
    torchvision rotate on prev_bev, perception_transformer.py:139-148)."""
    b, h, w, c = bev.shape
    ang = -angle_deg * jnp.pi / 180.0   # torchvision rotates CCW in image
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    ys = jnp.linspace(-1.0, 1.0, h)
    xs = jnp.linspace(-1.0, 1.0, w)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    gx2 = cos[:, None, None] * gx[None] - sin[:, None, None] * gy[None]
    gy2 = sin[:, None, None] * gx[None] + cos[:, None, None] * gy[None]
    grid = jnp.stack([gx2, gy2], axis=-1)
    return grid_sample(bev, grid, align_corners=True)


@TRANSFORMERS.register_module()
class PerceptionTransformer(nn.Module):
    embed_dims: int = 256
    num_cams: int = 6
    num_feature_levels: int = 4
    rotate_prev_bev: bool = True
    use_shift: bool = True
    use_can_bus: bool = True
    use_cams_embeds: bool = True
    rotate_center: Any = (100, 100)
    encoder: Any = None
    decoder: Any = None
    can_bus_dims: int = 18

    def _build_encoder(self):
        cfg = dict(self.encoder or {})
        cfg.pop("type", None)
        return BEVFormerEncoder(name="encoder", **cfg)

    def _build_decoder(self):
        cfg = dict(self.decoder or {})
        cfg.pop("type", None)
        return DetectionTransformerDecoder(name="decoder", **cfg)

    @nn.compact
    def __call__(self, mlvl_feats, bev_queries, object_query_embed,
                 bev_h: int, bev_w: int, grid_length=(0.512, 0.512),
                 bev_pos=None, prev_bev=None, can_bus=None,
                 lidar2img=None, img_shape=None,
                 reg_branch=None, only_bev: bool = False,
                 prev_valid=None, sca_budget=None,
                 train: bool = False):
        """mlvl_feats: list of [B, N_cam, H_l, W_l, C];
        bev_queries [H*W, C]; object_query_embed [Q, 2C];
        can_bus [B, 18]; lidar2img [B, N_cam, 4, 4].
        Returns bev_embed or (bev_embed, hs, init_ref, inter_refs)."""
        bsz = mlvl_feats[0].shape[0]
        bev_query = jnp.broadcast_to(
            bev_queries[None], (bsz,) + bev_queries.shape)

        # ego-motion shift (reference :115-135)
        if can_bus is not None:
            delta_x, delta_y = can_bus[:, 0], can_bus[:, 1]
            ego_angle = can_bus[:, -2] / jnp.pi * 180.0
            tl = jnp.sqrt(delta_x ** 2 + delta_y ** 2)
            ta = jnp.arctan2(delta_y, delta_x) / jnp.pi * 180.0
            bev_angle = ego_angle - ta
            shift_y = tl * jnp.cos(bev_angle / 180 * jnp.pi) / \
                grid_length[0] / bev_h
            shift_x = tl * jnp.sin(bev_angle / 180 * jnp.pi) / \
                grid_length[1] / bev_w
            shift = jnp.stack([shift_x, shift_y], -1) * float(
                self.use_shift)
        else:
            shift = jnp.zeros((bsz, 2))

        if prev_bev is not None and self.rotate_prev_bev and \
                can_bus is not None:
            rot_angle = can_bus[:, -1]
            pb = prev_bev.reshape(bsz, bev_h, bev_w, -1)
            pb = rotate_bev(pb, rot_angle)
            # back to the query compute dtype — a fp32 prev_bev (the
            # rotation grid-samples in fp32) would promote the TSA
            # [2B, Q, C] stack and cascade the WHOLE encoder to fp32
            # under bf16 mixed precision
            prev_bev = pb.reshape(bsz, bev_h * bev_w, -1).astype(
                bev_query.dtype)
        elif prev_bev is not None:
            prev_bev = prev_bev.astype(bev_query.dtype)

        if self.use_can_bus and can_bus is not None:
            cb = nn.Dense(self.embed_dims // 2, name="can_bus_fc1")(
                can_bus)
            cb = nn.relu(cb)
            cb = nn.Dense(self.embed_dims, name="can_bus_fc2")(cb)
            cb = nn.relu(cb)
            cb = nn.LayerNorm(epsilon=1e-5, name="can_bus_norm")(cb)
            # can_bus is fp32 signal data; don't let it promote the query
            bev_query = bev_query + cb[:, None, :].astype(bev_query.dtype)

        # flatten levels + add cam/level embeddings (reference :157-176)
        cams_embeds = self.param(
            "cams_embeds", nn.initializers.normal(1.0),
            (self.num_cams, self.embed_dims))
        level_embeds = self.param(
            "level_embeds", nn.initializers.normal(1.0),
            (self.num_feature_levels, self.embed_dims))
        flat, shapes = [], []
        for lvl, feat in enumerate(mlvl_feats):
            b, n, h, w, c = feat.shape
            f = feat.reshape(b, n, h * w, c)
            if self.use_cams_embeds:
                f = f + cams_embeds[None, :, None, :]
            f = f + level_embeds[None, None, None, lvl]
            flat.append(f)
            shapes.append((h, w))
        value = jnp.concatenate(flat, axis=2)     # [B, N, sum(HW), C]

        encoder = self._build_encoder()
        if bev_pos is not None:
            bev_pos = bev_pos.astype(bev_query.dtype)
        bev_embed = encoder(
            bev_query, value, bev_h, bev_w, bev_pos=bev_pos,
            prev_bev=prev_bev, lidar2img=lidar2img, img_shape=img_shape,
            spatial_shapes=tuple(shapes), shift=shift,
            prev_valid=prev_valid, sca_budget=sca_budget, train=train)
        if only_bev:
            return bev_embed

        # decoder: split object queries into (pos, query)
        query_pos, query = jnp.split(object_query_embed, 2, axis=-1)
        query_pos = jnp.broadcast_to(query_pos[None],
                                     (bsz,) + query_pos.shape)
        query = jnp.broadcast_to(query[None], (bsz,) + query.shape)
        ref = nn.Dense(3, name="reference_points")(query_pos)
        reference_points = jax.nn.sigmoid(ref)
        init_reference = reference_points
        decoder = self._build_decoder()
        inter_states, inter_refs = decoder(
            query, bev_embed, query_pos, reference_points,
            ((bev_h, bev_w),), reg_branch=reg_branch, train=train)
        return bev_embed, inter_states, init_reference, inter_refs


@TRANSFORMERS.register_module()
class DeformableDetrTransformerDistill(nn.Module):
    """Teacher transformer over multi-level LiDAR BEV features
    (reference: detr_transformer.py:20-330).

    Encoder: the learned BEV queries (+ sine pos) cross-attend into the
    flattened FPN levels with multi-scale deformable attention — six
    cross_attn->norm->ffn->norm layers (the reference's
    DetrTransformerEncoder with BaseTransformerLayer).  The output
    ``memory`` [B, bev_size^2, C] is the distillation surface
    (``bev_embed``).  Decoder: shared DetectionTransformerDecoder over
    that memory.  ``level_embeds`` exists for checkpoint parity; as in
    the reference's non-two-stage path it feeds only the (unused by
    deformable attention) key positional embeddings."""
    embed_dims: int = 256
    decoder: Any = None

    def _build_decoder(self):
        cfg = dict(self.decoder or {})
        cfg.pop("type", None)
        return DetectionTransformerDecoder(name="decoder", **cfg)

    num_encoder_layers: int = 6
    feedforward_channels: int = 512
    dropout: float = 0.1
    bev_size: int = 200
    num_feature_levels: int = 4

    @nn.compact
    def __call__(self, mlvl_feats, bev_queries, bev_pos,
                 object_query_embed, reg_branch=None,
                 train: bool = False):
        """mlvl_feats: list of [B, H_l, W_l, C]; bev_queries / bev_pos
        [bev_size^2, C]; object_query_embed [Q, 2C]."""
        from .attention import CustomMSDeformableAttention, FFN
        from .encoder import get_reference_points_2d
        b = mlvl_feats[0].shape[0]
        self.param("level_embed", nn.initializers.normal(1.0),
                   (self.num_feature_levels, self.embed_dims))
        shapes = []
        flat = []
        for f in mlvl_feats:
            _, h, w, c = f.shape
            shapes.append((h, w))
            flat.append(f.reshape(b, h * w, c))
        feat_flatten = jnp.concatenate(flat, axis=1)
        shapes = tuple(shapes)

        bev = jnp.broadcast_to(bev_queries[None], (b,) + bev_queries.shape)
        bev_pos_b = jnp.broadcast_to(bev_pos[None], (b,) + bev_pos.shape)
        # reference get_reference_points: bev-grid centers normalized by
        # bev_size, shared across levels (detr_transformer.py:134-160)
        ref = jnp.asarray(get_reference_points_2d(
            self.bev_size, self.bev_size))[:, 0, :]
        ref = jnp.broadcast_to(ref[None], (b,) + ref.shape)
        for i in range(self.num_encoder_layers):
            bev = CustomMSDeformableAttention(
                embed_dims=self.embed_dims, num_levels=len(shapes),
                dropout=self.dropout,
                name=f"enc_attn_{i}")(bev, feat_flatten, ref, shapes,
                                      query_pos=bev_pos_b, train=train)
            bev = nn.LayerNorm(epsilon=1e-5, name=f"enc_norm1_{i}")(bev)
            bev = FFN(embed_dims=self.embed_dims,
                      feedforward_channels=self.feedforward_channels,
                      dropout=self.dropout,
                      name=f"enc_ffn_{i}")(bev, train=train)
            bev = nn.LayerNorm(epsilon=1e-5, name=f"enc_norm2_{i}")(bev)
        memory = bev
        query_pos, query = jnp.split(object_query_embed, 2, axis=-1)
        query_pos = jnp.broadcast_to(query_pos[None],
                                     (b,) + query_pos.shape)
        query = jnp.broadcast_to(query[None], (b,) + query.shape)
        ref_q = nn.Dense(3, name="reference_points")(query_pos)
        reference_points = jax.nn.sigmoid(ref_q)
        decoder = self._build_decoder()
        inter_states, inter_refs = decoder(
            query, memory, query_pos, reference_points,
            ((self.bev_size, self.bev_size),),
            reg_branch=reg_branch, train=train)
        return memory, inter_states, reference_points, inter_refs
