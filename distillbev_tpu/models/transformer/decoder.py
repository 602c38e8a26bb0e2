"""DETR-style box-refining decoder (shared by BEVFormer student and the
LidarFormer/MVPFormer teachers).

Capability parity with the reference decoder
(reference: mmdet3d/models/transformer_modules/decoder.py —
DetectionTransformerDecoder with iterative sigmoid-space reference-point
refinement via ``reg_branches``; layers of MHA self-attn ->
CustomMSDeformableAttention cross-attn -> FFN with post-norms).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builder import TRANSFORMERS
from .attention import (FFN, CustomMSDeformableAttention,
                        MultiheadAttention)


def inverse_sigmoid(x, eps: float = 1e-5):
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


class DetrDecoderLayer(nn.Module):
    embed_dims: int = 256
    num_heads: int = 8
    feedforward_channels: int = 512
    num_points: int = 4
    dropout: float = 0.1

    @nn.compact
    def __call__(self, query, value, query_pos, reference_points,
                 spatial_shapes, train: bool = False):
        query = MultiheadAttention(
            embed_dims=self.embed_dims, num_heads=self.num_heads,
            dropout=self.dropout, name="self_attn")(
            query, query_pos=query_pos, key_pos=query_pos, train=train)
        query = nn.LayerNorm(epsilon=1e-5, name="norm1")(query)
        query = CustomMSDeformableAttention(
            embed_dims=self.embed_dims, num_heads=self.num_heads,
            num_levels=1, num_points=self.num_points,
            dropout=self.dropout, name="cross_attn")(
            query, value, reference_points, spatial_shapes,
            query_pos=query_pos, train=train)
        query = nn.LayerNorm(epsilon=1e-5, name="norm2")(query)
        query = FFN(embed_dims=self.embed_dims,
                    feedforward_channels=self.feedforward_channels,
                    dropout=self.dropout, name="ffn")(query, train=train)
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(query)


@TRANSFORMERS.register_module()
class DetectionTransformerDecoder(nn.Module):
    num_layers: int = 6
    embed_dims: int = 256
    num_heads: int = 8
    feedforward_channels: int = 512
    num_points: int = 4
    dropout: float = 0.1
    return_intermediate: bool = True

    @nn.compact
    def __call__(self, query, value, query_pos, reference_points,
                 spatial_shapes, reg_branch: Optional[Callable] = None,
                 train: bool = False):
        """query [B, Q, C]; value [B, H*W, C] (BEV memory);
        reference_points [B, Q, 2] (sigmoid space, normalized) ->
        (inter_states [L, B, Q, C], inter_refs [L, B, Q, 2])."""
        intermediate, inter_refs = [], []
        for i in range(self.num_layers):
            query = DetrDecoderLayer(
                embed_dims=self.embed_dims, num_heads=self.num_heads,
                feedforward_channels=self.feedforward_channels,
                num_points=self.num_points, dropout=self.dropout,
                name=f"layer_{i}")(
                query, value, query_pos, reference_points[..., :2],
                spatial_shapes, train=train)
            if reg_branch is not None:
                # iterative refinement (reference decoder.py): xy from
                # delta[:2], z (if 3d refs) from delta[4:5], both in
                # inverse-sigmoid space
                delta = reg_branch(i, query)
                new_xy = jax.nn.sigmoid(
                    delta[..., :2] +
                    inverse_sigmoid(reference_points[..., :2]))
                if reference_points.shape[-1] == 3:
                    new_z = jax.nn.sigmoid(
                        delta[..., 4:5] +
                        inverse_sigmoid(reference_points[..., 2:3]))
                    new_ref = jnp.concatenate([new_xy, new_z], -1)
                else:
                    new_ref = new_xy
                reference_points = jax.lax.stop_gradient(new_ref)
            intermediate.append(query)
            inter_refs.append(reference_points)
        if self.return_intermediate:
            return jnp.stack(intermediate), jnp.stack(inter_refs)
        return query[None], reference_points[None]
