"""Image FPN necks.

``FPNForBEVDet`` — small FPN returning selected ``out_ids``
(reference: mmdet3d/models/necks/fpn.py:10-204): lateral 1x1 convs,
top-down nearest upsample + add, 3x3 output convs.

``FPN`` — standard mmdet FPN (4 levels, used as BEVFormer img_neck with
``add_extra_convs='on_output'``).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builder import NECKS


def _upsample_nearest(x, factor: int):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :],
                         (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


def _resize_to(x, hw):
    """Nearest resize to target (h, w) — handles non-integer factors."""
    b, h, w, c = x.shape
    th, tw = hw
    ry = (jnp.arange(th) * h // th).astype(jnp.int32)
    rx = (jnp.arange(tw) * w // tw).astype(jnp.int32)
    return x[:, ry][:, :, rx]


@NECKS.register_module()
class FPNForBEVDet(nn.Module):
    in_channels: Sequence[int] = (1024, 2048)
    out_channels: int = 512
    num_outs: int = 1
    start_level: int = 0
    end_level: int = -1
    out_ids: Sequence[int] = (0,)
    add_extra_convs: Any = False
    norm_cfg: Any = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        n = len(self.in_channels)
        laterals = [
            nn.Conv(self.out_channels, (1, 1), name=f"lateral_{i}")(
                feats[self.start_level + i])
            for i in range(n - self.start_level)
        ]
        for i in range(len(laterals) - 1, 0, -1):
            up = _resize_to(laterals[i], laterals[i - 1].shape[1:3])
            laterals[i - 1] = laterals[i - 1] + up
        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    name=f"fpn_conv_{i}")(laterals[i])
            for i in self.out_ids
        ]
        if len(outs) == 1:
            return outs[0]
        return tuple(outs)


@NECKS.register_module()
class FPN(nn.Module):
    """Standard mmdet FPN (multi-level outputs, optional extra levels)."""
    in_channels: Sequence[int] = (256, 512, 1024, 2048)
    out_channels: int = 256
    num_outs: int = 4
    start_level: int = 0
    add_extra_convs: Any = False
    relu_before_extra_convs: bool = False
    norm_cfg: Any = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        from ..layers import make_norm
        use_norm = self.norm_cfg is not None

        def conv_norm(x, ks, name, strides=(1, 1)):
            pad = ((ks // 2,) * 2,) * 2
            y = nn.Conv(self.out_channels, (ks, ks), strides=strides,
                        padding=pad, use_bias=not use_norm,
                        name=name)(x)
            if use_norm:
                y = make_norm(dict(self.norm_cfg))(name=f"{name}_bn")(
                    y, use_running_average=not train)
            return y

        used = feats[self.start_level:]
        laterals = [conv_norm(f, 1, f"lateral_{i}")
                    for i, f in enumerate(used)]
        for i in range(len(laterals) - 1, 0, -1):
            up = _resize_to(laterals[i], laterals[i - 1].shape[1:3])
            laterals[i - 1] = laterals[i - 1] + up
        outs = [conv_norm(laterals[i], 3, f"fpn_conv_{i}")
                for i in range(len(laterals))]
        # extra levels: mmdet default (add_extra_convs=False) subsamples
        # the last output with a stride-2 1x1 maxpool; conv variants add
        # parametrized stride-2 convs
        extra_source = outs[-1]
        for i in range(len(outs), self.num_outs):
            if not self.add_extra_convs:
                outs.append(extra_source[:, ::2, ::2, :])
                extra_source = outs[-1]
                continue
            if self.relu_before_extra_convs:
                extra_source = nn.relu(extra_source)
            extra_source = conv_norm(extra_source, 3, f"extra_conv_{i}",
                                     strides=(2, 2))
            outs.append(extra_source)
        return tuple(outs)


@NECKS.register_module()
class FPN_LSS(nn.Module):
    """Upsample-concat 2-level FPN for the BEV encoder neck
    (reference: mmdet3d/models/necks/lss_fpn.py:10-75)."""
    in_channels: int = 640
    out_channels: int = 256
    scale_factor: int = 4
    input_feature_index: Sequence[int] = (0, 2)
    norm_cfg: Any = None
    extra_upsample: Any = 2
    lateral: Any = None
    extra_norm_act: bool = False

    @nn.compact
    def __call__(self, feats, train: bool = False):
        from ..layers import ConvModule, make_norm, get_activation
        x2 = feats[self.input_feature_index[0]]
        x1 = feats[self.input_feature_index[1]]
        norm = self.norm_cfg or dict(type="BN")
        if self.lateral is not None:
            x2 = ConvModule(int(self.lateral), 1, norm_cfg=norm,
                            name="lateral_conv")(x2, train=train)
        x1 = _bilinear_upsample(x1, self.scale_factor)
        x = jnp.concatenate([x2, x1], axis=-1)
        extra = self.extra_upsample is not None
        ch = self.out_channels * (2 if extra else 1)
        x = ConvModule(ch, 3, padding=1, norm_cfg=norm,
                       name="conv0")(x, train=train)
        x = ConvModule(ch, 3, padding=1, norm_cfg=norm,
                       name="conv1")(x, train=train)
        if extra:
            x = _bilinear_upsample(x, int(self.extra_upsample))
            x = ConvModule(self.out_channels, 3, padding=1, norm_cfg=norm,
                           name="up2_conv0")(x, train=train)
            x = nn.Conv(self.out_channels, (1, 1), name="up2_conv1")(x)
            if self.extra_norm_act:
                x = make_norm(norm)(name="up2_norm")(
                    x, use_running_average=not train)
                x = nn.relu(x)
        return x


def _bilinear_upsample(x, factor: int):
    """Bilinear x factor upsample, align_corners=True (torch Upsample)."""
    b, h, w, c = x.shape
    th, tw = h * factor, w * factor
    ys = jnp.linspace(0.0, h - 1.0, th)
    xs = jnp.linspace(0.0, w - 1.0, tw)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    # lerp weights in the feature dtype — fp32 weights would promote
    # the whole [B, th, tw, C] product chain under bf16 mixed precision
    ly = (ys - y0)[None, :, None, None].astype(x.dtype)
    lx = (xs - x0)[None, None, :, None].astype(x.dtype)
    v00 = x[:, y0][:, :, x0]
    v01 = x[:, y0][:, :, x1]
    v10 = x[:, y1][:, :, x0]
    v11 = x[:, y1][:, :, x1]
    return (v00 * (1 - ly) * (1 - lx) + v01 * (1 - ly) * lx +
            v10 * ly * (1 - lx) + v11 * ly * lx)
