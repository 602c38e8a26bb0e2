"""Adaptation-layer zoo for distillation feature pairing.

Capability parity with the reference's adaptation construction
(reference: mmdet3d/models/detectors/bevdet_distill.py — Mlp:48,
TwoLayer:71, ThreeLayer:99, the fgd zoo:216-358; bevformer_distill.py adds
interpolate_1x1conv:218-227).  Each adaptation carries an effective
``stride`` used by the field-of-view alignment assert
(bevdet_distill.py:1491-1494) — stride < 1 means upsampling.

Channels-last; upsampling is bilinear align_corners=True like the
reference's nn.Upsample.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..layers import make_norm
from ..necks.fpn import _bilinear_upsample


class MlpAdapt(nn.Module):
    out_features: int
    hidden_features: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = self.hidden_features or x.shape[-1]
        x = nn.Conv(hidden, (1, 1), name="fc1")(x)
        x = nn.relu(x)
        return nn.Conv(self.out_features, (1, 1), name="fc2")(x)


class TwoLayer(nn.Module):
    out_features: int
    kernel_size: int = 4
    stride: int = 4
    hidden_features: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = self.hidden_features or x.shape[-1]
        norm = make_norm(dict(type="BN"))
        x = nn.Conv(hidden, (self.kernel_size,) * 2,
                    strides=(self.stride,) * 2, name="conv1")(x)
        x = norm(name="norm1")(x, use_running_average=not train)
        x = nn.relu(x)
        x = nn.Conv(self.out_features, (1, 1), name="conv2")(x)
        x = norm(name="norm2")(x, use_running_average=not train)
        return nn.relu(x)


class ThreeLayer(nn.Module):
    out_features: int
    kernel_size: int = 4
    stride: int = 4
    hidden_features: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = self.hidden_features or x.shape[-1]
        norm = make_norm(dict(type="BN"))
        x = nn.Conv(hidden, (self.kernel_size,) * 2,
                    strides=(self.stride,) * 2, name="conv1")(x)
        x = norm(name="norm1")(x, use_running_average=not train)
        x = nn.relu(x)
        x = nn.Conv(hidden, (1, 1), name="conv2")(x)
        x = norm(name="norm2")(x, use_running_average=not train)
        x = nn.relu(x)
        x = nn.Conv(self.out_features, (1, 1), name="conv3")(x)
        x = norm(name="norm3")(x, use_running_average=not train)
        return nn.relu(x)


class StudentAdaptation(nn.Module):
    """One student channel-wise adaptation, selected by type string."""
    adaptation_type: str
    out_channels: int
    params_cfg: Any = None     # student_adaptation_params dict

    @property
    def stride(self) -> float:
        p = dict(self.params_cfg or {})
        t = self.adaptation_type
        if t in ("1x1conv", "3x3conv", "mlp", "2layer", "3layer",
                 "identity"):
            return 1.0
        if t == "downsample_2layer":
            return float(p.get("downsample_stride", 4))
        if t in ("upsample_2layer", "upsample_3layer", "upsample_1x1conv"):
            return float(p.get("stride", 1)) / float(
                p.get("upsample_factor", 4))
        if t == "avgpool_1x1conv":
            return float(p.get("downsample_kernel_size", 4))
        if t == "interpolate_1x1conv":
            return 1.0 / float(p.get("upsample_factor", 4))
        raise NotImplementedError(t)

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = dict(self.params_cfg or {})
        t = self.adaptation_type
        if t == "identity":
            return x
        if t == "1x1conv":
            return nn.Conv(self.out_channels, (1, 1), name="conv")(x)
        if t == "3x3conv":
            return nn.Conv(self.out_channels, (3, 3),
                           padding=((1, 1), (1, 1)), name="conv")(x)
        if t == "mlp":
            return MlpAdapt(self.out_channels, name="mlp")(x, train=train)
        if t == "2layer":
            return TwoLayer(self.out_channels, kernel_size=1, stride=1,
                            name="two")(x, train=train)
        if t == "3layer":
            return ThreeLayer(self.out_channels, kernel_size=1, stride=1,
                              name="three")(x, train=train)
        if t == "downsample_2layer":
            return TwoLayer(self.out_channels,
                            kernel_size=p.get("downsample_kernel_size", 4),
                            stride=p.get("downsample_stride", 4),
                            name="two")(x, train=train)
        if t in ("upsample_2layer", "upsample_3layer", "upsample_1x1conv",
                 "interpolate_1x1conv"):
            x = _bilinear_upsample(x, int(p.get("upsample_factor", 4)))
            if t == "upsample_2layer":
                return TwoLayer(self.out_channels, kernel_size=1, stride=1,
                                name="two")(x, train=train)
            if t == "upsample_3layer":
                return ThreeLayer(self.out_channels, kernel_size=1,
                                  stride=1, name="three")(x, train=train)
            return nn.Conv(self.out_channels, (1, 1), name="conv")(x)
        if t == "avgpool_1x1conv":
            k = int(p.get("downsample_kernel_size", 4))
            x = nn.avg_pool(x, (k, k), strides=(k, k))
            return nn.Conv(self.out_channels, (1, 1), name="conv")(x)
        raise NotImplementedError(t)


class TeacherAdaptation(nn.Module):
    """Teacher-side adaptation (pool/identity/conv variants)."""
    adaptation_type: str
    out_channels: Optional[int] = None
    params_cfg: Any = None     # teacher_adaptation_params dict

    @property
    def stride(self) -> float:
        p = dict(self.params_cfg or {})
        t = self.adaptation_type
        if t == "identity":
            return 1.0
        if t in ("avgpool", "maxpool", "avgpool_3layer"):
            return float(p.get("stride", p.get("kernel_size", 1)))
        if t == "downsample_3layer":
            return float(p.get("stride", 4))
        raise NotImplementedError(t)

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = dict(self.params_cfg or {})
        t = self.adaptation_type
        if t == "identity":
            return x
        if t in ("avgpool", "maxpool", "avgpool_3layer"):
            k = int(p.get("kernel_size", 2))
            s = int(p.get("stride", k))
            pool = nn.avg_pool if t.startswith("avg") else nn.max_pool
            x = pool(x, (k, k), strides=(s, s))
            if t == "avgpool_3layer":
                x = ThreeLayer(self.out_channels, kernel_size=1, stride=1,
                               name="three")(x, train=train)
            return x
        if t == "downsample_3layer":
            return ThreeLayer(self.out_channels,
                              kernel_size=p.get("kernel_size", 4),
                              stride=p.get("stride", 4),
                              name="three")(x, train=train)
        raise NotImplementedError(t)
