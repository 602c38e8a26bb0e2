"""SECOND BEV backbone.

Capability parity with the reference's ``SECOND``
(reference: mmdet3d/models/backbones/second.py:11-90): stacked conv stages
over the BEV canvas returning one feature map per stage.  Channels-last.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..builder import BACKBONES
from ..layers import ConvModule


@BACKBONES.register_module()
class SECOND(nn.Module):
    in_channels: int = 128
    out_channels: Sequence[int] = (128, 128, 256)
    layer_nums: Sequence[int] = (3, 5, 5)
    layer_strides: Sequence[int] = (2, 2, 2)
    norm_cfg: Any = None
    conv_cfg: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        outs = []
        for i, (ch, n, s) in enumerate(zip(self.out_channels,
                                           self.layer_nums,
                                           self.layer_strides)):
            x = ConvModule(ch, 3, stride=s, padding=1,
                           norm_cfg=self.norm_cfg or dict(type="BN"),
                           name=f"stage{i}_conv0")(x, train=train)
            for j in range(n):
                x = ConvModule(ch, 3, padding=1,
                               norm_cfg=self.norm_cfg or dict(type="BN"),
                               name=f"stage{i}_conv{j + 1}")(x, train=train)
            outs.append(x)
        return tuple(outs)
