"""SECONDFPN neck: per-scale (de)conv to a common resolution + concat.

Capability parity with the reference's ``SECONDFPN``
(reference: mmdet3d/models/necks/second_fpn.py:12-93): upsample_strides > 1
use transposed conv, == 1 plain conv, < 1 a strided conv when
``use_conv_for_no_stride`` (the CenterPoint-nus config uses strides
(0.5, 1, 2) — reference config _base_/models/
centerpoint_02pillar_second_secfpn_nus.py:24-31).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..builder import NECKS
from ..layers import ConvModule, DeconvModule


@NECKS.register_module()
class SECONDFPN(nn.Module):
    in_channels: Sequence[int] = (128, 128, 256)
    out_channels: Sequence[int] = (256, 256, 256)
    upsample_strides: Sequence[float] = (1, 2, 4)
    norm_cfg: Any = None
    upsample_cfg: Any = None
    conv_cfg: Any = None
    use_conv_for_no_stride: bool = False

    @nn.compact
    def __call__(self, feats, train: bool = False):
        assert len(feats) == len(self.in_channels)
        ups = []
        for i, (ch, st) in enumerate(zip(self.out_channels,
                                         self.upsample_strides)):
            norm = self.norm_cfg or dict(type="BN")
            if st > 1:
                y = DeconvModule(ch, kernel_size=int(st), stride=int(st),
                                 norm_cfg=norm,
                                 name=f"deblock_{i}")(feats[i], train=train)
            else:
                # stride 1 -> 1x1 conv; stride < 1 -> strided conv with
                # kernel == stride == round(1/st) (reference second_fpn.py)
                s = int(round(1 / st)) if st < 1 else 1
                y = ConvModule(ch, s, stride=s, norm_cfg=norm,
                               name=f"deblock_{i}")(feats[i], train=train)
            ups.append(y)
        if len(ups) > 1:
            return jnp.concatenate(ups, axis=-1)
        return ups[0]
