"""Image and BEV ResNet backbones.

``ResNet`` — mmdet-style R18/R34/R50/R101 image backbone with
``out_indices`` / ``frozen_stages`` / ``norm_eval`` semantics (reference:
mmdet package ResNet, configured at e.g. distill cfg
...to_bevdepth4d_r50.py:96-107).  ``frozen_stages`` freezing is enforced
by the optimizer mask in training (functional params can't be "frozen" in
the module itself); ``with_cp`` maps to ``jax.checkpoint`` rematerialization.

``ResNetForBEVDet`` — lightweight BEV-space resnet (reference:
mmdet3d/models/backbones/resnet.py:13-62): per-stage [block x N] with a
3x3-conv downsample on the first block of each stage, returning features
at ``backbone_output_ids``.
"""
from __future__ import annotations

import os

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builder import BACKBONES
from ..layers import BasicBlock, Bottleneck, make_norm

ARCH_SETTINGS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class _StemKernel(nn.Module):
    """Parameter holder so both stem paths share params/stem_conv/kernel
    (the exact layout nn.Conv would create — checkpoints are oblivious
    to which stem path runs)."""
    shape: Tuple[int, ...]

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape, jnp.float32)


def _stem_conv(x, kernel, s2d: bool):
    """7x7/s2 stem conv, optionally as the MLPerf-style space-to-depth
    rewrite: 2x2 blocks folded into channels (C=3 -> 12) and the 7x7/s2
    kernel zero-padded to 8x8 and regrouped into a 4x4/s1 conv — exactly
    the same sums, but a layout the MXU tiles well (C_in=3 convs run at
    a few percent utilization on TPU)."""
    dtype = jnp.promote_types(x.dtype, kernel.dtype)
    x = x.astype(dtype)
    kernel = kernel.astype(dtype)
    b, h, w, c = x.shape
    if not s2d or h % 2 or w % 2:
        return jax.lax.conv_general_dilated(
            x, kernel, window_strides=(2, 2), padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = kernel.shape[-1]
    # x[2i+dy, 2j+dx, c] -> x2[i, j, dy*2C + dx*C + c]
    x2 = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(
        0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
    # w8[k] with w8[0]=0, w8[1:]=w7 makes the 7-tap window start at an
    # even input row (2i-4); tap k = block k//2, sub-row k%2
    w8 = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
    k2 = w8.reshape(4, 2, 4, 2, c, out).transpose(
        0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, out)
    return jax.lax.conv_general_dilated(
        x2, k2, window_strides=(1, 1), padding=((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@BACKBONES.register_module()
class ResNet(nn.Module):
    depth: int = 50
    num_stages: int = 4
    out_indices: Sequence[int] = (0, 1, 2, 3)
    strides: Sequence[int] = (1, 2, 2, 2)
    dilations: Sequence[int] = (1, 1, 1, 1)
    frozen_stages: int = -1
    norm_cfg: Any = None
    norm_eval: bool = False
    style: str = "pytorch"
    with_cp: bool = False
    pretrained: Any = None
    base_channels: int = 64
    init_cfg: Any = None
    # stem space-to-depth rewrite — default OFF since round 5: XLA's
    # native low-C conv path now batches the images into lanes
    # (layout {1,0,3,4,2:T(4,128)} puts B*N in the lane dim) and beats
    # the manual rewrite by ~10 ms/step at the flagship shape (the s2d
    # reshape forced 2x ~1.6 ms relayout copies plus pre-slice copies;
    # measured 18.72 -> 19.70 samples/s).  DISTILLBEV_STEM_S2D=1
    # restores the round-1..4 rewrite for A/B benching.
    stem_s2d: bool = os.environ.get("DISTILLBEV_STEM_S2D", "0") == "1"

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        """x [B, H, W, 3] -> tuple of stage features (stride 4..32)."""
        block_type, stage_blocks = ARCH_SETTINGS[self.depth]
        stage_blocks = stage_blocks[:self.num_stages]
        norm = make_norm(dict(self.norm_cfg) if self.norm_cfg else None)
        # stem: 7x7/2 conv + maxpool/2 (space-to-depth rewrite by default)
        kernel = _StemKernel((7, 7, x.shape[-1], self.base_channels),
                             name="stem_conv")()
        x = _stem_conv(x, kernel, self.stem_s2d)
        x = norm(name="stem_bn")(x, use_running_average=not train or
                                 self.norm_eval)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        channels = self.base_channels
        for i, n_blocks in enumerate(stage_blocks):
            stride = self.strides[i]
            dilation = self.dilations[i]
            for j in range(n_blocks):
                s = stride if j == 0 else 1
                # with_cp -> flax-aware rematerialization (nn.remat keeps
                # BN variable writes functional; raw jax.checkpoint leaks)
                if block_type == "bottleneck":
                    cls = nn.remat(Bottleneck, static_argnums=(2,)) \
                        if self.with_cp else Bottleneck
                    blk = cls(channels, stride=s, dilation=dilation,
                              norm_cfg=self.norm_cfg,
                              name=f"layer{i + 1}_block{j}")
                else:
                    cls = nn.remat(BasicBlock, static_argnums=(2,)) \
                        if self.with_cp else BasicBlock
                    blk = cls(channels, stride=s,
                              norm_cfg=self.norm_cfg,
                              name=f"layer{i + 1}_block{j}")
                x = blk(x, train and not self.norm_eval)
            if i in self.out_indices:
                outs.append(x)
            channels *= 2
        return tuple(outs)


@BACKBONES.register_module()
class ResNetForBEVDet(nn.Module):
    numC_input: int = 64
    num_layer: Sequence[int] = (2, 2, 2)
    num_channels: Optional[Sequence[int]] = None
    stride: Sequence[int] = (2, 2, 2)
    backbone_output_ids: Optional[Sequence[int]] = None
    norm_cfg: Any = None
    act_cfg: Any = "ReLU"
    with_cp: bool = False
    block_type: str = "Basic"

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        num_channels = list(self.num_channels) if self.num_channels else \
            [self.numC_input * 2 ** (i + 1)
             for i in range(len(self.num_layer))]
        out_ids = (list(self.backbone_output_ids)
                   if self.backbone_output_ids is not None
                   else list(range(len(self.num_layer))))
        outs = []
        for i, n in enumerate(self.num_layer):
            for j in range(n):
                s = self.stride[i] if j == 0 else 1
                ch = num_channels[i]
                # reference ResNetForBEVDet always gives the first block
                # of a stage a bare 3x3 conv shortcut (resnet.py:29-44)
                force_ds = (j == 0)
                if self.block_type == "BottleNeck":
                    cls = nn.remat(Bottleneck, static_argnums=(2,)) \
                        if self.with_cp else Bottleneck
                    blk = cls(ch // 4, stride=s, norm_cfg=self.norm_cfg,
                              name=f"stage{i}_block{j}")
                else:
                    cls = nn.remat(BasicBlock, static_argnums=(2,)) \
                        if self.with_cp else BasicBlock
                    blk = cls(ch, stride=s, norm_cfg=self.norm_cfg,
                              downsample=force_ds, downsample_kernel=3,
                              downsample_norm=False,
                              name=f"stage{i}_block{j}")
                x = blk(x, train)
            if i in out_ids:
                outs.append(x)
        return tuple(outs)
