"""Common NN building blocks (flax.linen, channels-last, TPU layouts).

Replaces the mmcv layer zoo the reference leans on (ConvModule,
build_norm_layer, NaiveSyncBatchNorm — reference: mmdet3d/ops/norm.py and
mmcv.cnn): one BatchNorm implementation with optional masking (for padded
point/voxel rows) and optional cross-device synchronization via
``jax.lax.pmean`` over a named mesh axis — the GSPMD-native SyncBN
(SURVEY.md §2.8).
"""
from __future__ import annotations

import os
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn


def _bn_stat_barrier() -> bool:
    """When set, BN batch statistics are computed behind an
    ``optimization_barrier`` so the stat reductions do NOT fuse into the
    producing conv's epilogue.  XLA's fused conv+convert+reduce runs the
    conv HBM-bound at ~17% MXU (profile_step.py round-4 table); the
    split costs one extra streamed read of x but lets the conv tile for
    the MXU.  A/B via DISTILLBEV_BN_STAT_BARRIER (trace-time read)."""
    return os.environ.get("DISTILLBEV_BN_STAT_BARRIER", "0") == "1"


def np_prod(shape):
    out = 1
    for s in shape:
        out *= int(s)
    return out

Dtype = Any


class BatchNorm(nn.Module):
    """BatchNorm over all leading axes, with masking and mesh-axis sync.

    Args:
        momentum: running-stat EMA momentum (reference uses 0.01 for point
            branches, 0.1 mmcv default elsewhere; stored as ``1 - decay``).
        axis_name: if set, batch statistics are pmean'd over this mesh
            axis (SyncBN; the reference's NaiveSyncBatchNorm all_reduce).
    """
    use_running_average: Optional[bool] = None
    momentum: float = 0.1
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None,
                 mask: Optional[jnp.ndarray] = None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average,
            use_running_average)
        features = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros(features, jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones(features, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          jnp.float32)

        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            xs = jax.lax.optimization_barrier(x) if _bn_stat_barrier() \
                else x
            xf = xs.astype(jnp.float32)
            reduce_axes = tuple(range(x.ndim - 1))
            if mask is not None:
                m = mask.astype(jnp.float32)
                while m.ndim < x.ndim:
                    m = m[..., None]
                cnt = m.sum() * jnp.ones((), jnp.float32)
                s1 = (xf * m).sum(axis=reduce_axes)
                s2 = (jnp.square(xf) * m).sum(axis=reduce_axes)
            else:
                cnt = jnp.asarray(float(np_prod(x.shape[:-1])),
                                  jnp.float32)
                s1 = xf.sum(axis=reduce_axes)
                s2 = jnp.square(xf).sum(axis=reduce_axes)
            if self.axis_name is not None:
                # sum-of-moments psum -> exact global statistics even with
                # unequal per-device valid counts
                cnt = jax.lax.psum(cnt, self.axis_name)
                s1 = jax.lax.psum(s1, self.axis_name)
                s2 = jax.lax.psum(s2, self.axis_name)
            cnt = jnp.maximum(cnt, 1.0)
            mean = s1 / cnt
            var = jnp.maximum(s2 / cnt - jnp.square(mean), 0.0)
            if not self.is_initializing():
                ra_mean.value = ((1 - self.momentum) * ra_mean.value +
                                 self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value +
                                self.momentum * var)
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(
            var + self.epsilon)
        y = y * scale + bias
        if mask is not None:
            m = mask
            while m.ndim < x.ndim:
                m = m[..., None]
            y = jnp.where(m, y, 0.0)
        return y.astype(self.dtype or x.dtype)


def make_norm(norm_cfg: Optional[dict], axis_name: Optional[str] = None
              ) -> Callable[..., nn.Module]:
    """Norm factory from an mmcv-style norm_cfg dict.

    Accepts types BN/BN1d/BN2d/SyncBN/naiveSyncBN2d (all map to BatchNorm;
    Sync variants get the mesh axis), GN, LN.
    """
    if norm_cfg is None:
        norm_cfg = dict(type="BN")
    t = norm_cfg.get("type", "BN")
    eps = norm_cfg.get("eps", 1e-5)
    momentum = norm_cfg.get("momentum", 0.1)
    if t in ("BN", "BN1d", "BN2d", "BN3d"):
        return lambda **kw: BatchNorm(momentum=momentum, epsilon=eps, **kw)
    if t in ("SyncBN", "naiveSyncBN1d", "naiveSyncBN2d", "SyncBatchNorm"):
        return lambda **kw: BatchNorm(momentum=momentum, epsilon=eps,
                                      axis_name=axis_name or "data", **kw)
    if t == "GN":
        ng = norm_cfg.get("num_groups", 32)
        return lambda **kw: nn.GroupNorm(num_groups=ng, epsilon=eps)
    if t == "LN":
        return lambda **kw: nn.LayerNorm(epsilon=eps)
    raise KeyError(f"unknown norm type {t}")


def get_activation(act_cfg: Optional[dict]):
    if act_cfg is None:
        return None
    t = act_cfg if isinstance(act_cfg, str) else act_cfg.get("type", "ReLU")
    return {
        "ReLU": nn.relu,
        "LeakyReLU": lambda x: nn.leaky_relu(x, 0.01),
        "GELU": lambda x: nn.gelu(x, approximate=False),
        "Sigmoid": nn.sigmoid,
        "SiLU": nn.silu,
        "Swish": nn.silu,
    }[t]


class ConvModule(nn.Module):
    """Conv2D + norm + activation (channels-last NHWC).

    The TPU layout counterpart of mmcv ConvModule; weight layout is flax
    HWIO (checkpoint converter transposes torch OIHW).
    """
    out_channels: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[str, int, Tuple[int, int]] = 0
    dilation: int = 1
    groups: int = 1
    use_bias: Optional[bool] = None
    norm_cfg: Optional[dict] = None
    act_cfg: Any = "ReLU"
    order: Tuple[str, ...] = ("conv", "norm", "act")
    transpose: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        ks = self.kernel_size
        if isinstance(ks, int):
            ks = (ks, ks)
        st = self.stride
        if isinstance(st, int):
            st = (st, st)
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        elif isinstance(pad, tuple) and isinstance(pad[0], int):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        use_bias = self.use_bias
        if use_bias is None:
            use_bias = self.norm_cfg is None
        if self.transpose:
            conv = nn.ConvTranspose(
                self.out_channels, ks, strides=st, padding="VALID"
                if pad == 0 else pad, use_bias=use_bias, name="conv")
        else:
            conv = nn.Conv(self.out_channels, ks, strides=st, padding=pad,
                           feature_group_count=self.groups,
                           kernel_dilation=(self.dilation, self.dilation),
                           use_bias=use_bias, name="conv")
        act = get_activation(self.act_cfg) if self.act_cfg else None
        norm = None
        if self.norm_cfg is not None:
            norm = make_norm(dict(self.norm_cfg))(name="norm")
        for op in self.order:
            if op == "conv":
                x = conv(x)
            elif op == "norm" and norm is not None:
                x = norm(x, use_running_average=not train)
            elif op == "act" and act is not None:
                x = act(x)
        return x


class ModulatedDeformConv(nn.Module):
    """DCNv2: learned-offset modulated deformable conv
    (reference: mmcv ModulatedDeformConv2dPack used at
    centerpoint_head.py:125-243 and view_transformer_mine.py:298-308).

    TPU-native: bilinear taps + one MXU matmul (ops/deform_conv.py).
    ``conv_offset`` is zero-initialized as in mmcv — at init offsets are
    0 and modulation is sigmoid(0) = 0.5, i.e. half a standard conv.
    Weight layout is HWIO like every conv here (converter transposes
    torch OIHW; torch's conv_offset maps as a normal conv)."""
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        from ..ops.deform_conv import modulated_deform_conv2d
        k = self.kernel_size
        taps = k * k
        off = nn.Conv(3 * taps, (k, k), strides=(self.stride,) * 2,
                      padding=(((k - 1) * self.dilation // 2,) * 2,) * 2,
                      kernel_dilation=(self.dilation,) * 2,
                      kernel_init=nn.initializers.zeros,
                      name="conv_offset")(x)
        offset = off[..., :2 * taps]
        mask = jax.nn.sigmoid(off[..., 2 * taps:])
        weight = self.param(
            "weight", nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.out_channels))
        bias = self.param("bias", nn.initializers.zeros,
                          (self.out_channels,)) if self.use_bias else None
        return modulated_deform_conv2d(x, offset, mask, weight, bias,
                                       stride=self.stride,
                                       dilation=self.dilation)


class DeconvModule(nn.Module):
    """ConvTranspose2D + norm + act (SECONDFPN upsample path)."""
    out_channels: int
    kernel_size: int = 2
    stride: int = 2
    use_bias: bool = False
    norm_cfg: Optional[dict] = None
    act_cfg: Any = "ReLU"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.ConvTranspose(
            self.out_channels, (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride), padding="VALID",
            use_bias=self.use_bias, name="deconv")(x)
        if self.norm_cfg is not None:
            x = make_norm(dict(self.norm_cfg))(name="norm")(
                x, use_running_average=not train)
        if self.act_cfg is not None:
            x = get_activation(self.act_cfg)(x)
        return x


class BasicBlock(nn.Module):
    """ResNet BasicBlock, channels-last (backbone + BEV encoder).

    downsample_kernel/downsample_norm: the mmdet image ResNet uses a
    1x1 conv + BN shortcut; ResNetForBEVDet uses a bare 3x3 conv
    (reference backbones/resnet.py:29-44) — both are expressible here.
    """
    channels: int
    stride: int = 1
    downsample: bool = False
    norm_cfg: Optional[dict] = None
    downsample_kernel: int = 1
    downsample_norm: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = make_norm(dict(self.norm_cfg) if self.norm_cfg else None)
        identity = x
        y = nn.Conv(self.channels, (3, 3), strides=(self.stride,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=False,
                    name="conv1")(x)
        y = norm(name="bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv2")(y)
        y = norm(name="bn2")(y, use_running_average=not train)
        if self.downsample or self.stride != 1 or \
                x.shape[-1] != self.channels:
            k = self.downsample_kernel
            identity = nn.Conv(self.channels, (k, k),
                               strides=(self.stride,) * 2,
                               padding=((k // 2,) * 2,) * 2,
                               use_bias=not self.downsample_norm,
                               name="downsample_conv")(x)
            if self.downsample_norm:
                identity = norm(name="downsample_bn")(
                    identity, use_running_average=not train)
        return nn.relu(y + identity)


class Bottleneck(nn.Module):
    """ResNet Bottleneck (R50/R101 image backbones), channels-last."""
    channels: int          # bottleneck width; output = channels * 4
    stride: int = 1
    dilation: int = 1
    norm_cfg: Optional[dict] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = make_norm(dict(self.norm_cfg) if self.norm_cfg else None)
        out_ch = self.channels * 4
        identity = x
        y = nn.Conv(self.channels, (1, 1), use_bias=False, name="conv1")(x)
        y = norm(name="bn1")(y, use_running_average=not train)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), strides=(self.stride,) * 2,
                    padding=((self.dilation,) * 2,) * 2,
                    kernel_dilation=(self.dilation,) * 2,
                    use_bias=False, name="conv2")(y)
        y = norm(name="bn2")(y, use_running_average=not train)
        y = nn.relu(y)
        y = nn.Conv(out_ch, (1, 1), use_bias=False, name="conv3")(y)
        y = norm(name="bn3")(y, use_running_average=not train)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = nn.Conv(out_ch, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False, name="downsample_conv")(x)
            identity = norm(name="downsample_bn")(
                identity, use_running_average=not train)
        return nn.relu(y + identity)
