"""Sparse 3D encoder (spconv stack) -> dense BEV.

Capability parity with the reference's ``SparseEncoder``
(reference: mmdet3d/models/middle_encoders/sparse_encoder.py:11-204 and
ops/sparse_block.py make_sparse_convmodule/SparseBasicBlock): conv_input
(SubM k3) -> 4 encoder stages (stage>0 starts with a stride-2
SparseConv3d) -> conv_out (SparseConv3d (3,1,1)/(2,1,1)) -> dense
[B, H, W, C*D] with z folded into channels.

TPU-native: runs on ops/spconv (sort + searchsorted rulebooks,
gather-GEMM-accumulate).  Active-site budgets are static per stage:
``max_active`` at input, halved after each downsampling (empirically
sparse occupancy shrinks much faster; the cap is a budget, not a count).
Batch handling: one SparseTensor carries all samples (batch id in
coords), so each conv is a single MXU GEMM stream.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..builder import MIDDLE_ENCODERS
from ..layers import make_norm
from ...ops.spconv import (SparseTensor, build_sparse_conv_plan,
                           build_subm_rulebook, conv_out_shape,
                           gather_gemm, sparse_to_dense)


def _triple(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v, v)


class SparseConvModule(nn.Module):
    """One sparse conv + masked BN + ReLU."""
    out_channels: int
    kernel_size: Any = 3
    stride: Any = 1
    padding: Any = 0
    conv_type: str = "SubMConv3d"
    norm_cfg: Any = None
    max_out: int = 0              # for strided convs
    order: Tuple[str, ...] = ("conv", "norm", "act")

    @nn.compact
    def __call__(self, sp: SparseTensor, train: bool = False,
                 subm_rulebook=None) -> SparseTensor:
        """``subm_rulebook``: optional precomputed neighbor table for
        SubMConv3d — submanifold convs at the same resolution share
        coords, so the caller computes it once per stage instead of
        re-running the sort + searchsorted walk per layer (the
        reference spconv caches rulebooks by indice_key the same way;
        ~850 ms/step of the LidarFormer teacher, round-4 profile)."""
        ks = _triple(self.kernel_size)
        k = int(np.prod(ks))
        cin = sp.feats.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (k, cin, self.out_channels), jnp.float32)
        if self.conv_type == "SubMConv3d":
            nb = subm_rulebook if subm_rulebook is not None else \
                build_subm_rulebook(sp.coords, sp.valid,
                                    sp.spatial_shape, ks)
            feats = gather_gemm(sp.feats, nb, w, sp.valid)
            out = SparseTensor(feats, sp.coords, sp.valid,
                               sp.spatial_shape, sp.batch_size)
        else:
            st = _triple(self.stride)
            pd = _triple(self.padding)
            plan = build_sparse_conv_plan(
                sp.coords, sp.valid, sp.spatial_shape, ks, st, pd,
                self.max_out)
            feats = gather_gemm(sp.feats, plan.gather_idx, w,
                                plan.out_valid)
            out_sp = conv_out_shape(sp.spatial_shape, ks, st, pd)
            out = SparseTensor(feats, plan.out_coords, plan.out_valid,
                               out_sp, sp.batch_size)
        x = out.feats
        if "norm" in self.order:
            norm = make_norm(dict(self.norm_cfg)
                             if self.norm_cfg else
                             dict(type="BN1d", eps=1e-3, momentum=0.01))(
                name="norm")
            x = norm(x, use_running_average=not train, mask=out.valid)
        if "act" in self.order:
            x = nn.relu(x)
            x = jnp.where(out.valid[:, None], x, 0.0)
        return SparseTensor(x, out.coords, out.valid, out.spatial_shape,
                            out.batch_size)


class SparseBasicBlock(nn.Module):
    """Residual SubM block (reference ops/sparse_block.py)."""
    channels: int
    norm_cfg: Any = None

    @nn.compact
    def __call__(self, sp: SparseTensor, train: bool = False,
                 subm_rulebook=None) -> SparseTensor:
        identity = sp.feats
        y = SparseConvModule(self.channels, 3, norm_cfg=self.norm_cfg,
                             order=("conv", "norm", "act"),
                             name="conv1")(sp, train=train,
                                           subm_rulebook=subm_rulebook)
        y = SparseConvModule(self.channels, 3, norm_cfg=self.norm_cfg,
                             order=("conv", "norm"),
                             name="conv2")(y, train=train,
                                           subm_rulebook=subm_rulebook)
        x = nn.relu(y.feats + identity)
        x = jnp.where(y.valid[:, None], x, 0.0)
        return SparseTensor(x, y.coords, y.valid, y.spatial_shape,
                            y.batch_size)


@MIDDLE_ENCODERS.register_module()
class SparseEncoder(nn.Module):
    in_channels: int = 5
    sparse_shape: Sequence[int] = (41, 1600, 1600)
    order: Tuple[str, ...] = ("conv", "norm", "act")
    norm_cfg: Any = None
    base_channels: int = 16
    output_channels: int = 128
    encoder_channels: Any = ((16,), (32, 32, 32), (64, 64, 64),
                             (64, 64, 64))
    encoder_paddings: Any = ((1,), (1, 1, 1), (1, 1, 1),
                             ((0, 1, 1), 1, 1))
    block_type: str = "conv_module"
    max_active: int = 120_000

    @nn.compact
    def __call__(self, voxel_feats, coords, valid, batch_size: int,
                 train: bool = False):
        """voxel_feats [N, C]; coords [N, 4] (b, z, y, x); valid [N]
        -> dense BEV [B, H_out, W_out, C_out * D_out]."""
        norm = self.norm_cfg or dict(type="BN1d", eps=1e-3, momentum=0.01)
        sp = SparseTensor(voxel_feats, coords, valid,
                          tuple(self.sparse_shape), batch_size)

        # one SubM rulebook per resolution: submanifold convs keep the
        # site set, so every 3x3x3 SubM layer until the next strided
        # conv shares the same neighbor table (reference spconv caches
        # by indice_key; each searchsorted walk is [N*27] over up to
        # 120k sites — ~850 ms/step rebuilt per-layer, round-4 profile)
        nb_cache = build_subm_rulebook(sp.coords, sp.valid,
                                       sp.spatial_shape, (3, 3, 3))
        sp = SparseConvModule(self.base_channels, 3, padding=1,
                              conv_type="SubMConv3d", norm_cfg=norm,
                              order=self.order,
                              name="conv_input")(sp, train=train,
                                                 subm_rulebook=nb_cache)
        budget = self.max_active
        for i, blocks in enumerate(self.encoder_channels):
            pads = tuple(self.encoder_paddings[i])
            for j, out_ch in enumerate(tuple(blocks)):
                pad = pads[j]
                if i != 0 and j == 0 and self.block_type == "conv_module":
                    budget = max(budget // 2, 4096)
                    sp = SparseConvModule(
                        out_ch, 3, stride=2, padding=pad,
                        conv_type="SparseConv3d", norm_cfg=norm,
                        order=self.order, max_out=budget,
                        name=f"encoder_{i}_{j}")(sp, train=train)
                    nb_cache = None
                elif self.block_type == "basicblock" and \
                        j == len(tuple(blocks)) - 1 and \
                        i != len(tuple(self.encoder_channels)) - 1:
                    budget = max(budget // 2, 4096)
                    sp = SparseConvModule(
                        out_ch, 3, stride=2, padding=pad,
                        conv_type="SparseConv3d", norm_cfg=norm,
                        order=self.order, max_out=budget,
                        name=f"encoder_{i}_{j}")(sp, train=train)
                    nb_cache = None
                elif self.block_type == "basicblock":
                    if nb_cache is None:
                        nb_cache = build_subm_rulebook(
                            sp.coords, sp.valid, sp.spatial_shape,
                            (3, 3, 3))
                    sp = SparseBasicBlock(out_ch, norm_cfg=norm,
                                          name=f"encoder_{i}_{j}")(
                        sp, train=train, subm_rulebook=nb_cache)
                else:
                    if nb_cache is None:
                        nb_cache = build_subm_rulebook(
                            sp.coords, sp.valid, sp.spatial_shape,
                            (3, 3, 3))
                    sp = SparseConvModule(
                        out_ch, 3, padding=pad,
                        conv_type="SubMConv3d", norm_cfg=norm,
                        order=self.order,
                        name=f"encoder_{i}_{j}")(sp, train=train,
                                                 subm_rulebook=nb_cache)
        sp = SparseConvModule(
            self.output_channels, (3, 1, 1), stride=(2, 1, 1),
            padding=0, conv_type="SparseConv3d", norm_cfg=norm,
            order=self.order, max_out=max(budget // 2, 4096),
            name="conv_out")(sp, train=train)
        dense = sparse_to_dense(sp)          # [B, D, H, W, C]
        b, d, h, w, c = dense.shape
        return dense.transpose(0, 2, 3, 1, 4).reshape(b, h, w, d * c)
