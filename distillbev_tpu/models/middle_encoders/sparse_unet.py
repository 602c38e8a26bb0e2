"""Sparse encoder-decoder UNet.

Capability parity with the reference's ``SparseUNet``
(reference: mmdet3d/models/middle_encoders/sparse_unet.py, 293 LoC —
SECOND/PartA2's sparse UNet: SparseEncoder-style downsampling trunk, a
decoder of SparseBasicBlocks with SparseInverseConv3d upsampling and
lateral concatenation, emitting both a dense BEV map and per-voxel
``seg_features``).  Unused by the distill configs (SURVEY §2.4) but part
of the inventory.

TPU-native: the decoder restores each encoder stage's exact site set via
the transposed rulebook (ops/spconv.build_inverse_conv_plan) — the
functional analogue of spconv's stored indice pairs.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..builder import MIDDLE_ENCODERS
from ..layers import make_norm
from .sparse_encoder import SparseBasicBlock, SparseConvModule, _triple
from ...ops.spconv import (SparseTensor, build_inverse_conv_plan,
                           gather_gemm, sparse_to_dense)


class SparseInverseConvModule(nn.Module):
    """Upsample to a stored finer site set via the transposed rulebook."""
    out_channels: int
    kernel_size: Any = 3
    stride: Any = 2
    padding: Any = 1
    norm_cfg: Any = None

    @nn.compact
    def __call__(self, sp_down: SparseTensor, target: SparseTensor,
                 train: bool = False) -> SparseTensor:
        ks = _triple(self.kernel_size)
        k = int(np.prod(ks))
        cin = sp_down.feats.shape[-1]
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (k, cin, self.out_channels), jnp.float32)
        gidx = build_inverse_conv_plan(
            target.coords, target.valid, sp_down.coords, sp_down.valid,
            sp_down.spatial_shape, ks, _triple(self.stride),
            _triple(self.padding))
        feats = gather_gemm(sp_down.feats, gidx, w, target.valid)
        norm = make_norm(dict(self.norm_cfg) if self.norm_cfg else
                         dict(type="BN1d", eps=1e-3, momentum=0.01))(
            name="norm")
        x = norm(feats, use_running_average=not train, mask=target.valid)
        x = nn.relu(x)
        x = jnp.where(target.valid[:, None], x, 0.0)
        return SparseTensor(x, target.coords, target.valid,
                            target.spatial_shape, target.batch_size)


@MIDDLE_ENCODERS.register_module()
class SparseUNet(nn.Module):
    in_channels: int = 5
    sparse_shape: Sequence[int] = (41, 1600, 1408)
    order: Tuple[str, ...] = ("conv", "norm", "act")
    norm_cfg: Any = None
    base_channels: int = 16
    output_channels: int = 128
    encoder_channels: Any = ((16,), (32, 32, 32), (64, 64, 64),
                             (64, 64, 64))
    encoder_paddings: Any = ((1,), (1, 1, 1), (1, 1, 1),
                             ((0, 1, 1), 1, 1))
    decoder_channels: Any = ((64, 64, 64), (64, 64, 32), (32, 32, 16),
                             (16, 16, 16))
    decoder_paddings: Any = ((1, 0), (1, 0), (0, 0), (0, 1))
    max_active: int = 120_000

    @nn.compact
    def __call__(self, voxel_feats, coords, valid, batch_size: int,
                 train: bool = False):
        """[N, C] + [N, 4] (b,z,y,x) + [N] -> dict with
        spatial_features [B, H, W, C*D] and seg_features [N, C_seg]."""
        norm = self.norm_cfg or dict(type="BN1d", eps=1e-3, momentum=0.01)
        sp = SparseTensor(voxel_feats, coords, valid,
                          tuple(self.sparse_shape), batch_size)
        sp = SparseConvModule(self.base_channels, 3, padding=1,
                              conv_type="SubMConv3d", norm_cfg=norm,
                              name="conv_input")(sp, train=train)
        laterals = [sp]
        budget = self.max_active
        # encoder trunk (stage > 0 downsamples)
        for i, blocks in enumerate(self.encoder_channels):
            pads = tuple(self.encoder_paddings[i])
            for j, ch in enumerate(tuple(blocks)):
                if i != 0 and j == 0:
                    budget = max(budget // 2, 4096)
                    sp = SparseConvModule(
                        ch, 3, stride=2, padding=pads[j],
                        conv_type="SparseConv3d", norm_cfg=norm,
                        max_out=budget,
                        name=f"encoder_{i}_{j}")(sp, train=train)
                else:
                    sp = SparseConvModule(
                        ch, 3, padding=pads[j], conv_type="SubMConv3d",
                        norm_cfg=norm,
                        name=f"encoder_{i}_{j}")(sp, train=train)
            if i < len(self.encoder_channels) - 1:
                laterals.append(sp)

        # dense BEV trunk output (like SparseEncoder conv_out)
        out_sp = SparseConvModule(
            self.output_channels, (3, 1, 1), stride=(2, 1, 1), padding=0,
            conv_type="SparseConv3d", norm_cfg=norm,
            max_out=max(budget // 2, 4096),
            name="conv_out")(sp, train=train)
        dense = sparse_to_dense(out_sp)
        b, d, h, w, c = dense.shape
        spatial_features = dense.transpose(0, 2, 3, 1, 4).reshape(
            b, h, w, d * c)

        # decoder: inverse conv up + lateral concat + SubM fuse
        for i, blocks in enumerate(self.decoder_channels):
            target = laterals[-(i + 1)]
            ch = tuple(blocks)[-1]
            if sp.spatial_shape != target.spatial_shape:
                sp = SparseInverseConvModule(
                    ch, 3, stride=2,
                    padding=tuple(self.encoder_paddings[
                        len(self.encoder_channels) - 1 - i])[0]
                    if not isinstance(tuple(self.encoder_paddings[
                        len(self.encoder_channels) - 1 - i])[0],
                        (tuple, list)) else 1,
                    norm_cfg=norm,
                    name=f"decoder_up_{i}")(sp, target, train=train)
            merged = jnp.concatenate([sp.feats, target.feats], axis=-1)
            sp = SparseTensor(merged, target.coords, target.valid,
                              target.spatial_shape, target.batch_size)
            sp = SparseConvModule(ch, 3, padding=1,
                                  conv_type="SubMConv3d", norm_cfg=norm,
                                  name=f"decoder_fuse_{i}")(sp,
                                                            train=train)
        return dict(spatial_features=spatial_features,
                    seg_features=sp.feats)
