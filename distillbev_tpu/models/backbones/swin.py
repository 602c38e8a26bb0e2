"""Swin Transformer image backbone.

Capability parity with the reference's optional Swin backbones
(reference: mmdet3d/models/backbones/swin.py (847 LoC) and
swin_transformer_official.py — window attention with relative position
bias, shifted windows, patch merging, per-stage outputs with LN).

TPU-native: windows fold into the batch axis (one big batched attention
per block — MXU friendly); the shifted-window attention mask is a static
constant computed at trace time.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..builder import BACKBONES


def window_partition(x, ws: int):
    """[B, H, W, C] -> [B*nW, ws*ws, C]"""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(windows, ws: int, h: int, w: int):
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


def _relative_position_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def _shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Static attention mask for shifted windows: [nW, ws*ws, ws*ws]."""
    img_mask = np.zeros((1, h, w, 1), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wss in (slice(0, -ws), slice(-ws, -shift),
                    slice(-shift, None)):
            img_mask[:, hs, wss, :] = cnt
            cnt += 1
    mw = img_mask.reshape(1, h // ws, ws, w // ws, ws, 1)
    mw = mw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)
    attn_mask = (mw[:, None, :] != mw[:, :, None])
    return np.where(attn_mask, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int

    @nn.compact
    def __call__(self, x, mask=None):
        b_, n, c = x.shape
        ws = self.window_size
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(self.dim * 3, name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, self.num_heads, head_dim)
        q, k, v = (qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2])
        q = q * (head_dim ** -0.5)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                          preferred_element_type=jnp.float32)
        rpb_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ws - 1) ** 2, self.num_heads))
        idx = jnp.asarray(_relative_position_index(ws))
        bias = rpb_table[idx.reshape(-1)].reshape(
            n, n, self.num_heads).transpose(2, 0, 1)
        attn = attn + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, self.num_heads, n, n) + \
                mask[None, :, None]
            attn = attn.reshape(b_, self.num_heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.reshape(b_, n, self.dim)
        return nn.Dense(self.dim, name="proj")(out)


def _drop_path(module: nn.Module, x, rate: float, train: bool):
    """Stochastic depth on a residual branch (reference swin.py uses
    mmcv DropPath; official timm semantics: per-sample bernoulli keep,
    scaled by 1/keep_prob).  Identity in eval mode or at rate 0."""
    if not train or rate <= 0.0:
        return x
    keep = 1.0 - rate
    rng = module.make_rng("dropout")
    mask = jax.random.bernoulli(
        rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return x * mask.astype(x.dtype) / keep


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        ws = min(self.window_size, h, w)
        shift = self.shift if ws < min(h, w) else 0
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        # pad to window multiples (reference swin.py / official
        # SwinTransformerBlock.forward: zero-pad bottom/right after
        # norm1, crop before the residual add; shifted-window masks are
        # built on the PADDED grid so pad pixels land in the closing
        # mask regions exactly as in the official code)
        hp = -(-h // ws) * ws
        wp = -(-w // ws) * ws
        padded = (hp != h) or (wp != w)
        if padded:
            x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(hp, wp, ws, shift))
        else:
            mask = None
        windows = window_partition(x, ws)
        attn = WindowAttention(self.dim, self.num_heads, ws,
                               name="attn")(windows, mask)
        x = window_reverse(attn, ws, hp, wp)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        if padded:
            x = x[:, :h, :w]
        x = shortcut + _drop_path(self, x, self.drop_path, train)
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), name="fc1")(y)
        # exact (erf) GELU: torch nn.GELU default; flax's default
        # tanh approximation diverges ~2e-4 (swin golden test)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="fc2")(y)
        return x + _drop_path(self, y, self.drop_path, train)


@BACKBONES.register_module()
class SwinTransformer(nn.Module):
    embed_dims: int = 96
    patch_size: int = 4
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = -1
    drop_path_rate: float = 0.1
    pretrained: Any = None
    init_cfg: Any = None
    convert_weights: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        p = self.patch_size
        b, h, w, _ = x.shape
        # patch embed with corner padding to patch multiples
        # (reference mmcv PatchEmbed AdaptivePadding 'corner')
        hp = -(-h // p) * p
        wp = -(-w // p) * p
        if (hp, wp) != (h, w):
            x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
        x = nn.Conv(self.embed_dims, (p, p), strides=(p, p),
                    name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(x)
        outs = []
        dim = self.embed_dims
        # linearly ramped stochastic-depth rates across ALL blocks
        # (reference swin.py: dpr = linspace(0, drop_path_rate,
        # sum(depths)))
        total = sum(self.depths)
        dpr = [float(self.drop_path_rate) * k / max(total - 1, 1)
               for k in range(total)]
        blk = 0
        for i, depth in enumerate(self.depths):
            for j in range(depth):
                x = SwinBlock(dim, self.num_heads[i],
                              window_size=self.window_size,
                              shift=0 if j % 2 == 0 else
                              self.window_size // 2,
                              mlp_ratio=self.mlp_ratio,
                              drop_path=dpr[blk],
                              name=f"stage{i}_block{j}")(x, train=train)
                blk += 1
            if i in self.out_indices:
                outs.append(nn.LayerNorm(epsilon=1e-5, name=f"out_norm{i}")(x))
            if i < len(self.depths) - 1:
                # patch merging; 4C concat order matches the official
                # [x(0::2,0::2), x(1::2,0::2), x(0::2,1::2),
                #  x(1::2,1::2)] (reference
                # swin_transformer_official.py:384-389 — column-offset
                # major), so reduction weights convert 1:1.  Odd dims
                # zero-pad first (official PatchMerging F.pad).
                b_, h_, w_, c_ = x.shape
                if h_ % 2 or w_ % 2:
                    x = jnp.pad(x, ((0, 0), (0, h_ % 2), (0, w_ % 2),
                                    (0, 0)))
                    h_, w_ = h_ + h_ % 2, w_ + w_ % 2
                x = x.reshape(b_, h_ // 2, 2, w_ // 2, 2, c_)
                x = x.transpose(0, 1, 3, 4, 2, 5).reshape(
                    b_, h_ // 2, w_ // 2, 4 * c_)
                x = nn.LayerNorm(epsilon=1e-5, name=f"merge_norm{i}")(x)
                x = nn.Dense(2 * c_, use_bias=False,
                             name=f"merge_reduce{i}")(x)
                dim *= 2
        return tuple(outs)
