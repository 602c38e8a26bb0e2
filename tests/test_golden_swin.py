"""Swin backbone torch-golden parity (VERDICT r3 missing #3 upgrade).

The official Swin (reference mmdet3d/models/backbones/
swin_transformer_official.py:116-737) transcribed in plain torch —
window attention with relative position bias, shifted windows with the
attention mask, patch merging in the official 4C concat order, per-out
LN — converted through the new ``swin_name_map`` into our compact
TPU-native SwinTransformer (windows folded into the batch axis, static
shift masks).  Divisible resolutions only (the official pads
non-divisible inputs; our variant keeps static shapes — documented
difference, unused by every distill config)."""
import os.path as osp
import sys

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))
sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tools",
                            "model_converters"))

from convert_torch_ckpt import swin_name_map
from distillbev_tpu.training.param_utils import (
    map_params, torch_state_dict_to_arrays)
from test_golden_activations import nchw

torch.manual_seed(0)

EMBED, DEPTHS, HEADS, WS = 32, (2, 2, 2), (2, 4, 8), 4


def _win_partition(x, ws):
    b, h, w, c = x.shape
    x = x.view(b, h // ws, ws, w // ws, ws, c)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def _win_reverse(wins, ws, h, w):
    b = wins.shape[0] // ((h // ws) * (w // ws))
    x = wins.view(b, h // ws, w // ws, ws, ws, -1)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


class TorchWindowAttention(nn.Module):
    def __init__(self, dim, ws, heads):
        super().__init__()
        self.dim, self.ws, self.heads = dim, ws, heads
        self.relative_position_bias_table = nn.Parameter(
            torch.randn((2 * ws - 1) ** 2, heads) * 0.02)
        coords = torch.stack(torch.meshgrid(
            [torch.arange(ws), torch.arange(ws)], indexing="ij"))
        cf = torch.flatten(coords, 1)
        rel = (cf[:, :, None] - cf[:, None, :]).permute(1, 2, 0)
        rel[:, :, 0] += ws - 1
        rel[:, :, 1] += ws - 1
        rel[:, :, 0] *= 2 * ws - 1
        self.register_buffer("rpi", rel.sum(-1))
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, mask=None):
        b_, n, c = x.shape
        hd = c // self.heads
        qkv = self.qkv(x).reshape(b_, n, 3, self.heads, hd).permute(
            2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * hd ** -0.5) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.rpi.view(-1)].view(n, n, -1).permute(2, 0, 1)
        attn = attn + bias[None]
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(b_ // nw, nw, self.heads, n, n) + \
                mask[None, :, None]
            attn = attn.view(-1, self.heads, n, n)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(b_, n, c)
        return self.proj(x)


class TorchSwinBlock(nn.Module):
    def __init__(self, dim, heads, ws, shift):
        super().__init__()
        self.dim, self.ws, self.shift = dim, ws, shift
        self.norm1 = nn.LayerNorm(dim)
        self.attn = TorchWindowAttention(dim, ws, heads)
        self.norm2 = nn.LayerNorm(dim)
        mlp = nn.Module()
        mlp.fc1 = nn.Linear(dim, dim * 4)
        mlp.fc2 = nn.Linear(dim * 4, dim)
        self.mlp = mlp

    def forward(self, x, mask):
        b, h, w, c = x.shape
        ws = min(self.ws, h, w)
        shift = self.shift if ws < min(h, w) else 0
        shortcut = x
        x = self.norm1(x)
        if shift > 0:
            x = torch.roll(x, (-shift, -shift), dims=(1, 2))
        wins = _win_partition(x, ws)
        wins = self.attn(wins, mask if shift > 0 else None)
        x = _win_reverse(wins, ws, h, w)
        if shift > 0:
            x = torch.roll(x, (shift, shift), dims=(1, 2))
        x = shortcut + x
        y = self.norm2(x)
        y = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(y)))
        return x + y


class TorchPatchMerging(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = nn.LayerNorm(4 * dim)

    def forward(self, x):
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = torch.cat([x0, x1, x2, x3], -1)
        return self.reduction(self.norm(x))


def _shift_mask(h, w, ws, shift):
    img = torch.zeros(1, h, w, 1)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wss in (slice(0, -ws), slice(-ws, -shift),
                    slice(-shift, None)):
            img[:, hs, wss] = cnt
            cnt += 1
    mw = _win_partition(img, ws).squeeze(-1)
    m = mw[:, None] - mw[:, :, None]
    return m.masked_fill(m != 0, -100.0).masked_fill(m == 0, 0.0) \
        .transpose(1, 2)


class TorchSwin(nn.Module):
    def __init__(self):
        super().__init__()
        pe = nn.Module()
        pe.proj = nn.Conv2d(3, EMBED, 4, stride=4)
        pe.norm = nn.LayerNorm(EMBED)
        self.patch_embed = pe
        self.layers = nn.ModuleList()
        dim = EMBED
        for i, d in enumerate(DEPTHS):
            stage = nn.Module()
            stage.blocks = nn.ModuleList(
                [TorchSwinBlock(dim, HEADS[i], WS,
                                0 if j % 2 == 0 else WS // 2)
                 for j in range(d)])
            if i < len(DEPTHS) - 1:
                stage.downsample = TorchPatchMerging(dim)
            self.layers.append(stage)
            for_norm = dim
            self.add_module(f"norm{i}", nn.LayerNorm(for_norm))
            dim *= 2

    def forward(self, x):
        x = self.patch_embed.proj(x)
        b, c, h, w = x.shape
        x = x.permute(0, 2, 3, 1)
        x = self.patch_embed.norm(x)
        outs = []
        for i, stage in enumerate(self.layers):
            hh, ww = x.shape[1], x.shape[2]
            mask = _shift_mask(hh, ww, WS, WS // 2) \
                if min(hh, ww) > WS else None
            for blk in stage.blocks:
                x = blk(x, mask)
            outs.append(getattr(self, f"norm{i}")(x))
            if hasattr(stage, "downsample"):
                x = stage.downsample(x)
        return outs


def test_swin_golden_activations(rng):
    from distillbev_tpu.models import build_backbone

    tm = TorchSwin().eval()
    x = rng.randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        t_outs = tm(torch.from_numpy(nchw(x)))

    model = build_backbone(dict(
        type="SwinTransformer", embed_dims=EMBED, patch_size=4,
        depths=DEPTHS, num_heads=HEADS, window_size=WS,
        out_indices=(0, 1, 2)))
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))

    pm, sm = swin_name_map(depths=DEPTHS, out_indices=(0, 1, 2),
                           torch_prefix="", flax_prefix=())
    sd = torch_state_dict_to_arrays(tm.state_dict())
    params, miss, mm = map_params(sd, pm, variables["params"])
    assert not mm, mm[:6]
    assert not miss, sorted(miss)[:6]

    j_outs = model.apply({"params": params}, jnp.asarray(x),
                         train=False)
    assert len(j_outs) == len(t_outs) == 3
    for i, (t, j) in enumerate(zip(t_outs, j_outs)):
        np.testing.assert_allclose(
            t.numpy(), np.asarray(j), rtol=1e-4, atol=1e-4,
            err_msg=f"stage {i}")
