"""Whole-model BEVFormer torch-golden parity (VERDICT r3 #7, second
half).

Composes the plain-torch reference pieces — mmdet R50 + 4-level FPN,
PerceptionTransformer (can_bus MLP, shift, cams/level embeds), a
2-layer TSA/SCA encoder with a 2-frame history queue
(obtain_history_bev), a 2-layer MHA+deformable decoder with iterative
box refinement, and the BEVFormerHead cls/reg branch decode — per the
reference composition (reference mmdet3d/models/detectors/
bevformer.py:120-220, transformer_modules/perception_transformer.py,
encoder.py, decoder.py, dense_heads/bevformer_head.py:120-230),
converts the full state_dict through the REAL ``bevformer_name_map``,
and asserts the JAX ``BEVFormer`` detector reproduces every decoder
layer's cls scores and bbox preds.

Known deliberate deviation excluded: ``rotate_prev_bev`` is off — the
reference rotates prev_bev with torchvision `rotate` (nearest
interpolation, center [100, 100]); ours grid-samples bilinearly around
the exact center (documented in perception_transformer.py).
"""
import os.path as osp
import sys

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))
sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tools",
                            "model_converters"))

from convert_torch_ckpt import bevformer_name_map, split_mha_in_proj
from distillbev_tpu.training.param_utils import (
    map_params, torch_state_dict_to_arrays)
from test_golden_activations import (TorchBEVFormerLayer, TorchResNet50,
                                     randomize_bn)

torch.manual_seed(0)

C, M, FFC = 32, 4, 64
N_ENC, N_DEC = 2, 2
P_SCA, P_TSA, NZ = 8, 4, 2
BEV_H = BEV_W = 8
N_QUERY, N_CLS, CODE = 12, 4, 10
N_CAM, QUEUE, BS = 2, 2, 1
IMG_H, IMG_W = 64, 96
PCR = [-8.0, -8.0, -5.0, 8.0, 8.0, 3.0]
REAL = 16.0
LEVELS = 4


class TorchFPN(nn.Module):
    """mmdet FPN, 4 ins -> 4 outs, no extra convs (necks/fpn.py)."""

    def __init__(self, in_chs, out_ch):
        super().__init__()

        class CM(nn.Module):
            def __init__(self, ic, oc, k):
                super().__init__()
                self.conv = nn.Conv2d(ic, oc, k, padding=k // 2)

            def forward(self, x):
                return self.conv(x)

        self.lateral_convs = nn.ModuleList(
            [CM(ic, out_ch, 1) for ic in in_chs])
        self.fpn_convs = nn.ModuleList(
            [CM(out_ch, out_ch, 3) for _ in in_chs])

    def forward(self, feats):
        lat = [l(f) for l, f in zip(self.lateral_convs, feats)]
        for i in range(len(lat) - 1, 0, -1):
            lat[i - 1] = lat[i - 1] + F.interpolate(
                lat[i], size=lat[i - 1].shape[2:], mode="nearest")
        return [f(l) for f, l in zip(self.fpn_convs, lat)]


class TorchLearnedPE(nn.Module):
    """mmdet LearnedPositionalEncoding: col embed then row embed on the
    channel axis."""

    def __init__(self, num_feats, row, col):
        super().__init__()
        self.row_embed = nn.Embedding(row, num_feats)
        self.col_embed = nn.Embedding(col, num_feats)

    def forward(self, h, w):
        x = self.col_embed(torch.arange(w))
        y = self.row_embed(torch.arange(h))
        pos = torch.cat([x[None].repeat(h, 1, 1),
                         y[:, None].repeat(1, w, 1)], dim=-1)
        return pos.reshape(h * w, -1)            # [HW, C]


class TorchCustomMSDA(nn.Module):
    """Reference CustomMSDeformableAttention (decoder.py:133-330),
    batch-first, dropout 0."""

    def __init__(self, c, m, levels, p):
        super().__init__()
        self.c, self.m, self.levels, self.p = c, m, levels, p
        self.sampling_offsets = nn.Linear(c, m * levels * p * 2)
        self.attention_weights = nn.Linear(c, m * levels * p)
        self.value_proj = nn.Linear(c, c)
        self.output_proj = nn.Linear(c, c)

    def forward(self, query, value, reference_points, shapes,
                query_pos=None):
        from test_golden_ops import torch_ms_deform_attn
        identity = query
        if query_pos is not None:
            query = query + query_pos
        bs, q, c = query.shape
        m, L, p = self.m, self.levels, self.p
        value = self.value_proj(value)
        off = self.sampling_offsets(query).view(bs, q, m, L, p, 2)
        wgt = self.attention_weights(query).view(bs, q, m, L * p)
        wgt = wgt.softmax(-1).view(bs, q, m, L, p)
        normalizer = torch.tensor([[w, h] for h, w in shapes],
                                  dtype=torch.float)
        locs = reference_points[:, :, None, :, None, :] + \
            off / normalizer[None, None, None, :, None, :]
        vh = value.view(bs, value.shape[1], m, c // m)
        out = torch_ms_deform_attn(vh, shapes, locs, wgt)
        return self.output_proj(out) + identity


class TorchDecoderLayer(nn.Module):
    """MHA self-attn -> LN -> deformable cross-attn -> LN -> FFN -> LN
    with mmcv naming (attentions.{0,1}, norms, ffns)."""

    def __init__(self, c, m, p, ffc):
        super().__init__()
        mha = nn.Module()
        mha.attn = nn.MultiheadAttention(c, m, batch_first=True)
        self.attentions = nn.ModuleList(
            [mha, TorchCustomMSDA(c, m, 1, p)])
        self.norms = nn.ModuleList([nn.LayerNorm(c) for _ in range(3)])
        ffn = nn.Module()
        ffn.layers = nn.Sequential(
            nn.Sequential(nn.Linear(c, ffc), nn.ReLU(), nn.Dropout(0.0)),
            nn.Linear(ffc, c), nn.Dropout(0.0))
        self.ffns = nn.ModuleList([ffn])

    def forward(self, query, value, query_pos, reference_points, shapes):
        qq = query + query_pos
        out, _ = self.attentions[0].attn(qq, qq, query,
                                         need_weights=False)
        q = self.norms[0](out + query)
        q = self.attentions[1](q, value, reference_points, shapes,
                               query_pos=query_pos)
        q = self.norms[1](q)
        q = self.ffns[0].layers(q) + q
        return self.norms[2](q)


class TorchDecoder(nn.Module):
    def __init__(self, c, m, p, ffc, n_layers):
        super().__init__()
        self.layers = nn.ModuleList(
            [TorchDecoderLayer(c, m, p, ffc) for _ in range(n_layers)])

    def forward(self, query, value, query_pos, reference_points, shapes,
                reg_branches):
        from test_golden_activations import TorchResNet50  # noqa: F401
        intermediate, inter_refs = [], []
        for lid, layer in enumerate(self.layers):
            ref_input = reference_points[..., :2].unsqueeze(2)
            query = layer(query, value, query_pos, ref_input, shapes)
            if reg_branches is not None:
                tmp = reg_branches[lid](query)
                new_ref = torch.zeros_like(reference_points)
                new_ref[..., :2] = tmp[..., :2] + _inv_sig(
                    reference_points[..., :2])
                new_ref[..., 2:3] = tmp[..., 4:5] + _inv_sig(
                    reference_points[..., 2:3])
                reference_points = new_ref.sigmoid().detach()
            intermediate.append(query)
            inter_refs.append(reference_points)
        return torch.stack(intermediate), torch.stack(inter_refs)


def _inv_sig(x, eps=1e-5):
    x = x.clamp(min=0, max=1)
    return torch.log(x.clamp(min=eps) / (1 - x).clamp(min=eps))


class TorchPerceptionTransformer(nn.Module):
    """Reference PerceptionTransformer (perception_transformer.py:
    19-260), batch-first transcription, rotate_prev_bev=False."""

    def __init__(self):
        super().__init__()
        self.encoder = nn.Module()
        self.encoder.layers = nn.ModuleList(
            [TorchBEVFormerLayer(C, M, LEVELS, P_SCA, P_TSA, FFC, N_CAM)
             for _ in range(N_ENC)])
        self.decoder = TorchDecoder(C, M, P_TSA, FFC, N_DEC)
        self.level_embeds = nn.Parameter(torch.randn(LEVELS, C))
        self.cams_embeds = nn.Parameter(torch.randn(N_CAM, C))
        self.reference_points = nn.Linear(C, 3)
        self.can_bus_mlp = nn.Sequential(
            nn.Linear(18, C // 2), nn.ReLU(),
            nn.Linear(C // 2, C), nn.ReLU())
        self.can_bus_mlp.add_module("norm", nn.LayerNorm(C))

    def _shift(self, can_bus):
        # reference :113-133
        delta_x = can_bus[:, 0].numpy()
        delta_y = can_bus[:, 1].numpy()
        ego_angle = can_bus[:, -2].numpy() / np.pi * 180
        gl = REAL / BEV_H
        tl = np.sqrt(delta_x ** 2 + delta_y ** 2)
        ta = np.arctan2(delta_y, delta_x) / np.pi * 180
        bev_angle = ego_angle - ta
        shift_y = tl * np.cos(bev_angle / 180 * np.pi) / gl / BEV_H
        shift_x = tl * np.sin(bev_angle / 180 * np.pi) / gl / BEV_W
        return torch.tensor(np.stack([shift_x, shift_y], -1),
                            dtype=torch.float)

    def _flatten(self, mlvl_feats):
        flat, shapes = [], []
        for lvl, feat in enumerate(mlvl_feats):
            bs, n, c, h, w = feat.shape
            f = feat.flatten(3).permute(1, 0, 3, 2)   # [N, B, HW, C]
            f = f + self.cams_embeds[:, None, None, :]
            f = f + self.level_embeds[None, None, lvl:lvl + 1, :]
            flat.append(f)
            shapes.append((h, w))
        return torch.cat(flat, 2), tuple(shapes)

    def get_bev_features(self, mlvl_feats, bev_queries, bev_pos,
                         can_bus, lidar2img, prev_bev):
        from distillbev_tpu.models.transformer.encoder import (
            get_reference_points_2d, get_reference_points_3d)
        bs = mlvl_feats[0].shape[0]
        shift = self._shift(can_bus)
        bev_query = bev_queries[None].repeat(bs, 1, 1)
        bev_query = bev_query + self.can_bus_mlp(can_bus)[:, None, :]
        value, shapes = self._flatten(mlvl_feats)

        ref_3d = torch.from_numpy(np.asarray(get_reference_points_3d(
            BEV_H, BEV_W, PCR[5] - PCR[2], NZ), np.float32))
        ref_2d = torch.from_numpy(np.asarray(get_reference_points_2d(
            BEV_H, BEV_W), np.float32))[None].repeat(bs, 1, 1, 1)
        ref_cam, bev_mask = self._point_sampling(ref_3d, lidar2img)

        q = BEV_H * BEV_W
        # reference's kept in-place bug: BOTH slots shifted
        shifted = ref_2d + shift[:, None, None, :]
        hybrid = torch.stack([shifted, shifted], 1).reshape(
            bs * 2, q, 1, 2)
        # reference: the TSA value stack [prev, INITIAL query] is built
        # ONCE and every layer receives the same tensor
        # (encoder.py:199-207); with prev None the TSA restacks the
        # layer's current query
        if prev_bev is not None:
            prev_stack = torch.stack([prev_bev, bev_query], 1).reshape(
                bs * 2, q, C)
        else:
            prev_stack = None
        out = bev_query
        kvp = value.permute(0, 2, 1, 3)      # [N, HW, B, C]
        for layer in self.encoder.layers:
            ps = prev_stack if prev_stack is not None else \
                torch.stack([out, out], 1).reshape(bs * 2, q, C)
            out = layer(out, kvp, kvp, bev_pos[None].repeat(bs, 1, 1),
                        hybrid, ref_cam, bev_mask, shapes,
                        (BEV_H, BEV_W), ps)
        return out, value, shapes

    def _point_sampling(self, ref_3d, lidar2img):
        # reference encoder.py point_sampling:91-140
        rp = ref_3d.clone()[None]                 # [B=1, D, Q, 3]
        rp = rp.permute(1, 0, 2, 3)               # [D, B, Q, 3]
        rp = rp.clone()
        rp[..., 0:1] = rp[..., 0:1] * (PCR[3] - PCR[0]) + PCR[0]
        rp[..., 1:2] = rp[..., 1:2] * (PCR[4] - PCR[1]) + PCR[1]
        rp[..., 2:3] = rp[..., 2:3] * (PCR[5] - PCR[2]) + PCR[2]
        rp = torch.cat([rp, torch.ones_like(rp[..., :1])], -1)
        d, b, q = rp.shape[:3]
        n = lidar2img.shape[1]
        rp = rp.view(d, b, 1, q, 4).repeat(1, 1, n, 1, 1).unsqueeze(-1)
        l2i = lidar2img.view(1, b, n, 1, 4, 4).repeat(d, 1, 1, q, 1, 1)
        cam = torch.matmul(l2i, rp).squeeze(-1)
        eps = 1e-5
        mask = cam[..., 2:3] > eps
        cam = cam[..., 0:2] / torch.maximum(
            cam[..., 2:3], torch.ones_like(cam[..., 2:3]) * eps)
        cam[..., 0] /= IMG_W
        cam[..., 1] /= IMG_H
        mask = (mask & (cam[..., 1:2] > 0.0) & (cam[..., 1:2] < 1.0)
                & (cam[..., 0:1] < 1.0) & (cam[..., 0:1] > 0.0))
        cam = cam.permute(2, 1, 3, 0, 4)          # [N, B, Q, D, 2]
        mask = mask.permute(2, 1, 3, 0, 4).squeeze(-1)
        return cam, mask

    def forward(self, mlvl_feats, bev_queries, object_query_embed,
                bev_pos, can_bus, lidar2img, prev_bev, reg_branches):
        bev_embed, value, shapes = self.get_bev_features(
            mlvl_feats, bev_queries, bev_pos, can_bus, lidar2img,
            prev_bev)
        bs = mlvl_feats[0].shape[0]
        query_pos, query = torch.split(object_query_embed, C, dim=1)
        query_pos = query_pos[None].repeat(bs, 1, 1)
        query = query[None].repeat(bs, 1, 1)
        reference_points = self.reference_points(query_pos).sigmoid()
        init_ref = reference_points
        hs, inter_refs = self.decoder(
            query, bev_embed, query_pos, reference_points,
            ((BEV_H, BEV_W),), reg_branches)
        return bev_embed, hs, init_ref, inter_refs


class TorchBEVFormerHead(nn.Module):
    def __init__(self):
        super().__init__()
        self.bev_embedding = nn.Embedding(BEV_H * BEV_W, C)
        self.query_embedding = nn.Embedding(N_QUERY, C * 2)
        self.positional_encoding = TorchLearnedPE(C // 2, BEV_H, BEV_W)
        self.transformer = TorchPerceptionTransformer()
        cls = []
        reg = []
        for _ in range(N_DEC):
            cls.append(nn.Sequential(
                nn.Linear(C, C), nn.LayerNorm(C), nn.ReLU(),
                nn.Linear(C, C), nn.LayerNorm(C), nn.ReLU(),
                nn.Linear(C, N_CLS)))
            reg.append(nn.Sequential(
                nn.Linear(C, C), nn.ReLU(), nn.Linear(C, C), nn.ReLU(),
                nn.Linear(C, CODE)))
        self.cls_branches = nn.ModuleList(cls)
        self.reg_branches = nn.ModuleList(reg)

    def forward(self, mlvl_feats, can_bus, lidar2img, prev_bev=None,
                only_bev=False):
        bev_queries = self.bev_embedding.weight
        bev_pos = self.positional_encoding(BEV_H, BEV_W)
        if only_bev:
            out, _, _ = self.transformer.get_bev_features(
                mlvl_feats, bev_queries, bev_pos, can_bus, lidar2img,
                prev_bev)
            return out
        bev_embed, hs, init_ref, inter_refs = self.transformer(
            mlvl_feats, bev_queries, self.query_embedding.weight,
            bev_pos, can_bus, lidar2img, prev_bev, self.reg_branches)
        all_cls, all_box = [], []
        for lvl in range(hs.shape[0]):
            ref = init_ref if lvl == 0 else inter_refs[lvl - 1]
            ref = _inv_sig(ref)
            cls = self.cls_branches[lvl](hs[lvl])
            tmp = self.reg_branches[lvl](hs[lvl])
            out = tmp.clone()
            out[..., 0:2] = (tmp[..., 0:2] + ref[..., 0:2]).sigmoid()
            out[..., 4:5] = (tmp[..., 4:5] + ref[..., 2:3]).sigmoid()
            out[..., 0:1] = out[..., 0:1] * (PCR[3] - PCR[0]) + PCR[0]
            out[..., 1:2] = out[..., 1:2] * (PCR[4] - PCR[1]) + PCR[1]
            out[..., 4:5] = out[..., 4:5] * (PCR[5] - PCR[2]) + PCR[2]
            all_cls.append(cls)
            all_box.append(out)
        return torch.stack(all_cls), torch.stack(all_box), bev_embed


class TorchBEVFormerModel(nn.Module):
    def __init__(self):
        super().__init__()
        self.img_backbone = TorchResNet50(num_stages=4)
        self.img_neck = TorchFPN([256, 512, 1024, 2048], C)
        self.pts_bbox_head = TorchBEVFormerHead()

    def encode(self, imgs):
        b, n, c, h, w = imgs.shape
        feats = self.img_backbone(imgs.reshape(b * n, c, h, w))
        outs = self.img_neck(feats)
        return [f.view((b, n) + f.shape[1:]) for f in outs]

    def forward(self, imgs, can_bus, lidar2img):
        """imgs [B, T, N, 3, H, W]; history frames no-grad eval."""
        prev_bev = None
        for t in range(QUEUE - 1):
            feats = self.encode(imgs[:, t])
            prev_bev = self.pts_bbox_head(
                feats, can_bus[:, t], lidar2img[:, t],
                prev_bev=prev_bev, only_bev=True).detach()
        feats = self.encode(imgs[:, -1])
        return self.pts_bbox_head(feats, can_bus[:, -1],
                                  lidar2img[:, -1], prev_bev=prev_bev)


def _jax_cfg():
    return dict(
        type="BEVFormer", use_grid_mask=False, video_test_mode=True,
        img_backbone=dict(type="ResNet", depth=50, num_stages=4,
                          out_indices=(0, 1, 2, 3),
                          norm_cfg=dict(type="BN")),
        img_neck=dict(type="FPN", in_channels=[256, 512, 1024, 2048],
                      out_channels=C, start_level=0, num_outs=LEVELS),
        pts_bbox_head=dict(
            type="BEVFormerHead", num_classes=N_CLS, embed_dims=C,
            num_query=N_QUERY, bev_h=BEV_H, bev_w=BEV_W, pc_range=PCR,
            real_h=REAL, real_w=REAL,
            code_weights=[1.0] * 8 + [0.2, 0.2],
            positional_encoding=dict(num_feats=C // 2,
                                     row_num_embed=BEV_H,
                                     col_num_embed=BEV_W),
            transformer=dict(
                type="PerceptionTransformer", embed_dims=C,
                num_cams=N_CAM, num_feature_levels=LEVELS,
                rotate_prev_bev=False,
                encoder=dict(num_layers=N_ENC, pc_range=PCR,
                             embed_dims=C, num_heads=M,
                             feedforward_channels=FFC,
                             num_levels=LEVELS, num_cams=N_CAM,
                             num_points_in_pillar=NZ, dropout=0.0),
                decoder=dict(num_layers=N_DEC, embed_dims=C,
                             num_heads=M, feedforward_channels=FFC,
                             num_points=P_TSA, dropout=0.0)),
            bbox_coder=dict(type="NMSFreeCoder",
                            post_center_range=[-10, -10, -10, 10, 10,
                                               10],
                            pc_range=PCR, max_num=10,
                            num_classes=N_CLS),
            loss_cls=dict(type="FocalLoss", use_sigmoid=True,
                          gamma=2.0, alpha=0.25, reduction="mean",
                          loss_weight=2.0),
            loss_bbox=dict(type="L1Loss", reduction="mean",
                           loss_weight=0.25)))


def test_bevformer_whole_model_golden(rng):
    from test_model_bevformer import nuscenes_like_lidar2img
    from distillbev_tpu.models import build_detector

    tm = TorchBEVFormerModel().eval()
    randomize_bn(tm)
    with torch.no_grad():
        for layer in tm.pts_bbox_head.transformer.encoder.layers:
            layer.attentions[0].sampling_offsets.bias.uniform_(-2, 2)
            layer.attentions[1].deformable_attention \
                .sampling_offsets.bias.uniform_(-2, 2)
        for dl in tm.pts_bbox_head.transformer.decoder.layers:
            dl.attentions[1].sampling_offsets.bias.uniform_(-2, 2)

    imgs = rng.randn(BS, QUEUE, N_CAM, IMG_H, IMG_W, 3).astype(
        np.float32)
    can_bus = rng.uniform(-1, 1, (BS, QUEUE, 18)).astype(np.float32)
    l2i_full = nuscenes_like_lidar2img()           # [6, 4, 4] at 900x1600
    # rescale the pixel rows to this test's image size and keep 2 cams
    scale = np.diag([IMG_W / 1600.0, IMG_H / 900.0, 1.0, 1.0]).astype(
        np.float32)
    l2i = (scale @ l2i_full[:N_CAM]).astype(np.float32)
    l2i = np.tile(l2i[None, None], (BS, QUEUE, 1, 1, 1))
    prev_exists = np.ones((BS, QUEUE), np.float32)

    with torch.no_grad():
        t_cls, t_box, t_bev = tm(
            torch.from_numpy(np.transpose(imgs, (0, 1, 2, 5, 3, 4))),
            torch.from_numpy(can_bus), torch.from_numpy(l2i))

    model = build_detector(_jax_cfg())
    args = (jnp.asarray(imgs), jnp.asarray(can_bus), jnp.asarray(l2i),
            jnp.asarray(prev_exists))
    variables = model.init(jax.random.PRNGKey(0), *args)

    pm, sm = bevformer_name_map(depth=50, fpn_levels=LEVELS,
                                num_enc_layers=N_ENC,
                                num_dec_layers=N_DEC, num_reg_fcs=2)
    sd = split_mha_in_proj(torch_state_dict_to_arrays(tm.state_dict()))
    # "#tag" entries fan shared torch tensors onto several flax paths
    for k in list(pm):
        if "#" in k:
            base = k.split("#")[0]
            if base in sd:
                sd[k] = sd[base]
    # the unused inner output_proj of MSDeformableAttention3D has no
    # flax target (the converter's map deletes it)
    sd = {k: v for k, v in sd.items()
          if ".deformable_attention.output_proj." not in k}
    params, miss_p, mm_p = map_params(sd, pm, variables["params"])
    stats, miss_s, mm_s = map_params(sd, sm, variables["batch_stats"])
    assert not mm_p, mm_p[:8]
    assert not miss_p, sorted(miss_p)[:8]
    assert not mm_s and not miss_s

    outs, _ = model.apply({"params": params, "batch_stats": stats},
                          *args, train=False)

    np.testing.assert_allclose(
        t_bev.numpy(), np.asarray(outs["bev_embed"]), rtol=2e-4,
        atol=2e-4, err_msg="bev_embed")
    np.testing.assert_allclose(
        t_cls.numpy(), np.asarray(outs["all_cls_scores"]), rtol=2e-4,
        atol=2e-4, err_msg="cls")
    np.testing.assert_allclose(
        t_box.numpy(), np.asarray(outs["all_bbox_preds"]), rtol=2e-4,
        atol=2e-4, err_msg="bbox")
