"""Torch-golden parity for the numerically decisive custom ops.

VERDICT r2 #5: extend golden parity beyond module trunks to the ops the
checkpoint-reproduction story hinges on.  Each case rebuilds the
reference op's semantics in PLAIN torch (the public algorithm the
reference relies on, not its CUDA source) and checks our TPU-native op
— forward AND gradients where a custom VJP exists — against torch
autograd:

* ms_deform_attn vs torch.nn.functional.grid_sample composition
  (reference loads the mmcv CUDA ext, mmdet3d/models/transformer_modules/
  multi_scale_deformable_attn_function.py:1-162; the CUDA kernel samples
  at loc*W - 0.5 with zero out-of-range corners == grid_sample with
  align_corners=False, padding_mode='zeros' on 2*loc-1).
* bev_pool vs the lift-splat cumsum trick (reference
  mmdet3d/models/necks/view_transformer_mine.py:141-181 QuickCumsum).
* spconv subm/regular conv vs dense torch conv3d on tiny grids
  (reference mmdet3d/ops/spconv — SubMConv3d keeps the input site set;
  SparseConv3d's outputs equal the dense conv wherever an output site
  exists and the site set is exactly the receptive-field cover).
"""
import os.path as osp
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from distillbev_tpu.ops.ms_deform_attn import ms_deform_attn
from distillbev_tpu.ops.bev_pool import bev_pool
from distillbev_tpu.ops.deform_conv import modulated_deform_conv2d
from distillbev_tpu.ops.spconv import (SparseTensor, sparse_conv,
                                       sparse_to_dense, subm_conv)

torch.manual_seed(0)


@pytest.fixture
def rng():
    return np.random.RandomState(0)


# ---- multi-scale deformable attention --------------------------------


def torch_ms_deform_attn(value, shapes, locs, wgts):
    """Plain-torch reference: per-level grid_sample + weighted sum.

    value [B, V, M, C], locs [B, Q, M, L, P, 2] in [0,1], wgts
    [B, Q, M, L, P] -> [B, Q, M*C].
    """
    bsz, _, m, c = value.shape
    q, num_levels, p = locs.shape[1], locs.shape[3], locs.shape[4]
    splits = [h * w for h, w in shapes]
    per_level = value.split(splits, dim=1)
    sampled = []
    for lvl, (h, w) in enumerate(shapes):
        v = per_level[lvl].permute(0, 2, 3, 1).reshape(bsz * m, c, h, w)
        g = locs[:, :, :, lvl].permute(0, 2, 1, 3, 4).reshape(
            bsz * m, q, p, 2)
        s = F.grid_sample(v, 2.0 * g - 1.0, mode="bilinear",
                          padding_mode="zeros", align_corners=False)
        sampled.append(s)                        # [B*M, C, Q, P]
    samp = torch.stack(sampled, dim=3)           # [B*M, C, Q, L, P]
    wf = wgts.permute(0, 2, 1, 3, 4).reshape(bsz * m, 1, q,
                                             num_levels, p)
    out = (samp * wf).sum(dim=(3, 4))            # [B*M, C, Q]
    return out.reshape(bsz, m, c, q).permute(0, 3, 1, 2).reshape(
        bsz, q, m * c)


def test_ms_deform_attn_torch_golden(rng):
    bsz, m, c, q, p = 2, 4, 8, 50, 4
    shapes = ((7, 11), (4, 6))
    num_levels = len(shapes)
    v_total = sum(h * w for h, w in shapes)
    value = rng.randn(bsz, v_total, m, c).astype(np.float32)
    # spread: interior, border zone, and fully-out samples
    locs = rng.uniform(-0.25, 1.25,
                       (bsz, q, m, num_levels, p, 2)).astype(np.float32)
    wgts = rng.rand(bsz, q, m, num_levels, p).astype(np.float32)
    wgts /= wgts.reshape(bsz, q, m, -1).sum(-1).reshape(
        bsz, q, m, 1, 1)
    g_out = rng.randn(bsz, q, m * c).astype(np.float32)

    tv = torch.from_numpy(value).requires_grad_(True)
    tl = torch.from_numpy(locs).requires_grad_(True)
    tw = torch.from_numpy(wgts).requires_grad_(True)
    t_out = torch_ms_deform_attn(tv, shapes, tl, tw)
    t_out.backward(torch.from_numpy(g_out))

    def f(v, l, w):
        return ms_deform_attn(v, shapes, l, w)

    j_out, vjp = jax.vjp(f, jnp.asarray(value), jnp.asarray(locs),
                         jnp.asarray(wgts))
    dv, dl, dw = vjp(jnp.asarray(g_out))

    np.testing.assert_allclose(t_out.detach().numpy(), np.asarray(j_out),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(tv.grad.numpy(), np.asarray(dv),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(tw.grad.numpy(), np.asarray(dw),
                               rtol=1e-4, atol=1e-5)
    # dloc: compare where the sample is not pinned on a lattice line
    # (floor() kinks make one-sided derivatives implementation-defined)
    np.testing.assert_allclose(tl.grad.numpy(), np.asarray(dl),
                               rtol=1e-3, atol=1e-3)


# ---- bev_pool vs the cumsum trick -------------------------------------


def torch_quickcumsum_pool(feats, coords, valid, b, h, w):
    """Reference view_transformer_mine.py:141-181 cumsum-trick pooling,
    rebuilt in plain torch: sort by cell rank, cumulative-sum features,
    keep each run's last row, subtract the previous run's total."""
    ranks = (coords[:, 0] * h + coords[:, 1]) * w + coords[:, 2]
    ranks = torch.where(valid, ranks, torch.full_like(ranks, b * h * w))
    order = torch.argsort(ranks)
    ranks, feats = ranks[order], feats[order]
    x = feats.cumsum(0)
    kept = torch.ones(x.shape[0], dtype=torch.bool)
    kept[:-1] = ranks[1:] != ranks[:-1]
    x, ranks = x[kept], ranks[kept]
    x = torch.cat([x[:1], x[1:] - x[:-1]])
    out = torch.zeros(b * h * w + 1, feats.shape[1], dtype=x.dtype)
    out[ranks] = x
    return out[:b * h * w].reshape(b, h, w, feats.shape[1])


def test_bev_pool_torch_golden(rng):
    n, c, b, h, w = 4000, 16, 2, 12, 14
    feats = rng.randn(n, c).astype(np.float32)
    coords = np.stack([rng.randint(0, b, n), rng.randint(0, h, n),
                       rng.randint(0, w, n)], 1).astype(np.int32)
    valid = rng.rand(n) > 0.1
    g_out = rng.randn(b, h, w, c).astype(np.float32)

    tf = torch.from_numpy(feats).requires_grad_(True)
    t_out = torch_quickcumsum_pool(
        tf, torch.from_numpy(coords.astype(np.int64)),
        torch.from_numpy(valid), b, h, w)
    t_out.backward(torch.from_numpy(g_out))

    j_out, vjp = jax.vjp(
        lambda x: bev_pool(x, jnp.asarray(coords), jnp.asarray(valid),
                           b, h, w), jnp.asarray(feats))
    (df,) = vjp(jnp.asarray(g_out))

    # sums of ~30 fp32 rows per cell accumulate rounding either way
    np.testing.assert_allclose(t_out.detach().numpy(), np.asarray(j_out),
                               rtol=1e-4, atol=1e-4)
    # torch's grad flows through cumsum+diff (subtractive rounding);
    # ours is an exact gather — tolerance covers the cancellation noise
    np.testing.assert_allclose(tf.grad.numpy(), np.asarray(df),
                               rtol=1e-4, atol=1e-5)


# ---- DCNv2 vs plain-torch per-tap grid_sample --------------------------


def torch_modulated_deform_conv(x, offset, mask, weight, bias, stride,
                                dilation):
    """Plain-torch DCNv2 (mmcv modulated_deform_conv semantics): per
    kernel tap, bilinearly sample at p0 + p_k + offset (zero outside),
    modulate, then a dense [K*C -> Cout] contraction.

    x [B, C, H, W]; offset [B, Ho, Wo, K, 2] (dy, dx); mask
    [B, Ho, Wo, K]; weight [Cout, C, kh, kw] -> [B, Cout, Ho, Wo].
    """
    b, c, h, w = x.shape
    c_out, _, kh, kw = weight.shape
    k = kh * kw
    _, ho, wo = offset.shape[:3]
    pad_h, pad_w = (kh - 1) * dilation // 2, (kw - 1) * dilation // 2

    oy = torch.arange(ho, dtype=torch.float32) * stride - pad_h
    ox = torch.arange(wo, dtype=torch.float32) * stride - pad_w
    ty = (torch.arange(kh, dtype=torch.float32) * dilation
          ).repeat_interleave(kw)
    tx = (torch.arange(kw, dtype=torch.float32) * dilation).repeat(kh)
    py = oy[None, :, None, None] + ty + offset[..., 0]
    px = ox[None, None, :, None] + tx + offset[..., 1]
    # pixel coords -> align_corners=True normalized coords
    gy = 2.0 * py / max(h - 1, 1) - 1.0
    gx = 2.0 * px / max(w - 1, 1) - 1.0
    grid = torch.stack([gx, gy], -1).reshape(b, ho, wo * k, 2)
    samp = F.grid_sample(x, grid, mode="bilinear", padding_mode="zeros",
                         align_corners=True)       # [B, C, Ho, Wo*K]
    samp = samp.reshape(b, c, ho, wo, k) * mask[:, None]
    out = torch.einsum("bchwk,okc->bohw", samp,
                       weight.reshape(c_out, c, k).permute(0, 2, 1))
    return out + bias[None, :, None, None]


@pytest.mark.parametrize("stride,dilation", [(1, 1), (2, 1), (1, 2)])
def test_modulated_deform_conv_torch_golden(rng, stride, dilation):
    b, h, w, c, c_out, kh = 2, 9, 11, 6, 8, 3
    k = kh * kh
    ho = (h - 1) // stride + 1
    wo = (w - 1) // stride + 1
    x = rng.randn(b, h, w, c).astype(np.float32)
    # offsets spread over a few pixels incl. out-of-range samples
    off = (rng.randn(b, ho, wo, k, 2) * 2.0).astype(np.float32)
    msk = rng.rand(b, ho, wo, k).astype(np.float32)
    wt = (rng.randn(c_out, c, kh, kh) * 0.2).astype(np.float32)
    bias = rng.randn(c_out).astype(np.float32)
    g_out = rng.randn(b, ho, wo, c_out).astype(np.float32)

    tx_ = torch.from_numpy(np.transpose(x, (0, 3, 1, 2))).requires_grad_(
        True)
    to = torch.from_numpy(off).requires_grad_(True)
    tm = torch.from_numpy(msk).requires_grad_(True)
    t_out = torch_modulated_deform_conv(
        tx_, to, tm, torch.from_numpy(wt), torch.from_numpy(bias),
        stride, dilation)
    t_out.backward(torch.from_numpy(
        np.transpose(g_out, (0, 3, 1, 2))).contiguous())

    def f(xj, oj, mj):
        return modulated_deform_conv2d(
            xj, oj.reshape(b, ho, wo, 2 * k), mj,
            jnp.asarray(np.transpose(wt, (2, 3, 1, 0))),
            jnp.asarray(bias), stride=stride, dilation=dilation)

    j_out, vjp = jax.vjp(f, jnp.asarray(x), jnp.asarray(off),
                         jnp.asarray(msk))
    dx, doff, dmsk = vjp(jnp.asarray(g_out))

    np.testing.assert_allclose(
        np.transpose(t_out.detach().numpy(), (0, 2, 3, 1)),
        np.asarray(j_out), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.transpose(tx_.grad.numpy(), (0, 2, 3, 1)), np.asarray(dx),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(tm.grad.numpy(), np.asarray(dmsk),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(to.grad.numpy(), np.asarray(doff),
                               rtol=1e-3, atol=1e-3)


# ---- spconv vs dense torch conv3d -------------------------------------


def _random_sparse(rng, b, zz, yy, xx, cin, n_act, cap):
    """Random active sites (unique), padded to a static capacity."""
    flat = rng.choice(b * zz * yy * xx, size=n_act, replace=False)
    bs, r = np.divmod(flat, zz * yy * xx)
    z, r = np.divmod(r, yy * xx)
    y, x = np.divmod(r, xx)
    coords = np.stack([bs, z, y, x], 1).astype(np.int32)
    coords = np.concatenate(
        [coords, -np.ones((cap - n_act, 4), np.int32)])
    valid = np.arange(cap) < n_act
    feats = np.where(valid[:, None],
                     rng.randn(cap, cin), 0.0).astype(np.float32)
    dense = np.zeros((b, cin, zz, yy, xx), np.float32)
    dense[bs, :, z, y, x] = feats[:n_act]
    return feats, coords, valid, dense


def test_subm_conv_torch_golden(rng):
    b, zz, yy, xx, cin, cout = 2, 5, 7, 6, 6, 10
    feats, coords, valid, dense = _random_sparse(
        rng, b, zz, yy, xx, cin, n_act=60, cap=80)
    wt = rng.randn(cout, cin, 3, 3, 3).astype(np.float32) * 0.2

    t_out = F.conv3d(torch.from_numpy(dense), torch.from_numpy(wt),
                     padding=1).numpy()        # [B, Cout, Z, Y, X]

    wj = jnp.asarray(np.transpose(wt, (2, 3, 4, 1, 0)).reshape(
        27, cin, cout))
    sp = SparseTensor(jnp.asarray(feats), jnp.asarray(coords),
                      jnp.asarray(valid), (zz, yy, xx), b)
    out = subm_conv(sp, wj, (3, 3, 3))
    j_dense = np.transpose(np.asarray(sparse_to_dense(out)),
                           (0, 4, 1, 2, 3))

    # submanifold: equal to the dense conv ON the input site set
    act = dense.any(axis=1, keepdims=True)     # [B, 1, Z, Y, X]
    np.testing.assert_allclose(j_dense, np.where(act, t_out, 0.0),
                               rtol=1e-4, atol=1e-4)


def test_sparse_conv_torch_golden(rng):
    b, zz, yy, xx, cin, cout = 2, 6, 8, 8, 5, 7
    feats, coords, valid, dense = _random_sparse(
        rng, b, zz, yy, xx, cin, n_act=50, cap=64)
    wt = rng.randn(cout, cin, 3, 3, 3).astype(np.float32) * 0.2

    t_out = F.conv3d(torch.from_numpy(dense), torch.from_numpy(wt),
                     stride=2, padding=1).numpy()

    wj = jnp.asarray(np.transpose(wt, (2, 3, 4, 1, 0)).reshape(
        27, cin, cout))
    sp = SparseTensor(jnp.asarray(feats), jnp.asarray(coords),
                      jnp.asarray(valid), (zz, yy, xx), b)
    out = sparse_conv(sp, wj, (3, 3, 3), (2, 2, 2), (1, 1, 1),
                      max_out=512)
    assert out.spatial_shape == t_out.shape[2:]
    j_dense = np.transpose(np.asarray(sparse_to_dense(out)),
                           (0, 4, 1, 2, 3))

    # output sites cover every receptive field holding >=1 input; the
    # dense conv is zero everywhere else (all-zero field), so the
    # masked comparison checks values AND that no covered site is lost
    oz, oy, ox = t_out.shape[2:]
    cover = np.zeros((b, 1, oz, oy, ox), bool)
    cj, cv = np.asarray(out.coords), np.asarray(out.valid)
    cover[cj[cv, 0], 0, cj[cv, 1], cj[cv, 2], cj[cv, 3]] = True
    np.testing.assert_allclose(j_dense, np.where(cover, t_out, 0.0),
                               rtol=1e-4, atol=1e-4)
    # and the uncovered remainder of the dense conv is exactly zero
    assert np.abs(np.where(cover, 0.0, t_out)).max() < 1e-5


def test_bev_pool_batched_matches_generic(rng):
    """The VMEM scatter fast path (bev_pool_batched) equals the generic
    sort+scan bev_pool in value and gradient."""
    import jax
    import jax.numpy as jnp
    from distillbev_tpu.ops.bev_pool import bev_pool, bev_pool_batched

    b, p, c, h, w = 2, 700, 16, 8, 10
    feats = rng.randn(b, p, c).astype(np.float32)
    iy = rng.randint(-1, h + 1, (b, p)).astype(np.int32)
    ix = rng.randint(-1, w + 1, (b, p)).astype(np.int32)
    valid = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w) & \
        (rng.rand(b, p) > 0.1)
    cell = jnp.asarray(np.clip(iy, 0, h - 1) * w + np.clip(ix, 0, w - 1))
    batch_idx = np.broadcast_to(np.arange(b)[:, None], (b, p))
    coords = jnp.asarray(np.stack(
        [batch_idx.reshape(-1), np.clip(iy, 0, h - 1).reshape(-1),
         np.clip(ix, 0, w - 1).reshape(-1)], axis=-1).astype(np.int32))

    ref = bev_pool(jnp.asarray(feats.reshape(-1, c)), coords,
                   jnp.asarray(valid.reshape(-1)), b, h, w)
    got = bev_pool_batched(jnp.asarray(feats), cell,
                           jnp.asarray(valid), h, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    # gradients agree
    def loss_ref(f):
        return (bev_pool(f.reshape(-1, c), coords,
                         jnp.asarray(valid.reshape(-1)), b, h, w) ** 2
                ).sum()

    def loss_got(f):
        return (bev_pool_batched(f, cell, jnp.asarray(valid), h, w) ** 2
                ).sum()

    g_ref = jax.grad(loss_ref)(jnp.asarray(feats))
    g_got = jax.grad(loss_got)(jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)

    # bf16 feats run too (fp32 accumulate inside)
    got16 = bev_pool_batched(jnp.asarray(feats).astype(jnp.bfloat16),
                             cell, jnp.asarray(valid), h, w)
    np.testing.assert_allclose(np.asarray(got16), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
