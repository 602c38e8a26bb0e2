"""Parity tests for assign_score_withk (PAConv) and roi_align against
straightforward numpy references implementing the reference CUDA
semantics (mmdet3d/ops/paconv/src/assign_score_withk_cuda.cu:48-80;
mmcv RoIAlign)."""
import numpy as np
import jax.numpy as jnp
import pytest

from distillbev_tpu.ops import assign_score_withk, roi_align


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _assign_score_np(scores, points, centers, knn_idx, aggregate):
    b, n, m, o = points.shape
    _, npoint, k, _ = scores.shape
    out = np.zeros((b, o, npoint, k), np.float32)
    for bi in range(b):
        for ni in range(npoint):
            cn = knn_idx[bi, ni, 0]
            for ki in range(k):
                kn = knn_idx[bi, ni, ki]
                if kn < 0 or kn >= n:
                    continue
                for mi in range(m):
                    s = scores[bi, ni, ki, mi]
                    out[bi, :, ni, ki] += s * (
                        points[bi, kn, mi] - centers[bi, cn, mi])
    if aggregate == "sum":
        return out.sum(-1)
    if aggregate == "avg":
        return out.mean(-1)
    if aggregate == "max":
        return out.max(-1)
    return out


@pytest.mark.parametrize("aggregate", ["sum", "avg", "max"])
def test_assign_score_withk_parity(rng, aggregate):
    b, n, m, o, npoint, k = 2, 12, 4, 6, 5, 3
    scores = rng.randn(b, npoint, k, m).astype(np.float32)
    points = rng.randn(b, n, m, o).astype(np.float32)
    centers = rng.randn(b, n, m, o).astype(np.float32)
    knn_idx = rng.randint(0, n, size=(b, npoint, k)).astype(np.int64)
    knn_idx[0, 1, 2] = n + 3          # out-of-range neighbor -> zero
    got = assign_score_withk(jnp.asarray(scores), jnp.asarray(points),
                             jnp.asarray(centers), jnp.asarray(knn_idx),
                             aggregate=aggregate)
    want = _assign_score_np(scores, points, centers, knn_idx, aggregate)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def _bilinear_np(feat, y, x):
    h, w = feat.shape[1], feat.shape[2]
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return np.zeros(feat.shape[3], np.float32)
    y = min(max(y, 0.0), h - 1)
    x = min(max(x, 0.0), w - 1)
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
    ly, lx = y - y0, x - x0
    return (feat[0, y0, x0] * (1 - ly) * (1 - lx) +
            feat[0, y0, x1] * (1 - ly) * lx +
            feat[0, y1, x0] * ly * (1 - lx) +
            feat[0, y1, x1] * ly * lx)


def _roi_align_np(features, rois, out_hw, scale, sr, aligned, mode):
    k5 = rois.shape[0]
    b, c, h, w = features.shape
    out_h, out_w = out_hw
    feats = np.transpose(features, (0, 2, 3, 1))
    out = np.zeros((k5, c, out_h, out_w), np.float32)
    off = 0.5 if aligned else 0.0
    for r in range(k5):
        bi = int(rois[r, 0])
        x1, y1, x2, y2 = rois[r, 1:] * scale - off
        rw, rh = x2 - x1, y2 - y1
        if not aligned:
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bw, bh = rw / out_w, rh / out_h
        for oy in range(out_h):
            for ox in range(out_w):
                vals = []
                for sy in range(sr):
                    for sx in range(sr):
                        yy = y1 + bh * (oy + (sy + 0.5) / sr)
                        xx = x1 + bw * (ox + (sx + 0.5) / sr)
                        vals.append(_bilinear_np(feats[bi:bi + 1], yy, xx))
                vals = np.stack(vals)
                out[r, :, oy, ox] = (vals.mean(0) if mode == "avg"
                                     else vals.max(0))
    return out


@pytest.mark.parametrize("aligned,mode", [(True, "avg"), (False, "avg"),
                                          (True, "max")])
def test_roi_align_parity(rng, aligned, mode):
    b, c, h, w = 2, 3, 10, 12
    features = rng.randn(b, c, h, w).astype(np.float32)
    rois = np.array([
        [0, 1.0, 2.0, 9.0, 8.0],
        [1, 0.0, 0.0, 24.0, 20.0],     # extends past the map at scale 0.5
        [0, 4.5, 3.5, 5.5, 6.0],       # small roi
    ], np.float32)
    got = roi_align(jnp.asarray(features), jnp.asarray(rois),
                    output_size=(4, 5), spatial_scale=0.5,
                    sampling_ratio=2, aligned=aligned, pool_mode=mode)
    want = _roi_align_np(features, rois, (4, 5), 0.5, 2, aligned, mode)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_roi_align_grad_flows(rng):
    import jax
    features = jnp.asarray(rng.randn(1, 2, 8, 8).astype(np.float32))
    rois = jnp.asarray(np.array([[0, 1, 1, 6, 6]], np.float32))

    def loss(f):
        return roi_align(f, rois, output_size=2).sum()

    g = jax.grad(loss)(features)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
