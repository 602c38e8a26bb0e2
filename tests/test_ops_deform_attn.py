"""Parity tests for multi-scale deformable attention vs numpy reference."""
import contextlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import importlib

mda_mod = importlib.import_module("distillbev_tpu.ops.ms_deform_attn")
from distillbev_tpu.ops.ms_deform_attn import ms_deform_attn


@contextlib.contextmanager
def force_path(path: str):
    """Pin the sampling implementation: 'dense' routes every level
    through the separable-lerp matmul, 'gather' through the
    superrow/supercell walks."""
    orig = mda_mod._DENSE_MAX_CELLS
    mda_mod._DENSE_MAX_CELLS = 1 << 30 if path == "dense" else 0
    try:
        yield
    finally:
        mda_mod._DENSE_MAX_CELLS = orig


def numpy_ms_deform_attn(value, shapes, locs, weights):
    """Scalar-loop reference implementation."""
    B, _, M, C = value.shape
    Q = locs.shape[1]
    L = len(shapes)
    P = locs.shape[4]
    out = np.zeros((B, Q, M, C), np.float64)
    level_start = np.cumsum([0] + [h * w for h, w in shapes])
    for b in range(B):
        for qi in range(Q):
            for mi in range(M):
                for li, (H, W) in enumerate(shapes):
                    vl = value[b, level_start[li]:level_start[li + 1], mi]
                    vl = vl.reshape(H, W, C)
                    for pi in range(P):
                        xn, yn = locs[b, qi, mi, li, pi]
                        x = xn * W - 0.5
                        y = yn * H - 0.5
                        x0, y0 = int(np.floor(x)), int(np.floor(y))
                        lx, ly = x - x0, y - y0
                        acc = np.zeros(C)
                        for dy, wy in ((0, 1 - ly), (1, ly)):
                            for dx, wx in ((0, 1 - lx), (1, lx)):
                                yy, xx = y0 + dy, x0 + dx
                                if 0 <= yy < H and 0 <= xx < W:
                                    acc += wy * wx * vl[yy, xx]
                        out[b, qi, mi] += acc * weights[b, qi, mi, li, pi]
    return out.reshape(B, Q, M * C)


class TestMSDeformAttn:

    @pytest.mark.parametrize("path", ["dense", "gather"])
    def test_vs_numpy(self, rng, path):
        B, M, C, Q, P = 2, 2, 4, 5, 3
        shapes = ((4, 6), (2, 3))
        total = sum(h * w for h, w in shapes)
        value = rng.randn(B, total, M, C).astype(np.float32)
        locs = rng.uniform(-0.1, 1.1, (B, Q, M, len(shapes), P, 2)) \
            .astype(np.float32)
        weights = rng.rand(B, Q, M, len(shapes), P).astype(np.float32)
        weights /= weights.sum(axis=(3, 4), keepdims=True)
        with force_path(path):
            got = np.asarray(ms_deform_attn(
                jnp.asarray(value), shapes, jnp.asarray(locs),
                jnp.asarray(weights)))
        want = numpy_ms_deform_attn(value, shapes, locs, weights)
        assert np.allclose(got, want, atol=1e-4)

    def test_center_sample_identity(self):
        # sampling exactly at a pixel center returns that pixel
        H, W, C = 4, 4, 2
        value = np.arange(H * W * C, dtype=np.float32).reshape(1, H * W, 1, C)
        # pixel (1, 2): normalized x = (2+0.5)/W, y = (1+0.5)/H
        locs = np.array([(2 + 0.5) / W, (1 + 0.5) / H],
                        np.float32).reshape(1, 1, 1, 1, 1, 2)
        weights = np.ones((1, 1, 1, 1, 1), np.float32)
        out = np.asarray(ms_deform_attn(
            jnp.asarray(value), ((H, W),), jnp.asarray(locs),
            jnp.asarray(weights)))
        want = value[0, 1 * W + 2, 0]
        assert np.allclose(out[0, 0], want)

    def test_outside_samples_zero(self):
        value = np.ones((1, 16, 1, 3), np.float32)
        locs = np.full((1, 1, 1, 1, 2, 2), -2.0, np.float32)
        weights = np.ones((1, 1, 1, 1, 2), np.float32)
        out = np.asarray(ms_deform_attn(
            jnp.asarray(value), ((4, 4),), jnp.asarray(locs),
            jnp.asarray(weights)))
        assert np.allclose(out, 0)

    def test_differentiable(self, rng):
        B, M, C, Q, P = 1, 1, 2, 3, 2
        shapes = ((3, 3),)
        value = jnp.asarray(rng.randn(B, 9, M, C).astype(np.float32))
        locs = jnp.asarray(
            rng.uniform(0.2, 0.8, (B, Q, M, 1, P, 2)).astype(np.float32))
        weights = jnp.asarray(rng.rand(B, Q, M, 1, P).astype(np.float32))

        def loss(v, l, w):
            return jnp.sum(ms_deform_attn(v, shapes, l, w) ** 2)

        gv, gl, gw = jax.grad(loss, argnums=(0, 1, 2))(value, locs, weights)
        assert np.isfinite(np.asarray(gv)).all()
        assert np.isfinite(np.asarray(gl)).all()
        assert float(jnp.abs(gl).sum()) > 0  # grads flow into locations


def test_query_chunking_parity(rng):
    """The sequential query-chunked path (big-Q memory bound) matches
    the unchunked one, values and grads."""
    import importlib
    import jax
    mda = importlib.import_module("distillbev_tpu.ops.ms_deform_attn")
    b, hw, m, c, q, L, p = 1, 44, 4, 8, 300, 1, 4
    value = jnp.asarray(rng.randn(b, hw, m, c).astype(np.float32))
    loc = jnp.asarray(rng.rand(b, q, m, L, p, 2).astype(np.float32))
    wgt = jax.nn.softmax(jnp.asarray(
        rng.randn(b, q, m, L, p).astype(np.float32)))
    shapes = ((4, 11),)
    full = mda.ms_deform_attn(value, shapes, loc, wgt)
    g_full = jax.grad(lambda v: (mda.ms_deform_attn(
        v, shapes, loc, wgt) ** 2).sum())(value)
    orig = mda._MAX_GATHER_ROWS
    try:
        mda._MAX_GATHER_ROWS = 256        # force ~19 chunks
        chunked = mda.ms_deform_attn(value, shapes, loc, wgt)
        g_chunk = jax.grad(lambda v: (mda.ms_deform_attn(
            v, shapes, loc, wgt) ** 2).sum())(value)
    finally:
        mda._MAX_GATHER_ROWS = orig
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_full), np.asarray(g_chunk),
                               atol=1e-4)


@pytest.mark.parametrize("path", ["dense", "gather"])
def test_custom_vjp_matches_autodiff(rng, path):
    """The hand-written backward (reference ms_deform_attn_backward
    parity) matches autodiff of the same forward for all three inputs,
    chunked and unchunked, on both sampling implementations."""
    import importlib
    import jax
    mda = importlib.import_module("distillbev_tpu.ops.ms_deform_attn")
    b, m, c, q, p = 2, 4, 8, 37, 5
    shapes = ((6, 9), (3, 5))
    hw = sum(h * w for h, w in shapes)
    value = jnp.asarray(rng.randn(b, hw, m, c).astype(np.float32))
    loc = jnp.asarray(rng.rand(b, q, m, 2, p, 2).astype(np.float32))
    wgt = jax.nn.softmax(jnp.asarray(
        rng.randn(b, q, m, 2, p).astype(np.float32)), axis=-1)

    def loss_custom(v, l, w):
        return (mda.ms_deform_attn(v, shapes, l, w) ** 2).sum()

    def loss_auto(v, l, w):
        return (mda._attn_chunked(v, shapes, l, w) ** 2).sum()

    with force_path(path):
        ga = jax.grad(loss_auto, argnums=(0, 1, 2))(value, loc, wgt)
        orig = mda._MAX_GATHER_ROWS
        try:
            for rows_cap in (1 << 20, 64):
                mda._MAX_GATHER_ROWS = rows_cap
                gc = jax.grad(loss_custom, argnums=(0, 1, 2))(
                    value, loc, wgt)
                for a, b_ in zip(gc, ga):
                    ref = np.abs(np.asarray(b_)).max() + 1e-9
                    assert np.abs(np.asarray(a) - np.asarray(b_)).max() \
                        / ref < 1e-4
        finally:
            mda._MAX_GATHER_ROWS = orig


def test_dense_matches_gather(rng):
    """The dense separable-lerp matmul path is numerically equivalent to
    the gather path (values and all grads), including mixed dense/gather
    level splits."""
    b, m, c, q, p = 2, 2, 8, 23, 4
    shapes = ((12, 17), (5, 7))     # cells 266 / 63
    hw = sum(h * w for h, w in shapes)
    value = jnp.asarray(rng.randn(b, hw, m, c).astype(np.float32))
    loc = jnp.asarray(
        rng.uniform(-0.1, 1.1, (b, q, m, 2, p, 2)).astype(np.float32))
    wgt = jax.nn.softmax(jnp.asarray(
        rng.randn(b, q, m, 2, p).astype(np.float32)), axis=-1)

    def run(path, cells=None):
        orig = mda_mod._DENSE_MAX_CELLS
        mda_mod._DENSE_MAX_CELLS = cells if cells is not None else (
            1 << 30 if path == "dense" else 0)
        try:
            out = ms_deform_attn(value, shapes, loc, wgt)
            gv, gl, gw = jax.grad(
                lambda v, l, w: (ms_deform_attn(v, shapes, l, w).astype(
                    jnp.float32) ** 2).sum(),
                argnums=(0, 1, 2))(value, loc, wgt)
            return out, gv, gl, gw
        finally:
            mda_mod._DENSE_MAX_CELLS = orig

    ref = run("gather")
    for variant in [run("dense"), run(None, cells=100)]:  # all / mixed
        for a, b_ in zip(variant, ref):
            ref_mag = np.abs(np.asarray(b_)).max() + 1e-9
            assert np.abs(np.asarray(a) - np.asarray(b_)).max() \
                / ref_mag < 1e-5
