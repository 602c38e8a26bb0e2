"""Unit tests for the Pallas scatter-add kernels (interpret mode).

These kernels are the TPU hot path of the deformable-attention
backward (``ops/ms_deform_attn.py``) and the LSS splat
(``ops/bev_pool.py``).  On CPU the attention op takes its XLA
fallback, so the kernel bodies are exercised HERE in Pallas interpret
mode against plain numpy accumulation — including the padding edges
(ragged last chunk, dropped >= size ids) that the callers rely on.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from distillbev_tpu.ops.pallas_scatter import (
    scatter_add_rows, scatter_add_rows_batched, scatter_add_rows_expand)


def _np_scatter(ids, upd, size):
    out = np.zeros((size, upd.shape[-1]), np.float64)
    for r, row in zip(ids, upd):
        if r < size:
            out[r] += row
    return out


@pytest.mark.parametrize("r", [37, 2048, 5000])
def test_scatter_add_rows(r):
    rng = np.random.RandomState(0)
    size = 300
    ids = rng.randint(0, size, size=(r,)).astype(np.int32)
    upd = rng.randn(r, 128).astype(np.float32)
    out = scatter_add_rows(jnp.asarray(ids), jnp.asarray(upd), size,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(out),
                               _np_scatter(ids, upd, size),
                               rtol=2e-5, atol=1e-4)


def test_scatter_add_rows_batched():
    rng = np.random.RandomState(1)
    b, r, size = 3, 1000, 64
    ids = rng.randint(0, size + 1, size=(b, r)).astype(np.int32)
    valid_sized = np.where(ids >= size, size, ids)   # drop row sentinel
    upd = rng.randn(b, r, 128).astype(np.float32)
    out = scatter_add_rows_batched(jnp.asarray(ids), jnp.asarray(upd),
                                   size, interpret=True)
    for i in range(b):
        np.testing.assert_allclose(
            np.asarray(out[i]), _np_scatter(valid_sized[i], upd[i], size),
            rtol=2e-5, atol=1e-4)


@pytest.mark.parametrize("lbp,q", [(4, 777), (8, 256), (24, 333)])
def test_scatter_add_rows_expand(lbp, q):
    """Expansion semantics: out[ids[s, i]] += concat_k(w[i, 4s+k]*g[i])
    — matches the XLA update-row formulation bit-for-bit in fp32."""
    rng = np.random.RandomState(2)
    size = 211
    c = 32
    ids_sq = rng.randint(0, size + 1, size=(lbp, q)).astype(np.int32)
    w = rng.randn(q, lbp * 4).astype(np.float32)
    g = rng.randn(q, 4 * c).astype(np.float32)
    out = scatter_add_rows_expand(jnp.asarray(ids_sq), jnp.asarray(w),
                                  jnp.asarray(g), size, interpret=True)
    ref = np.zeros((size, 4 * c), np.float64)
    for s in range(lbp):
        for i in range(q):
            r = ids_sq[s, i]
            if r >= size:
                continue
            w4 = w[i, 4 * s:4 * s + 4]
            ref[r] += np.repeat(w4, c) * g[i]
    np.testing.assert_allclose(np.asarray(out), ref,
                               rtol=2e-5, atol=1e-4)


def test_expand_matches_xla_fallback_through_attention():
    """End-to-end: ms_deform_attn grads with the update-expansion
    path forced (interpret-mode kernels) match the XLA ``.at[].add``
    fallback on identical inputs."""
    import importlib
    # the ops package re-exports the ms_deform_attn FUNCTION under the
    # module's dotted name, so plain ``import ... as`` grabs the
    # function — resolve the module through sys.modules instead
    mda = importlib.import_module(
        "distillbev_tpu.ops.ms_deform_attn")
    import jax

    rng = np.random.RandomState(3)
    b, m, c, p = 2, 4, 32, 4
    # level 0 large enough to take the GATHER (scatter-backed) path
    # ((30+2)*(40+2) > _DENSE_MAX_CELLS), level 1 dense
    shapes = ((30, 40), (5, 7))
    hw = sum(h * w for h, w in shapes)
    q = 50
    value = jnp.asarray(rng.randn(b, hw, m, c), jnp.float32)
    loc = jnp.asarray(rng.rand(b, q, m, len(shapes), p, 2), jnp.float32)
    wgt = jnp.asarray(rng.rand(b, q, m, len(shapes), p), jnp.float32)

    def loss(v, l, w):
        return (mda.ms_deform_attn(v, shapes, l, w) ** 2).sum()

    g_fallback = jax.grad(loss, argnums=(0, 1, 2))(value, loc, wgt)

    # force the kernel route with interpret-mode pallas
    orig_backend = jax.default_backend
    orig = mda.scatter_add_rows_expand
    try:
        mda.scatter_add_rows_expand = (
            lambda ids, w, g, size: orig(ids, w, g, size,
                                         interpret=True))
        import unittest.mock as mock
        with mock.patch.object(jax, "default_backend",
                               return_value="tpu"):
            g_kernel = jax.grad(loss, argnums=(0, 1, 2))(value, loc,
                                                         wgt)
    finally:
        mda.scatter_add_rows_expand = orig
    for a, b_ in zip(g_fallback, g_kernel):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-5, atol=2e-4)
