"""DCNv2 op tests: zero-offset equivalence to a dense conv, gradient
flow, and the flax module wiring."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from distillbev_tpu.ops.deform_conv import modulated_deform_conv2d
from distillbev_tpu.models.layers import ModulatedDeformConv


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def test_zero_offset_equals_dense_conv(rng):
    b, h, w, c, co = 2, 9, 11, 6, 8
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    weight = jnp.asarray(rng.randn(3, 3, c, co).astype(np.float32) * 0.1)
    offset = jnp.zeros((b, h, w, 18))
    mask = jnp.ones((b, h, w, 9))
    out = modulated_deform_conv2d(x, offset, mask, weight)

    ref = jax.lax.conv_general_dilated(
        x, weight, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4)


def test_half_pixel_offset_interpolates(rng):
    # shifting every tap by +0.5 in x averages horizontal neighbors
    b, h, w, c = 1, 6, 6, 4
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    # 1x1 kernel, identity weight -> output = sampled input
    weight = jnp.eye(c)[None, None]                    # [1, 1, C, C]
    offset = jnp.zeros((b, h, w, 2)).at[..., 1].set(0.5)
    mask = jnp.ones((b, h, w, 1))
    out = modulated_deform_conv2d(x, offset, mask, weight)
    expect = 0.5 * (x + jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0))
                                )[:, :, 1:])
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               atol=1e-5)


def test_modulation_scales_output(rng):
    b, h, w, c = 1, 5, 5, 4
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    weight = jnp.asarray(rng.randn(3, 3, c, c).astype(np.float32) * 0.1)
    offset = jnp.zeros((b, h, w, 18))
    full = modulated_deform_conv2d(x, offset, jnp.ones((b, h, w, 9)),
                                   weight)
    half = modulated_deform_conv2d(x, offset,
                                   jnp.full((b, h, w, 9), 0.5), weight)
    np.testing.assert_allclose(np.asarray(half), np.asarray(full) * 0.5,
                               atol=1e-5)


def test_module_init_and_grad(rng):
    x = jnp.asarray(rng.randn(2, 8, 8, 6).astype(np.float32))
    mod = ModulatedDeformConv(10, 3)
    params = mod.init(jax.random.PRNGKey(0), x)
    # conv_offset is zero-init: offsets 0, mask sigmoid(0) = 0.5
    out = mod.apply(params, x)
    assert out.shape == (2, 8, 8, 10)

    def loss(p):
        return jnp.sum(mod.apply(p, x) ** 2)
    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # offset conv gradient must be nonzero (deformable sampling is
    # differentiable w.r.t. the offsets through bilinear weights)
    g_off = g["params"]["conv_offset"]["kernel"]
    assert float(jnp.abs(g_off).max()) > 0


def test_stride_two(rng):
    x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    mod = ModulatedDeformConv(5, 3, stride=2)
    params = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params, x)
    assert out.shape == (1, 4, 4, 5)


def test_dense_path_matches_gather_path(rng):
    # the small-grid dense separable-lerp matmul path must agree with
    # the 4-corner gather path in outputs AND grads, including samples
    # pushed (partially) out of bounds
    import distillbev_tpu.ops.deform_conv as dc
    b, h, w, c, co = 2, 16, 44, 6, 8
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    weight = jnp.asarray(rng.randn(3, 3, c, co).astype(np.float32) * 0.1)
    # offsets up to +-3 px: corners spill over every edge
    offset = jnp.asarray(rng.uniform(-3, 3, (b, h, w, 18))
                         .astype(np.float32))
    mask = jnp.asarray(rng.uniform(0, 1, (b, h, w, 9))
                       .astype(np.float32))
    cot = jnp.asarray(rng.randn(b, h, w, co).astype(np.float32))

    def run(max_cells):
        # the gate reads the env var lazily, so plain os.environ works
        import os
        old = os.environ.get("DISTILLBEV_DCN_DENSE_MAX_CELLS")
        os.environ["DISTILLBEV_DCN_DENSE_MAX_CELLS"] = str(max_cells)
        try:
            def f(x, offset, mask, weight):
                return jnp.vdot(
                    modulated_deform_conv2d(x, offset, mask, weight),
                    cot)
            val, grads = jax.value_and_grad(f, argnums=(0, 1, 2, 3))(
                x, offset, mask, weight)
            return val, grads
        finally:
            if old is None:
                del os.environ["DISTILLBEV_DCN_DENSE_MAX_CELLS"]
            else:
                os.environ["DISTILLBEV_DCN_DENSE_MAX_CELLS"] = old

    v_dense, g_dense = run(10**6)
    v_gather, g_gather = run(0)
    np.testing.assert_allclose(float(v_dense), float(v_gather),
                               rtol=1e-5)
    for gd, gg in zip(g_dense, g_gather):
        np.testing.assert_allclose(np.asarray(gd), np.asarray(gg),
                                   rtol=2e-4, atol=2e-4)
