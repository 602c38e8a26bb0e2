"""Sparse conv parity tests vs dense numpy convolution."""
import numpy as np
import jax.numpy as jnp

from distillbev_tpu.ops.spconv import (SparseTensor, build_subm_rulebook,
                                       sparse_conv, sparse_to_dense,
                                       subm_conv)


def make_sparse(rng, batch, shape, n_active, n_cap, cin):
    """Random sparse tensor with unique active sites."""
    zz, yy, xx = shape
    total = batch * zz * yy * xx
    flat = rng.choice(total, size=n_active, replace=False)
    b, rem = np.divmod(flat, zz * yy * xx)
    z, rem = np.divmod(rem, yy * xx)
    y, x = np.divmod(rem, xx)
    coords = np.full((n_cap, 4), -1, np.int32)
    coords[:n_active] = np.stack([b, z, y, x], -1)
    valid = np.zeros(n_cap, bool)
    valid[:n_active] = True
    feats = np.zeros((n_cap, cin), np.float32)
    feats[:n_active] = rng.randn(n_active, cin)
    return SparseTensor(jnp.asarray(feats), jnp.asarray(coords),
                        jnp.asarray(valid), shape, batch)


def dense_of(sp):
    return np.asarray(sparse_to_dense(sp))


def np_conv3d(x, w, stride, pad):
    """x [B,Z,Y,X,Cin], w [kz,ky,kx,Cin,Cout] -> dense conv (no bias)."""
    B, Z, Y, X, Ci = x.shape
    kz, ky, kx, _, Co = w.shape
    xp = np.pad(x, ((0, 0), (pad[0], pad[0]), (pad[1], pad[1]),
                    (pad[2], pad[2]), (0, 0)))
    oz = (Z + 2 * pad[0] - kz) // stride[0] + 1
    oy = (Y + 2 * pad[1] - ky) // stride[1] + 1
    ox = (X + 2 * pad[2] - kx) // stride[2] + 1
    out = np.zeros((B, oz, oy, ox, Co), np.float32)
    for zi in range(oz):
        for yi in range(oy):
            for xi in range(ox):
                patch = xp[:, zi * stride[0]:zi * stride[0] + kz,
                           yi * stride[1]:yi * stride[1] + ky,
                           xi * stride[2]:xi * stride[2] + kx]
                out[:, zi, yi, xi] = np.tensordot(
                    patch, w, axes=([1, 2, 3, 4], [0, 1, 2, 3]))
    return out


class TestSubmConv:

    def test_rulebook_center_is_self(self, rng):
        sp = make_sparse(rng, 1, (4, 4, 4), 10, 16, 3)
        nb = np.asarray(build_subm_rulebook(sp.coords, sp.valid,
                                            sp.spatial_shape, (3, 3, 3)))
        center = 13  # offset (1,1,1) in C-order of 3x3x3
        for i in range(10):
            assert nb[i, center] == i
        # padded rows miss everywhere
        assert (nb[10:] == 16).all()

    def test_subm_matches_dense_on_active_sites(self, rng):
        """SubM conv == dense conv at active sites when every input site
        is active at those positions (subm only differs by skipping
        outputs at inactive sites)."""
        cin, cout = 3, 5
        sp = make_sparse(rng, 2, (3, 4, 5), 25, 32, cin)
        w = rng.randn(27, cin, cout).astype(np.float32)
        out = subm_conv(sp, jnp.asarray(w), (3, 3, 3))
        dense_in = dense_of(sp)
        w_dense = w.reshape(3, 3, 3, cin, cout)
        dense_ref = np_conv3d(dense_in, w_dense, (1, 1, 1), (1, 1, 1))
        coords = np.asarray(sp.coords)
        got = np.asarray(out.feats)
        for i in range(25):
            b, z, y, x = coords[i]
            assert np.allclose(got[i], dense_ref[b, z, y, x], atol=1e-4)


class TestSparseConv:

    def test_matches_dense_everywhere(self, rng):
        """Strided sparse conv output densified == dense conv, at output
        sites having >=1 active input in their field; other sites are 0
        in both (inputs are 0 there)."""
        cin, cout = 2, 4
        sp = make_sparse(rng, 2, (4, 6, 6), 30, 40, cin)
        w = rng.randn(27, cin, cout).astype(np.float32)
        out = sparse_conv(sp, jnp.asarray(w), (3, 3, 3), (2, 2, 2),
                          (1, 1, 1), max_out=256)
        dense_in = dense_of(sp)
        dense_ref = np_conv3d(dense_in, w.reshape(3, 3, 3, cin, cout),
                              (2, 2, 2), (1, 1, 1))
        dense_got = dense_of(out)
        assert dense_got.shape == dense_ref.shape
        assert np.allclose(dense_got, dense_ref, atol=1e-4)

    def test_asymmetric_kernel(self, rng):
        """The SparseEncoder's final (3,1,1)/(2,1,1) conv shape."""
        cin, cout = 2, 3
        sp = make_sparse(rng, 1, (5, 4, 4), 20, 24, cin)
        w = rng.randn(3, cin, cout).astype(np.float32)
        out = sparse_conv(sp, jnp.asarray(w), (3, 1, 1), (2, 1, 1),
                          (0, 0, 0), max_out=128)
        dense_ref = np_conv3d(dense_of(sp),
                              w.reshape(3, 1, 1, cin, cout),
                              (2, 1, 1), (0, 0, 0))
        assert np.allclose(dense_of(out), dense_ref, atol=1e-4)
        assert out.spatial_shape == (2, 4, 4)

    def test_max_out_overflow_truncates(self, rng):
        sp = make_sparse(rng, 1, (4, 4, 4), 30, 32, 2)
        w = rng.randn(27, 2, 3).astype(np.float32)
        out = sparse_conv(sp, jnp.asarray(w), (3, 3, 3), (1, 1, 1),
                          (1, 1, 1), max_out=8)
        assert int(np.asarray(out.valid).sum()) == 8

    def test_empty_input(self):
        sp = SparseTensor(jnp.zeros((8, 2)), jnp.full((8, 4), -1, jnp.int32),
                          jnp.zeros(8, bool), (4, 4, 4), 1)
        w = jnp.ones((27, 2, 3))
        out = sparse_conv(sp, w, (3, 3, 3), (2, 2, 2), (1, 1, 1), 16)
        assert not bool(np.asarray(out.valid).any())
        assert np.allclose(np.asarray(out.feats), 0)


class TestInverseConv:

    def test_inverse_plan_roundtrip(self, rng):
        """down = sparse_conv(up); inverse plan must find, for each up
        site, exactly the down sites whose receptive field covers it."""
        from distillbev_tpu.ops.spconv import build_inverse_conv_plan
        sp = make_sparse(rng, 1, (4, 4, 4), 20, 24, 2)
        w = rng.randn(27, 2, 3).astype(np.float32)
        down = sparse_conv(sp, jnp.asarray(w), (3, 3, 3), (2, 2, 2),
                           (1, 1, 1), max_out=64)
        gidx = np.asarray(build_inverse_conv_plan(
            sp.coords, sp.valid, down.coords, down.valid,
            down.spatial_shape, (3, 3, 3), (2, 2, 2), (1, 1, 1)))
        n_down = down.coords.shape[0]
        # every valid up site must have at least one contributing down
        # site (its own output position exists by construction)
        valid = np.asarray(sp.valid)
        hits = (gidx < n_down).sum(axis=1)
        assert (hits[valid] >= 1).all()
        # cross-check one entry geometrically
        up_c = np.asarray(sp.coords)
        down_c = np.asarray(down.coords)
        i = int(np.where(valid)[0][0])
        ks = [(dz, dy, dx) for dz in range(3) for dy in range(3)
              for dx in range(3)]
        for k, (dz, dy, dx) in enumerate(ks):
            j = gidx[i, k]
            if j < n_down:
                num = up_c[i, 1:] + 1 - np.array([dz, dy, dx])
                assert (num % 2 == 0).all()
                assert (down_c[j, 1:] == num // 2).all()


class TestSparseUNet:

    def test_forward_shapes(self, rng):
        import jax
        from distillbev_tpu.models.builder import build_middle_encoder
        unet = build_middle_encoder(dict(
            type="SparseUNet", in_channels=3, sparse_shape=[9, 16, 16],
            base_channels=4, output_channels=8,
            encoder_channels=((4,), (8, 8), (8, 8)),
            encoder_paddings=((1,), (1, 1), (1, 1)),
            decoder_channels=((8, 8), (8, 4), (4, 4)),
            decoder_paddings=((1, 0), (1, 0), (0, 1)),
            max_active=256))
        sp = make_sparse(rng, 1, (9, 16, 16), 40, 64, 3)
        variables = unet.init(jax.random.PRNGKey(0), sp.feats, sp.coords,
                              sp.valid, 1)
        out = unet.apply(variables, sp.feats, sp.coords, sp.valid, 1)
        assert out["seg_features"].shape[0] == 64
        assert out["spatial_features"].ndim == 4
        assert np.isfinite(np.asarray(out["seg_features"])).all()
