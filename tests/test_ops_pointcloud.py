"""Numeric parity tests for the point-cloud kernel layer vs numpy refs."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from distillbev_tpu.ops import segmented
from distillbev_tpu.ops.bev_pool import bev_pool, lift_splat_pool
from distillbev_tpu.ops.scatter import dynamic_scatter, scatter_reduce
from distillbev_tpu.ops.voxelize import (dynamic_voxelize, hard_voxelize,
                                         unique_voxels,
                                         compute_voxel_coords)


class TestSegmented:

    def test_segmented_cumsum(self):
        vals = jnp.array([1.0, 2, 3, 4, 5, 6])
        starts = jnp.array([True, False, True, False, False, True])
        out = segmented.segmented_cumsum(vals, starts)
        assert np.allclose(out, [1, 3, 3, 7, 12, 6])

    def test_segmented_cummax(self):
        vals = jnp.array([3.0, 1, 5, 2, 7, 0])
        starts = jnp.array([True, False, True, False, False, True])
        out = segmented.segmented_cummax(vals, starts)
        assert np.allclose(out, [3, 3, 5, 5, 7, 0])

    def test_position_in_segment(self):
        starts = jnp.array([True, False, False, True, False, True])
        pos = segmented.position_in_segment(starts)
        assert pos.tolist() == [0, 1, 2, 0, 1, 0]

    def test_segment_reduce_vs_numpy(self, rng):
        n, c, s = 200, 8, 17
        keys = np.sort(rng.randint(0, s, n)).astype(np.int32)
        vals = rng.randn(n, c).astype(np.float32)
        for mode in ("sum", "mean", "max"):
            got = np.asarray(segmented.segment_reduce_sorted(
                jnp.asarray(vals), jnp.asarray(keys), s, reduce=mode))
            want = np.zeros((s, c), np.float32)
            for k in range(s):
                rows = vals[keys == k]
                if len(rows):
                    want[k] = {"sum": rows.sum(0), "mean": rows.mean(0),
                               "max": rows.max(0)}[mode]
            assert np.allclose(got, want, atol=1e-4), mode

    def test_segment_reduce_with_invalid(self, rng):
        n, c, s = 100, 4, 9
        keys = np.sort(rng.randint(0, s, n)).astype(np.int32)
        vals = rng.randn(n, c).astype(np.float32)
        valid = rng.rand(n) > 0.3
        # emulate caller convention: invalid rows sorted to the end
        order = np.argsort(~valid, kind="stable")
        keys_s, vals_s, valid_s = keys[order], vals[order], valid[order]
        keys_s[:valid.sum()] = np.sort(keys_s[:valid.sum()])
        got = np.asarray(segmented.segment_reduce_sorted(
            jnp.asarray(vals_s), jnp.asarray(keys_s), s, reduce="sum",
            valid=jnp.asarray(valid_s)))
        want = np.zeros((s, c), np.float32)
        for k in range(s):
            rows = vals[(keys == k) & valid]
            if len(rows):
                want[k] = rows.sum(0)
        assert np.allclose(got, want, atol=1e-4)


class TestBevPool:

    def _numpy_pool(self, feats, coords, valid, b, h, w):
        out = np.zeros((b, h, w, feats.shape[1]), np.float32)
        for f, (bi, yi, xi), v in zip(feats, coords, valid):
            if v:
                out[bi, yi, xi] += f
        return out

    def test_forward_vs_numpy(self, rng):
        n, c, b, h, w = 500, 16, 2, 8, 8
        feats = rng.randn(n, c).astype(np.float32)
        coords = np.stack([rng.randint(0, b, n), rng.randint(0, h, n),
                           rng.randint(0, w, n)], -1).astype(np.int32)
        valid = rng.rand(n) > 0.2
        got = np.asarray(bev_pool(jnp.asarray(feats), jnp.asarray(coords),
                                  jnp.asarray(valid), b, h, w))
        want = self._numpy_pool(feats, coords, valid, b, h, w)
        assert np.allclose(got, want, atol=1e-4)

    def test_gradient(self, rng):
        n, c, b, h, w = 64, 4, 1, 4, 4
        feats = rng.randn(n, c).astype(np.float32)
        coords = np.stack([np.zeros(n), rng.randint(0, h, n),
                           rng.randint(0, w, n)], -1).astype(np.int32)
        valid = rng.rand(n) > 0.3

        def loss(f):
            out = bev_pool(f, jnp.asarray(coords), jnp.asarray(valid),
                           b, h, w)
            return jnp.sum(out ** 2)

        g = np.asarray(jax.grad(loss)(jnp.asarray(feats)))
        # numeric check on a few entries
        eps = 1e-2
        for i in [0, 7, 33]:
            for j in [0, 3]:
                fp = feats.copy(); fp[i, j] += eps
                fm = feats.copy(); fm[i, j] -= eps
                num = (float(loss(jnp.asarray(fp))) -
                       float(loss(jnp.asarray(fm)))) / (2 * eps)
                assert abs(num - g[i, j]) < 1e-2, (i, j, num, g[i, j])

    def test_invalid_rows_zero_grad(self, rng):
        n, c = 10, 3
        feats = jnp.asarray(rng.randn(n, c).astype(np.float32))
        coords = jnp.zeros((n, 3), jnp.int32)
        valid = jnp.asarray([True] * 5 + [False] * 5)
        g = jax.grad(lambda f: bev_pool(f, coords, valid, 1, 2, 2).sum())(
            feats)
        assert np.all(np.asarray(g)[5:] == 0)
        assert np.all(np.asarray(g)[:5] == 1)

    def test_lift_splat_pool_geometry(self):
        # 1 batch, 4 points at known ego coords
        feats = jnp.ones((1, 4, 2))
        geom = jnp.asarray([[[0.5, 0.5, 0.0],     # cell (0, 0)
                             [1.5, 0.5, 0.0],     # cell (0, 1) x-dir
                             [0.5, 1.5, 0.0],     # cell (1, 0) y-dir
                             [-5.0, 0.5, 0.0]]])  # out of range
        out = lift_splat_pool(feats, geom, bev_start=(0.0, 0.0),
                              bev_resolution=(1.0, 1.0), bev_shape=(2, 2))
        out = np.asarray(out)
        assert out.shape == (1, 2, 2, 2)
        assert np.allclose(out[0, 0, 0], 1) and np.allclose(out[0, 0, 1], 1)
        assert np.allclose(out[0, 1, 0], 1) and np.allclose(out[0, 1, 1], 0)


class TestVoxelize:

    def test_dynamic_voxelize(self):
        pts = jnp.asarray([[0.5, 0.5, 0.5], [-1.0, 0.0, 0.0],
                           [3.9, 3.9, 0.9]])
        coords = np.asarray(dynamic_voxelize(
            pts, (1.0, 1.0, 1.0), (0.0, 0.0, 0.0, 4.0, 4.0, 1.0)))
        assert coords[0].tolist() == [0, 0, 0]       # (z, y, x)
        assert coords[1].tolist() == [-1, -1, -1]    # out of range
        assert coords[2].tolist() == [0, 3, 3]

    def test_hard_voxelize_vs_numpy(self, rng):
        n = 300
        pts = rng.uniform(0, 4, (n, 4)).astype(np.float32)
        valid = rng.rand(n) > 0.1
        vs, pcr = (0.5, 0.5, 1.0), (0.0, 0.0, 0.0, 4.0, 4.0, 2.0)
        max_pts, max_vox = 8, 100
        out = hard_voxelize(jnp.asarray(pts), jnp.asarray(valid), vs, pcr,
                            max_pts, max_vox)
        # numpy reference
        coords_np, in_range = [np.asarray(a) for a in compute_voxel_coords(
            jnp.asarray(pts), vs, pcr)]
        ok = in_range & valid
        buckets = {}
        for p, c, o in zip(pts, coords_np, ok):
            if o:
                buckets.setdefault(tuple(c), []).append(p)
        nv = int(out.num_voxels)
        assert nv == min(len(buckets), max_vox)
        for i in range(nv):
            key = tuple(out.coords[i].tolist())
            assert key in buckets
            want = buckets[key]
            npts = int(out.num_points[i])
            assert npts == min(len(want), max_pts)
            got_rows = {tuple(np.round(r, 4)) for r in
                        np.asarray(out.voxels[i][:npts])}
            want_rows = {tuple(np.round(r, 4)) for r in want}
            assert got_rows <= want_rows
        # padding rows zero
        assert np.all(np.asarray(out.voxels[nv:]) == 0)
        assert np.all(np.asarray(out.coords[nv:]) == -1)

    def test_hard_voxelize_overflow_truncates(self, rng):
        pts = np.zeros((50, 3), np.float32) + 0.5  # all in one voxel
        out = hard_voxelize(jnp.asarray(pts), jnp.ones(50, bool),
                            (1.0, 1.0, 1.0), (0, 0, 0, 4, 4, 4), 5, 10)
        assert int(out.num_voxels) == 1
        assert int(out.num_points[0]) == 5

    def test_unique_voxels_mapping(self, rng):
        n = 200
        pts = rng.uniform(0, 4, (n, 3)).astype(np.float32)
        vs, pcr = (1.0, 1.0, 1.0), (0.0, 0.0, 0.0, 4.0, 4.0, 4.0)
        coords, in_range = compute_voxel_coords(jnp.asarray(pts), vs, pcr)
        p2v, vox_coords, n_vox = unique_voxels(
            coords, in_range, jnp.asarray([4, 4, 4]), 100)
        p2v, vox_coords = np.asarray(p2v), np.asarray(vox_coords)
        coords_np = np.asarray(coords)
        for i in range(n):
            v = p2v[i]
            assert v < 100
            assert vox_coords[v].tolist() == coords_np[i].tolist()


class TestDynamicScatter:

    def test_modes_vs_numpy(self, rng):
        n, c = 150, 6
        pts = rng.uniform(0, 4, (n, 3)).astype(np.float32)
        feats = rng.randn(n, c).astype(np.float32)
        valid = rng.rand(n) > 0.15
        vs, pcr = (1.0, 1.0, 1.0), (0.0, 0.0, 0.0, 4.0, 4.0, 4.0)
        for mode in ("mean", "max", "sum"):
            out = dynamic_scatter(jnp.asarray(feats), jnp.asarray(pts),
                                  jnp.asarray(valid), vs, pcr, 80, mode)
            coords_np = np.asarray(dynamic_voxelize(jnp.asarray(pts), vs,
                                                    pcr))
            buckets = {}
            for f, cc, v in zip(feats, coords_np, valid):
                if v and cc[0] >= 0:
                    buckets.setdefault(tuple(cc), []).append(f)
            nv = int(out.num_voxels)
            assert nv == len(buckets)
            for i in range(nv):
                key = tuple(np.asarray(out.voxel_coords[i]).tolist())
                rows = np.stack(buckets[key])
                want = {"mean": rows.mean(0), "max": rows.max(0),
                        "sum": rows.sum(0)}[mode]
                assert np.allclose(np.asarray(out.voxel_feats[i]), want,
                                   atol=1e-4), mode

    def test_grad_mean(self, rng):
        n, c, mv = 40, 3, 20
        feats = rng.randn(n, c).astype(np.float32)
        p2v = rng.randint(0, 5, n).astype(np.int32)

        def loss(f):
            return jnp.sum(scatter_reduce(f, jnp.asarray(p2v), mv,
                                          "mean") ** 2)

        g = np.asarray(jax.grad(loss)(jnp.asarray(feats)))
        eps = 1e-2
        for i in [0, 17]:
            fp = feats.copy(); fp[i, 1] += eps
            fm = feats.copy(); fm[i, 1] -= eps
            num = (float(loss(jnp.asarray(fp))) -
                   float(loss(jnp.asarray(fm)))) / (2 * eps)
            assert abs(num - g[i, 1]) < 1e-2

    def test_grad_max_routes_to_winner(self):
        feats = jnp.asarray([[1.0], [3.0], [2.0]])
        p2v = jnp.asarray([0, 0, 0])
        g = jax.grad(lambda f: scatter_reduce(f, p2v, 4, "max").sum())(feats)
        assert np.asarray(g).ravel().tolist() == [0.0, 1.0, 0.0]


class TestRoIAwarePool3d:
    def test_max_pool_matches_bruteforce(self, rng):
        from distillbev_tpu.ops.roiaware_pool3d import roiaware_pool3d
        import numpy as np
        r_n, n, c = 3, 400, 5
        rois = np.zeros((r_n, 7), np.float32)
        rois[:, :3] = rng.uniform(-5, 5, (r_n, 3))
        rois[:, 3:6] = rng.uniform(2, 4, (r_n, 3))
        rois[:, 6] = rng.uniform(-np.pi, np.pi, r_n)
        pts = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
        feats = rng.randn(n, c).astype(np.float32)
        out = np.asarray(roiaware_pool3d(
            jnp.asarray(rois), jnp.asarray(pts), jnp.asarray(feats),
            out_size=(4, 4, 4), mode="max"))
        assert out.shape == (r_n, 4, 4, 4, c)

        # brute force one roi
        ri = 0
        cx, cy, cz = rois[ri, :3]
        dx, dy, dz = rois[ri, 3:6]
        yaw = rois[ri, 6]
        rel = pts - rois[ri, :3]
        lx = rel[:, 0] * np.cos(yaw) + rel[:, 1] * np.sin(yaw)
        ly = -rel[:, 0] * np.sin(yaw) + rel[:, 1] * np.cos(yaw)
        lz = rel[:, 2]
        inside = (np.abs(lx) <= dx / 2) & (np.abs(ly) <= dy / 2) & \
            (lz >= 0) & (lz <= dz)
        got_any = False
        for i in np.where(inside)[0]:
            gx = min(int((lx[i] + dx / 2) / dx * 4), 3)
            gy = min(int((ly[i] + dy / 2) / dy * 4), 3)
            gz = min(int(lz[i] / dz * 4), 3)
            assert out[ri, gx, gy, gz].max() >= feats[i].max() - 1e-4
            got_any = True
        assert got_any

    def test_points_in_boxes_gpu_convention(self, rng):
        from distillbev_tpu.ops.roiaware_pool3d import points_in_boxes_gpu
        import numpy as np
        boxes = np.zeros((1, 2, 7), np.float32)
        boxes[0, 0] = [0, 0, 0, 2, 2, 2, 0]
        boxes[0, 1] = [5, 5, 0, 2, 2, 2, 0]
        pts = np.array([[[0, 0, 1], [5, 5, 1], [9, 9, 9]]], np.float32)
        idx = np.asarray(points_in_boxes_gpu(jnp.asarray(pts),
                                             jnp.asarray(boxes)))
        assert idx.tolist() == [[0, 1, -1]]
