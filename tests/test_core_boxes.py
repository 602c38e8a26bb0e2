"""Tests for core box/point primitives: numpy<->JAX parity, geometry."""
import numpy as np
import pytest

from distillbev_tpu.core import (LiDARInstance3DBoxes, LiDARPoints,
                                 box_jax_ops, box_np_ops)


def random_boxes(rng, n, vel=False):
    b = np.zeros((n, 9 if vel else 7), np.float32)
    b[:, :2] = rng.uniform(-20, 20, (n, 2))
    b[:, 2] = rng.uniform(-2, 0, n)
    b[:, 3:6] = rng.uniform(0.5, 5.0, (n, 3))
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    if vel:
        b[:, 7:9] = rng.uniform(-3, 3, (n, 2))
    return b


class TestPointsInRbbox:

    def test_axis_aligned(self):
        boxes = np.array([[0, 0, 0, 2, 4, 2, 0]], np.float32)
        pts = np.array([
            [0, 0, 1],       # inside
            [0.99, 1.99, 1.9],  # inside near corner
            [1.01, 0, 1],    # outside x
            [0, 0, -0.1],    # below bottom
            [0, 0, 2.1],     # above top
        ], np.float32)
        m = box_np_ops.points_in_rbbox(pts, boxes)
        assert m[:, 0].tolist() == [True, True, False, False, False]

    def test_rotated(self):
        # box rotated 90deg: dx=2 along y now
        boxes = np.array([[0, 0, 0, 2, 6, 2, np.pi / 2]], np.float32)
        pts = np.array([
            [2.9, 0, 1],   # along x: within rotated dy/2=3
            [3.1, 0, 1],   # outside
            [0, 1.1, 1],   # along y: dy is now dx => limit 1
            [0, 0.9, 1],
        ], np.float32)
        m = box_np_ops.points_in_rbbox(pts, boxes)
        assert m[:, 0].tolist() == [True, False, False, True]

    def test_numpy_jax_parity(self, rng):
        import jax.numpy as jnp
        boxes = random_boxes(rng, 12)
        pts = rng.uniform(-25, 25, (300, 3)).astype(np.float32)
        m_np = box_np_ops.points_in_rbbox(pts, boxes)
        m_jax = np.asarray(
            box_jax_ops.points_in_rbbox(jnp.asarray(pts), jnp.asarray(boxes)))
        # boundary points can differ in fp32 vs fp64; none here are exactly
        # on a boundary with random data
        assert (m_np == m_jax).mean() > 0.999

    def test_padded_boxes_match_nothing(self):
        import jax.numpy as jnp
        boxes = jnp.zeros((4, 7))
        pts = jnp.zeros((10, 3))
        m = box_jax_ops.points_in_rbbox(pts, boxes)
        assert not bool(m.any())

    def test_bev_variant(self, rng):
        import jax.numpy as jnp
        boxes = random_boxes(rng, 8)
        big = boxes.copy()
        big[:, 2] = -100.0
        big[:, 5] = 200.0  # infinite z extent
        pts = rng.uniform(-25, 25, (200, 3)).astype(np.float32)
        m3d = box_np_ops.points_in_rbbox(pts, big)
        mbev = np.asarray(box_jax_ops.points_in_rbbox_bev(
            jnp.asarray(pts[:, :2]), jnp.asarray(boxes)))
        assert (m3d == mbev).mean() > 0.999


class TestBoxStructure:

    def test_centers(self):
        b = LiDARInstance3DBoxes([[1, 2, 3, 2, 2, 4, 0]])
        assert np.allclose(b.bottom_center, [[1, 2, 3]])
        assert np.allclose(b.gravity_center, [[1, 2, 5]])
        assert np.allclose(b.top_height, [7])

    def test_origin_conversion(self):
        b = LiDARInstance3DBoxes([[0, 0, 0, 2, 2, 4, 0]],
                                 origin=(0.5, 0.5, 0.5))
        assert np.allclose(b.bottom_center, [[0, 0, -2]])

    def test_corners_axis_aligned(self):
        b = LiDARInstance3DBoxes([[0, 0, 0, 2, 4, 6, 0]])
        c = b.corners[0]
        assert c.shape == (8, 3)
        assert np.allclose(c.min(0), [-1, -2, 0])
        assert np.allclose(c.max(0), [1, 2, 6])

    def test_rotate_points_consistency(self, rng):
        boxes = LiDARInstance3DBoxes(random_boxes(rng, 5, vel=True),
                                     box_dim=9)
        pts = rng.uniform(-10, 10, (50, 4)).astype(np.float32)
        inside_before = box_np_ops.points_in_rbbox(pts, boxes.tensor)
        ang = 0.7
        pts_out, _ = boxes.rotate(ang, pts.copy())
        inside_after = box_np_ops.points_in_rbbox(pts_out, boxes.tensor)
        assert (inside_before == inside_after).mean() > 0.99

    def test_flip_consistency(self, rng):
        boxes = LiDARInstance3DBoxes(random_boxes(rng, 5))
        pts = rng.uniform(-10, 10, (50, 3)).astype(np.float32)
        inside_before = box_np_ops.points_in_rbbox(pts, boxes.tensor)
        pts2 = pts.copy()
        boxes.flip("horizontal", pts2)
        inside_after = box_np_ops.points_in_rbbox(pts2, boxes.tensor)
        assert (inside_before == inside_after).all()

    def test_scale_translate(self):
        b = LiDARInstance3DBoxes([[1, 1, 0, 2, 2, 2, 0.3, 1.0, 2.0]],
                                 box_dim=9)
        b.scale(2.0)
        assert np.allclose(b.tensor[0, :6], [2, 2, 0, 4, 4, 4])
        assert np.allclose(b.tensor[0, 7:9], [2, 4])
        b.translate([1, 1, 1])
        assert np.allclose(b.tensor[0, :3], [3, 3, 1])

    def test_bev_and_range(self):
        b = LiDARInstance3DBoxes([[5, 5, 0, 2, 4, 2, 0.1],
                                  [100, 100, 0, 2, 2, 2, 0]])
        assert b.bev.shape == (2, 5)
        assert b.in_range_bev([-50, -50, 50, 50]).tolist() == [True, False]

    def test_cat_getitem(self):
        a = LiDARInstance3DBoxes([[0, 0, 0, 1, 1, 1, 0]])
        b = LiDARInstance3DBoxes([[1, 1, 1, 2, 2, 2, 1]])
        c = LiDARInstance3DBoxes.cat([a, b])
        assert len(c) == 2
        assert len(c[1]) == 1
        assert np.allclose(c[1].tensor[0, :3], [1, 1, 1])

    def test_enlarged_box(self):
        b = LiDARInstance3DBoxes([[0, 0, 0, 2, 2, 2, 0]])
        e = b.enlarged_box(0.5)
        assert np.allclose(e.dims[0], [3, 3, 3])
        assert np.allclose(e.bottom_height, [-0.5])


class TestRotatedIoU:

    def _brute_iou(self, a, b, res=400):
        """Monte-Carlo-free rasterized IoU for validation."""
        lo = min(a[0] - a[2], b[0] - b[2]) - 1
        hi = max(a[0] + a[2], b[0] + b[2]) + 1
        lo_y = min(a[1] - a[3], b[1] - b[3]) - 1
        hi_y = max(a[1] + a[3], b[1] + b[3]) + 1
        xs = np.linspace(lo, hi, res)
        ys = np.linspace(lo_y, hi_y, res)
        gx, gy = np.meshgrid(xs, ys)
        pts = np.stack([gx.ravel(), gy.ravel()], -1)

        def inside(box):
            c, s = np.cos(box[4]), np.sin(box[4])
            rel = pts - box[:2]
            lx = rel[:, 0] * c + rel[:, 1] * s
            ly = -rel[:, 0] * s + rel[:, 1] * c
            return (np.abs(lx) <= box[2] / 2) & (np.abs(ly) <= box[3] / 2)

        ia, ib = inside(a), inside(b)
        inter = (ia & ib).sum()
        union = (ia | ib).sum()
        return inter / max(union, 1)

    def test_identical_boxes(self):
        import jax.numpy as jnp
        box = jnp.array([[1.0, 2.0, 3.0, 4.0, 0.7]])
        iou = box_jax_ops.rotated_iou_bev(box, box)
        assert abs(float(iou[0, 0]) - 1.0) < 1e-5

    def test_disjoint(self):
        import jax.numpy as jnp
        a = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
        b = jnp.array([[10.0, 0.0, 2.0, 2.0, 1.0]])
        assert float(box_jax_ops.rotated_iou_bev(a, b)[0, 0]) == 0.0

    def test_known_axis_aligned(self):
        import jax.numpy as jnp
        a = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
        b = jnp.array([[1.0, 0.0, 2.0, 2.0, 0.0]])
        # inter = 1*2 = 2, union = 4+4-2 = 6
        assert abs(float(box_jax_ops.rotated_iou_bev(a, b)[0, 0]) - 2 / 6) < 1e-5

    def test_random_vs_raster(self, rng):
        import jax
        import jax.numpy as jnp
        n = 8
        a = np.stack([rng.uniform(-2, 2, n), rng.uniform(-2, 2, n),
                      rng.uniform(1, 4, n), rng.uniform(1, 4, n),
                      rng.uniform(-np.pi, np.pi, n)], -1).astype(np.float32)
        b = np.stack([rng.uniform(-2, 2, n), rng.uniform(-2, 2, n),
                      rng.uniform(1, 4, n), rng.uniform(1, 4, n),
                      rng.uniform(-np.pi, np.pi, n)], -1).astype(np.float32)
        got = np.asarray(jax.jit(box_jax_ops.rotated_iou_bev)(
            jnp.asarray(a), jnp.asarray(b)))
        for i in range(n):
            want = self._brute_iou(a[i], b[i])
            assert abs(float(got[i, i]) - want) < 0.02, (a[i], b[i], want)

    def test_rotation_invariance(self):
        import jax.numpy as jnp
        # 45-degree rotated identical squares
        a = jnp.array([[0.0, 0.0, 2.0, 2.0, np.pi / 4]])
        b = jnp.array([[0.0, 0.0, 2.0, 2.0, np.pi / 4]])
        assert abs(float(box_jax_ops.rotated_iou_bev(a, b)[0, 0]) - 1.0) < 1e-5


class TestPoints:

    def test_transforms(self, rng):
        pts = LiDARPoints(rng.uniform(-5, 5, (20, 4)).astype(np.float32),
                          points_dim=4)
        orig = pts.tensor.copy()
        pts.translate([1, 2, 3])
        assert np.allclose(pts.coord, orig[:, :3] + [1, 2, 3], atol=1e-5)
        pts.scale(2.0)
        pts.flip("horizontal")
        assert pts.tensor.shape == (20, 4)
        # extra column untouched
        assert np.allclose(pts.tensor[:, 3], orig[:, 3])

    def test_range_filters(self):
        pts = LiDARPoints([[0, 0, 0], [100, 0, 0]])
        assert pts.in_range_3d([-50, -50, -5, 50, 50, 5]).tolist() == \
            [True, False]
