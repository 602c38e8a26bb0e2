"""Tests for gaussian heatmap utils and NMS (numpy reference vs JAX)."""
import numpy as np
import jax.numpy as jnp

from distillbev_tpu.core import gaussian, post_processing


class TestRadius:

    def test_gaussian_radius_is_min(self):
        det = (6.0, 4.0)
        r = gaussian.gaussian_radius(det, 0.5)
        rs = [gaussian.centerpoint_radius_func1(det),
              gaussian.centerpoint_radius_func2(det),
              gaussian.centerpoint_radius_func3(det)]
        assert abs(r - min(rs)) < 1e-6

    def test_maxwh(self):
        assert gaussian.maxwh_radius_func((3.0, 7.0), scale=2.0) == 14.0

    def test_radius_positive_and_monotone(self):
        r_small = gaussian.gaussian_radius((2.0, 2.0))
        r_big = gaussian.gaussian_radius((10.0, 10.0))
        assert 0 < r_small < r_big


class TestHeatmapParity:

    def test_dense_matches_numpy_draw(self, rng):
        H = W = 32
        centers = np.array([[10.3, 12.7], [20.1, 5.5], [30.9, 30.2]],
                           np.float32)
        radii = np.array([3.2, 5.7, 2.0], np.float32)
        # numpy reference: per-object patch draw with int snapping
        hm_np = np.zeros((H, W), np.float32)
        for c, r in zip(centers, radii):
            gaussian.draw_heatmap_gaussian(hm_np, (int(c[0]), int(c[1])),
                                           int(r))
        hm_jax = np.asarray(gaussian.gaussian_heatmap_dense(
            jnp.asarray(centers), jnp.asarray(radii),
            jnp.zeros(3, jnp.int32), jnp.ones(3, bool), 1, H, W))[0]
        assert np.allclose(hm_np, hm_jax, atol=1e-5)

    def test_padding_ignored(self):
        H = W = 16
        centers = jnp.array([[8.0, 8.0], [4.0, 4.0]])
        radii = jnp.array([2.0, 2.0])
        valid = jnp.array([True, False])
        hm = gaussian.gaussian_heatmap_dense(
            centers, radii, jnp.zeros(2, jnp.int32), valid, 1, H, W)
        assert float(hm[0, 4, 4]) == 0.0
        assert float(hm[0, 8, 8]) == 1.0

    def test_out_of_grid_center_ignored(self):
        hm = gaussian.gaussian_heatmap_dense(
            jnp.array([[-5.0, 8.0]]), jnp.array([3.0]),
            jnp.zeros(1, jnp.int32), jnp.ones(1, bool), 1, 16, 16)
        assert float(hm.sum()) == 0.0

    def test_multi_class_routing(self):
        hm = gaussian.gaussian_heatmap_dense(
            jnp.array([[4.0, 4.0], [10.0, 10.0]]), jnp.array([2.0, 2.0]),
            jnp.array([0, 2]), jnp.ones(2, bool), 3, 16, 16)
        assert float(hm[0, 4, 4]) == 1.0
        assert float(hm[2, 10, 10]) == 1.0
        assert float(hm[1].max()) == 0.0


class TestNMS:

    def test_circle_nms_parity(self, rng):
        n = 40
        dets = np.zeros((n, 3), np.float32)
        dets[:, :2] = rng.uniform(-10, 10, (n, 2))
        dets[:, 2] = rng.uniform(0, 1, n)
        keep_np = set(post_processing.circle_nms(dets, thresh=4.0,
                                                 post_max_size=n))
        mask = np.asarray(post_processing.circle_nms_mask(
            jnp.asarray(dets[:, :2]), jnp.asarray(dets[:, 2]), 4.0))
        keep_jax = set(np.where(mask)[0].tolist())
        assert keep_np == keep_jax

    def test_rotated_nms_suppresses_duplicates(self):
        boxes = jnp.array([
            [0, 0, 4, 2, 0.3],
            [0.1, 0.05, 4, 2, 0.3],   # near-duplicate, lower score
            [20, 20, 4, 2, 1.0],      # far away
        ], jnp.float32)
        scores = jnp.array([0.9, 0.8, 0.7])
        mask = np.asarray(post_processing.rotated_nms_mask(
            boxes, scores, thresh=0.2))
        assert mask.tolist() == [True, False, True]

    def test_rotated_nms_valid_mask(self):
        boxes = jnp.array([[0, 0, 4, 2, 0.0], [0, 0, 4, 2, 0.0]],
                          jnp.float32)
        scores = jnp.array([0.5, 0.9])
        valid = jnp.array([True, False])
        mask = np.asarray(post_processing.rotated_nms_mask(
            boxes, scores, 0.2, valid=valid))
        # invalid higher-score box neither kept nor suppressing
        assert mask.tolist() == [True, False]

    def test_aligned_3d_nms(self):
        boxes = np.array([
            [0, 0, 0, 2, 2, 2],
            [0.1, 0.1, 0, 2.1, 2.1, 2],
            [5, 5, 5, 6, 6, 6],
        ], np.float32)
        scores = np.array([0.9, 0.5, 0.8])
        classes = np.array([0, 0, 0])
        keep = post_processing.aligned_3d_nms(boxes, scores, classes, 0.3)
        assert keep.tolist() == [0, 2]
