"""Native C++ pipeline kernels vs the numpy fallback."""
import os.path as osp

import numpy as np
import pytest

from distillbev_tpu import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native lib unavailable (no g++)")
    return True


class TestAggregateSweeps:

    def test_matches_numpy(self, tmp_path, rng, lib_ok):
        load_dim, n_sweeps = 5, 3
        paths, rots, trans, lags = [], [], [], []
        for i in range(n_sweeps):
            pts = rng.randn(100 + 10 * i, load_dim).astype(np.float32)
            p = str(tmp_path / f"sweep_{i}.bin")
            pts.tofile(p)
            paths.append(p)
            if i == 0:
                rots.append(np.eye(3, dtype=np.float32))
                trans.append(np.zeros(3, np.float32))
            else:
                th = 0.1 * i
                rots.append(np.array(
                    [[np.cos(th), -np.sin(th), 0],
                     [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32))
                trans.append(rng.randn(3).astype(np.float32))
            lags.append(0.05 * i)
        args = (paths, np.stack(rots), np.stack(trans),
                np.asarray(lags, np.float32), load_dim, [0, 1, 2, 3],
                512)
        out_c, n_c = native.aggregate_sweeps(*args)
        # numpy fallback path
        lib = native._LIB
        native._LIB = False
        try:
            out_np, n_np = native.aggregate_sweeps(*args)
        finally:
            native._LIB = lib
        assert n_c == n_np == 100 + 110 + 120
        assert np.allclose(out_c, out_np, atol=1e-5)
        # time-lag column present
        assert np.allclose(out_c[:100, 4], 0.0)
        assert np.allclose(out_c[100:210, 4], 0.05)

    def test_remove_close(self, tmp_path, rng, lib_ok):
        pts = np.zeros((50, 5), np.float32)
        pts[:25, :2] = 0.3          # close to sensor
        pts[25:, :2] = 5.0
        p = str(tmp_path / "s.bin")
        pts.tofile(p)
        out, n = native.aggregate_sweeps(
            [p], np.eye(3, dtype=np.float32)[None],
            np.zeros((1, 3), np.float32), np.zeros(1, np.float32),
            5, [0, 1, 2, 3], 128, remove_close=1.0)
        assert n == 25

    def test_overflow_truncates(self, tmp_path, rng, lib_ok):
        pts = rng.randn(300, 5).astype(np.float32)
        p = str(tmp_path / "big.bin")
        pts.tofile(p)
        out, n = native.aggregate_sweeps(
            [p], np.eye(3, dtype=np.float32)[None],
            np.zeros((1, 3), np.float32), np.zeros(1, np.float32),
            5, [0, 1, 2, 3], 100)
        assert n == 100
        assert np.all(out[100:] == 0) if out.shape[0] > 100 else True


class TestNormalizeImages:

    def test_matches_numpy(self, rng, lib_ok):
        imgs = rng.randint(0, 255, (4, 32, 48, 3), dtype=np.uint8)
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        got = native.normalize_images(imgs, mean, std)
        want = (imgs.astype(np.float32) / 255.0 - mean) / std
        assert np.allclose(got, want, atol=1e-5)


class TestRangeFilter:

    def test_matches_numpy(self, rng, lib_ok):
        pts = rng.uniform(-60, 60, (1000, 5)).astype(np.float32)
        pcr = np.array([-50, -50, -5, 50, 50, 3], np.float32)
        out_c, n_c = native.range_filter_pad(pts, pcr, 2048)
        lib = native._LIB
        native._LIB = False
        try:
            out_np, n_np = native.range_filter_pad(pts, pcr, 2048)
        finally:
            native._LIB = lib
        assert n_c == n_np
        assert np.allclose(out_c, out_np)


class TestNativeSweepPipeline:

    def test_transform_parity(self, tmp_path, rng, lib_ok):
        """LoadPointsFromMultiSweeps native path == python path."""
        from distillbev_tpu.datasets.pipelines.loading import (
            LoadPointsFromFile, LoadPointsFromMultiSweeps)
        key = rng.randn(200, 5).astype(np.float32)
        kp = str(tmp_path / "key.bin")
        key.tofile(kp)
        sweeps = []
        for i in range(2):
            pts = rng.randn(150, 5).astype(np.float32)
            sp = str(tmp_path / f"sw{i}.bin")
            pts.tofile(sp)
            th = 0.2 * (i + 1)
            sweeps.append(dict(
                data_path=sp, timestamp=1e6 * (0.95 - 0.05 * i),
                sensor2lidar_rotation=np.array(
                    [[np.cos(th), -np.sin(th), 0],
                     [np.sin(th), np.cos(th), 0], [0, 0, 1]]),
                sensor2lidar_translation=rng.randn(3)))
        base = dict(pts_filename=kp, sweeps=sweeps, timestamp=1.0)

        def run(use_native):
            results = dict(base)
            results = LoadPointsFromFile(
                load_dim=5, use_dim=[0, 1, 2, 3, 4])(results)
            results = LoadPointsFromMultiSweeps(
                sweeps_num=5, load_dim=5, use_dim=[0, 1, 2, 3],
                use_native=use_native, test_mode=True)(results)
            return results["points"].tensor

        a = run(False)
        b = run(True)
        assert a.shape[-1] == b.shape[-1] == 5
        # same content (native returns only valid rows)
        assert len(b) == len(a)
        assert np.allclose(np.sort(a[:, 0]), np.sort(b[:, 0]), atol=1e-4)
        assert np.allclose(a[:200], b[:200], atol=1e-4)  # key frame first


class TestPointsToDepthMaps:

    def test_matches_numpy_path(self, rng, lib_ok):
        """Native fused projection == PointToMultiViewDepth numpy loop."""
        from distillbev_tpu.datasets.pipelines.loading import \
            PointToMultiViewDepth
        from distillbev_tpu import native
        n_cam, h, w = 3, 128, 352
        pts = rng.uniform(-40, 40, (20000, 3)).astype(np.float32)
        rots, trans, intrins, prots, ptrans = [], [], [], [], []
        for c in range(n_cam):
            th = 2 * np.pi * c / n_cam
            rots.append(np.array(
                [[np.cos(th), 0, np.sin(th)],
                 [np.sin(th), 0, -np.cos(th)], [0, -1, 0]], np.float32))
            trans.append(np.array([0, 0, 1.5], np.float32))
            intrins.append(np.array([[120.0, 0, w / 2], [0, 120.0, h / 2],
                                     [0, 0, 1]], np.float32))
            pr = np.eye(3, dtype=np.float32)
            pr[:2, :2] *= 0.9
            prots.append(pr)
            ptrans.append(np.array([3.0, -2.0, 0], np.float32))
        rots = np.stack(rots); trans = np.stack(trans)
        intrins = np.stack(intrins)
        prots = np.stack(prots); ptrans = np.stack(ptrans)

        tr = PointToMultiViewDepth(
            grid_config={"dbound": [1.0, 60.0, 1.0]}, downsample=16)
        want = []
        for c in range(n_cam):
            pc = (pts - trans[c]) @ rots[c]
            depth = pc[:, 2]
            uv = pc[:, :2] / np.maximum(depth[:, None], 1e-5)
            uv = uv @ intrins[c][:2, :2].T + intrins[c][:2, 2]
            uv = uv @ prots[c][:2, :2].T + ptrans[c][:2]
            pi = np.concatenate([uv, depth[:, None]], -1)[depth > 0]
            want.append(tr.points2depthmap(pi, h, w))
        want = np.stack(want)

        got = native.points_to_depth_maps(pts, rots, trans, intrins,
                                          prots, ptrans, h, w, 16,
                                          1.0, 60.0)
        assert got is not None
        assert got.shape == want.shape
        # identical sparsity pattern and min depths
        mism = np.abs(got - want) > 1e-4
        assert mism.mean() < 1e-3, (mism.sum(), want.size)
