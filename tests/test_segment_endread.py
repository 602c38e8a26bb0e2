"""Edge cases for the compaction-based segment end-read
(ops/segmented.py segment_reduce_sorted) and voxelize metadata
(_segment_meta_compact)."""
import numpy as np
import jax.numpy as jnp
import pytest

from distillbev_tpu.ops.segmented import segment_reduce_sorted


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _ref(vals, keys, nseg, reduce):
    out = np.zeros((nseg,) + vals.shape[1:], np.float64)
    cnt = np.zeros(nseg)
    for v, k in zip(vals, keys):
        if k >= nseg:
            continue
        if reduce == "max":
            out[k] = np.maximum(out[k], v) if cnt[k] else v
        else:
            out[k] += v
        cnt[k] += 1
    if reduce == "mean":
        out /= np.maximum(cnt, 1)[:, None]
    return out.astype(np.float32)


@pytest.mark.parametrize("reduce", ["sum", "max", "mean"])
def test_sparse_segments(rng, reduce):
    """Most segments empty; keys sparse in [0, nseg)."""
    n, nseg, c = 333, 500, 5
    keys = np.sort(rng.choice(40, n)).astype(np.int32) * 11
    vals = rng.randn(n, c).astype(np.float32)
    got = segment_reduce_sorted(jnp.asarray(vals), jnp.asarray(keys),
                                nseg, reduce=reduce)
    np.testing.assert_allclose(np.asarray(got),
                               _ref(vals, keys, nseg, reduce),
                               atol=1e-4)


def test_all_sentinel_rows():
    """Every row invalid (key == num_segments) -> all zeros."""
    n, nseg, c = 64, 16, 3
    keys = np.full(n, nseg, np.int32)
    vals = np.ones((n, c), np.float32)
    got = segment_reduce_sorted(jnp.asarray(vals), jnp.asarray(keys),
                                nseg, reduce="sum")
    assert np.asarray(got).sum() == 0


def test_single_giant_segment(rng):
    n, nseg, c = 1024, 8, 4
    keys = np.full(n, 3, np.int32)
    vals = rng.randn(n, c).astype(np.float32)
    got = np.asarray(segment_reduce_sorted(
        jnp.asarray(vals), jnp.asarray(keys), nseg, reduce="sum"))
    np.testing.assert_allclose(got[3], vals.sum(0), rtol=1e-4)
    assert np.abs(np.delete(got, 3, axis=0)).sum() == 0


def test_more_segments_than_rows(rng):
    """num_segments > n: the compaction candidate slice is clipped."""
    n, nseg, c = 10, 1000, 2
    keys = np.sort(rng.randint(0, nseg, n)).astype(np.int32)
    vals = rng.randn(n, c).astype(np.float32)
    got = segment_reduce_sorted(jnp.asarray(vals), jnp.asarray(keys),
                                nseg, reduce="sum")
    np.testing.assert_allclose(np.asarray(got),
                               _ref(vals, keys, nseg, "sum"), atol=1e-5)


def test_meta_compact_tiny_n(rng):
    """sorted_voxel_info with n < max_voxels (padding branch)."""
    from distillbev_tpu.ops.voxelize import sorted_voxel_info
    pts = rng.uniform(-5, 5, (50, 4)).astype(np.float32)
    mask = np.ones(50, bool)
    info = sorted_voxel_info(jnp.asarray(pts), jnp.asarray(mask),
                             (1.0, 1.0, 10.0), (-5, -5, -5, 5, 5, 5),
                             max_points=4, max_voxels=200)
    nv = int(info.num_voxels)
    assert 0 < nv <= 50
    coords = np.asarray(info.coords)
    assert (coords[nv:] == -1).all()
    npts = np.asarray(info.num_points)
    assert (npts[:nv] >= 1).all() and (npts[:nv] <= 4).all()
    assert npts[nv:].sum() == 0
    # start_rows of real voxels point at rows with matching coords
    sr = np.asarray(info.start_rows)
    spts = np.asarray(info.sorted_pts)
    vs = np.array([1.0, 1.0, 10.0])
    for v in range(min(nv, 10)):
        p = spts[sr[v]]
        cell = np.floor((p[:3] - (-5)) / vs).astype(int)
        assert (cell[::-1] == coords[v]).all()
