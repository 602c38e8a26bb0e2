"""Presorted-points fast path: the host-side SortPointsByPillar
transform must establish exactly the order the device path
(ops/voxelize.sorted_voxel_info presorted=True) assumes, so the two
paths are bit-identical.  Also covers apis/train's auto-enable /
hard-error switch for the teacher's fast path."""
import numpy as np
import jax.numpy as jnp
import pytest

from distillbev_tpu.core.points import LiDARPoints
from distillbev_tpu.datasets.pipelines.transforms_3d import (
    SortPointsByPillar)
from distillbev_tpu.ops.voxelize import sorted_voxel_info

VS = (0.25, 0.25, 8.0)
PCR = (-2.0, -2.0, -4.0, 2.0, 2.0, 4.0)


def _random_cloud(rng, n=400, dim=5):
    pts = rng.uniform(-3, 3, (n, dim)).astype(np.float32)
    pts[:, 2] = rng.uniform(-5, 5, n)  # some out of z-range too
    return pts


def test_transform_matches_device_sort():
    """Host transform order == device stable sort order, and the
    presorted device path reproduces the sorting path bit-for-bit."""
    rng = np.random.RandomState(3)
    pts = _random_cloud(rng)
    tr = SortPointsByPillar(voxel_size=list(VS),
                            point_cloud_range=list(PCR))
    out = tr({"points": LiDARPoints(pts, points_dim=5)})
    sorted_host = out["points"].tensor
    assert out["points_presorted"]["voxel_size"] == list(VS)

    mask = jnp.ones(pts.shape[0], bool)
    ref = sorted_voxel_info(jnp.asarray(pts), mask, VS, PCR,
                            max_points=8, max_voxels=128)
    fast = sorted_voxel_info(jnp.asarray(sorted_host), mask, VS, PCR,
                             max_points=8, max_voxels=128,
                             presorted=True)
    # the sorting path's sorted_pts must equal the host-sorted array
    np.testing.assert_array_equal(np.asarray(ref.sorted_pts),
                                  sorted_host)
    for name in SortedVoxelInfoFields():
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, name)),
            np.asarray(getattr(fast, name)), err_msg=name)


def SortedVoxelInfoFields():
    from distillbev_tpu.ops.voxelize import SortedVoxelInfo
    return SortedVoxelInfo._fields


def test_transform_pushes_invalid_last():
    rng = np.random.RandomState(1)
    pts = _random_cloud(rng)
    tr = SortPointsByPillar(voxel_size=list(VS),
                            point_cloud_range=list(PCR))
    out = tr({"points": LiDARPoints(pts, points_dim=5)})["points"].tensor
    lo = np.asarray(PCR[:3])
    hi = np.asarray(PCR[3:])
    inr = ((out[:, :3] >= lo) & (out[:, :3] < hi)).all(1)
    # all in-range rows precede all out-of-range rows
    first_bad = np.argmax(~inr) if (~inr).any() else len(inr)
    assert inr[:first_bad].all() and not inr[first_bad:].any()


def _mini_cfg(with_transform: bool, presorted_flag: bool):
    from distillbev_tpu.config import Config
    pipe = [dict(type="LoadPointsFromFile")]
    if with_transform:
        pipe.append(dict(type="SortPointsByPillar",
                         voxel_size=list(VS),
                         point_cloud_range=list(PCR)))
    teacher = dict(type="CenterPoint",
                   pts_voxel_layer=dict(voxel_size=list(VS),
                                        point_cloud_range=list(PCR)))
    if presorted_flag:
        teacher["presorted_points"] = True
    cfg = Config(dict(data=dict(train=dict(pipeline=pipe))))
    return cfg, teacher


def test_train_api_auto_enables_hint():
    from distillbev_tpu.apis.train import _apply_presort_hint
    cfg, teacher = _mini_cfg(with_transform=True, presorted_flag=False)
    _apply_presort_hint(cfg, teacher)
    assert teacher["presorted_points"] is True


def test_train_api_rejects_unbacked_claim():
    from distillbev_tpu.apis.train import _apply_presort_hint
    cfg, teacher = _mini_cfg(with_transform=False, presorted_flag=True)
    with pytest.raises(ValueError, match="SortPointsByPillar"):
        _apply_presort_hint(cfg, teacher)


def test_train_api_mismatched_grid_not_enabled():
    from distillbev_tpu.apis.train import _apply_presort_hint
    cfg, teacher = _mini_cfg(with_transform=True, presorted_flag=False)
    teacher["pts_voxel_layer"]["voxel_size"] = [0.1, 0.1, 8.0]
    _apply_presort_hint(cfg, teacher)
    assert not teacher.get("presorted_points")
