"""GT-database builder round trip: tools/create_data.py
create_groundtruth_database -> DataBaseSampler loads and samples it
(reference create_gt_database.py + dbsampler.py)."""
import os
import os.path as osp
import pickle
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def _make_infos(root, rng, n_samples=3, n_box=6):
    os.makedirs(root, exist_ok=True)
    infos = []
    for i in range(n_samples):
        lidar_path = osp.join(root, f"lidar_{i}.bin")
        boxes = np.zeros((n_box, 7), np.float32)
        boxes[:, 0] = np.linspace(-20, 20, n_box)         # spread out
        boxes[:, 1] = (i - 1) * 10.0
        boxes[:, 2] = 0.0                                  # gravity z
        boxes[:, 3:6] = 3.0
        boxes[:, 6] = rng.uniform(-np.pi, np.pi, n_box)
        # points: background + a few inside each box
        bg = rng.uniform(-40, 40, (2000, 5)).astype(np.float32)
        inside = []
        for b in boxes:
            p = rng.uniform(-1.0, 1.0, (25, 5)).astype(np.float32)
            p[:, :3] = p[:, :3] * 1.2 + b[:3]
            inside.append(p)
        pts = np.concatenate([bg] + inside)
        pts.tofile(lidar_path)
        infos.append(dict(
            token=f"tok{i}", lidar_path=lidar_path,
            gt_boxes=boxes, gt_names=np.array(["car", "truck"] *
                                              (n_box // 2))))
    ann = osp.join(root, "mini_infos_train.pkl")
    with open(ann, "wb") as f:
        pickle.dump(dict(infos=infos), f)
    return ann


def test_gt_database_roundtrip(tmp_path, rng):
    root = str(tmp_path)
    _make_infos(root, rng)
    from tools.create_data import create_groundtruth_database
    create_groundtruth_database(root, "mini")

    db_path = osp.join(root, "mini_dbinfos_train.pkl")
    assert osp.exists(db_path)
    with open(db_path, "rb") as f:
        db = pickle.load(f)
    assert set(db) == {"car", "truck"}
    assert len(db["car"]) == 9                 # 3 per sample x 3

    # object points are stored box-centered and the count matches
    for entry in db["car"][:3]:
        obj = np.fromfile(osp.join(root, entry["path"]),
                          np.float32).reshape(-1, 5)
        assert len(obj) == entry["num_points_in_gt"]
        assert entry["num_points_in_gt"] >= 20   # the planted cluster
        assert np.abs(obj[:, :3]).max() < 3.0    # centered on the box

    # DataBaseSampler consumes the database and pastes new objects
    from distillbev_tpu.datasets.pipelines.transforms_3d import \
        DataBaseSampler
    sampler = DataBaseSampler(
        info_path=db_path, data_root=root, rate=1.0,
        prepare=dict(filter_by_min_points=dict(car=5, truck=5)),
        sample_groups=dict(car=4, truck=4),
        classes=["car", "truck"])
    gt_boxes = np.zeros((1, 9), np.float32)
    gt_boxes[0, 3:6] = 1.0
    out = sampler.sample_all(gt_boxes[:, :7], np.array(["car"]))
    assert out is not None
    assert len(out["gt_bboxes_3d"]) > 0
    assert out["points"].shape[1] == 5
