"""Smoke tests for the offline visualization tools (reference
tools/analysis_tools/vis.py and tools/visualization/ — here rebuilt
devkit-free; these tests only need numpy/cv2/matplotlib)."""
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

from test_datasets import make_mini_nuscenes


def test_vis_camera_compose_frame(tmp_path):
    from tools.visualization.vis_camera import (compose_frame,
                                                depth_to_color,
                                                lidar_to_img)
    ann = make_mini_nuscenes(str(tmp_path), n_samples=2)
    import pickle
    with open(ann, "rb") as f:
        infos = pickle.load(f)["infos"]
    info = infos[0]

    # projection sanity: a point straight ahead of CAM_FRONT's axis
    # lands near the principal point with positive depth
    cam = info["cams"]["CAM_FRONT"]
    fwd = (np.asarray(cam["sensor2lidar_rotation"]) @ [0, 0, 10.0]
           + np.asarray(cam["sensor2lidar_translation"]))
    pix, depth, valid = lidar_to_img(fwd[None], cam)
    assert valid[0] and abs(depth[0] - 10.0) < 1e-6
    np.testing.assert_allclose(pix[0], [80.0, 45.0], atol=1e-4)

    cols = depth_to_color(np.array([0.0, 30.0, 80.0]))
    assert cols.shape == (3, 3) and (cols >= 0).all() and (cols <= 200).all()

    boxes = np.asarray(info["gt_boxes"], np.float64)
    names = [str(n) for n in info["gt_names"]]
    pts = np.fromfile(info["lidar_path"], np.float32).reshape(-1, 5)[:, :3]
    frame = compose_frame(info, pts, boxes, names, boxes,
                          draw_points=True, cam_width=160)
    assert frame.ndim == 3 and frame.shape[2] == 3
    assert frame.max() > 0  # something got drawn


def test_vis_camera_cli(tmp_path):
    """End-to-end CLI drive on the mini dataset with a fake results
    pickle in tools/test.py --out format."""
    import pickle
    import subprocess
    ann = make_mini_nuscenes(str(tmp_path), n_samples=2)
    cfg_path = tmp_path / "cfg.py"
    cfg_path.write_text(
        "data = dict(val=dict(type='NuScenesDataset', "
        f"ann_file='{ann}', data_root='', test_mode=True, "
        "pipeline=[]))\n")
    results = []
    rng = np.random.RandomState(0)
    for _ in range(2):
        n = 4
        boxes = np.zeros((n, 9), np.float32)
        boxes[:, :2] = rng.uniform(-20, 20, (n, 2))
        boxes[:, 3:6] = rng.uniform(1, 4, (n, 3))
        results.append(dict(pts_bbox=dict(
            boxes_3d=boxes, scores_3d=rng.uniform(0.3, 1.0, n),
            labels_3d=rng.randint(0, 3, n))))
    res_path = tmp_path / "results.pkl"
    with open(res_path, "wb") as f:
        pickle.dump(results, f)
    out_dir = tmp_path / "vis"
    repo = osp.dirname(osp.dirname(osp.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, osp.join(repo, "tools/visualization/"
                                  "vis_camera.py"),
         str(cfg_path), "--result", str(res_path), "--show-dir",
         str(out_dir), "--num-samples", "2", "--draw-points",
         "--video", str(tmp_path / "vis.mp4")],
        capture_output=True, text=True, cwd=repo)
    assert r.returncode == 0, r.stderr[-2000:]
    assert (out_dir / "sample_0000.jpg").exists()
    assert (out_dir / "sample_0001.jpg").exists()
    assert (tmp_path / "vis.mp4").exists()
