"""Full-pipeline E2E: config file -> dataset -> train_model loop ->
checkpoint -> eval, on the synthetic mini nuScenes (CPU)."""
import os
import os.path as osp
import sys

import numpy as np
import pytest

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

from distillbev_tpu.config import Config
from test_datasets import make_mini_nuscenes, DATA_CONFIG, PCR, \
    bevdepth_pipeline


def write_mini_distill_config(tmp_path, ann_file):
    """A miniature CenterPoint->BEVDepth4D distill recipe over the
    synthetic dataset (full train path: teacher build + inherit_head +
    distill step + ckpt + eval hook)."""
    from test_model_centerpoint import tiny_centerpoint_cfg
    from test_distill import distill_cfg
    import pprint

    t_cfg = tiny_centerpoint_cfg()
    s_cfg = distill_cfg()
    s_cfg["inherit_head"] = True
    pipeline = bevdepth_pipeline(is_train=True)
    # shrink image size to the student's data_config (64x64 2cams)
    data_cfg = dict(DATA_CONFIG)
    data_cfg["input_size"] = (64, 64)
    data_cfg["cams"] = data_cfg["cams"][:2]
    data_cfg["Ncams"] = 2
    pipeline[0]["data_config"] = data_cfg
    cfg_text = f"""
model = {pprint.pformat(s_cfg)}
teacher_model = {pprint.pformat(t_cfg)}
model['teacher_config'] = teacher_model
data = dict(
    samples_per_gpu=2, workers_per_gpu=1,
    train=dict(type="NuScenesDataset", ann_file={ann_file!r},
               pipeline={pprint.pformat(pipeline)},
               img_info_prototype="bevdet_sequential",
               speed_mode="abs_dis", max_interval=9, min_interval=0,
               test_mode=False, use_valid_flag=True),
)
optimizer = dict(type="AdamW", lr=2e-4, weight_decay=0.01)
optimizer_config = dict(grad_clip=dict(max_norm=5))
lr_config = dict(policy="step", step=[16, 22])
runner = dict(type="EpochBasedRunner", max_epochs=1)
log_config = dict(interval=1)
checkpoint_config = dict(max_keep_ckpts=1)
evaluation = dict(interval=0)
seed = 0
"""
    p = tmp_path / "mini_distill.py"
    p.write_text(cfg_text)
    return str(p)


@pytest.mark.slow
def test_train_model_e2e(tmp_path):
    root = str(tmp_path / "data")
    ann = make_mini_nuscenes(root, n_samples=4, img_hw=(90, 160))
    cfg_path = write_mini_distill_config(tmp_path, ann)
    cfg = Config.fromfile(cfg_path)
    work_dir = str(tmp_path / "work")

    from distillbev_tpu.apis.train import train_model
    state = train_model(cfg, work_dir, max_steps_per_epoch=2)
    assert int(state.step) == 2
    import jax
    leaves = jax.tree_util.tree_leaves(state.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # checkpoint written
    assert osp.isdir(osp.join(work_dir, "ckpt"))
    ckpts = os.listdir(osp.join(work_dir, "ckpt"))
    assert len(ckpts) >= 1
    # metrics written
    assert osp.exists(osp.join(work_dir, "tb", "metrics.jsonl"))


@pytest.mark.slow
def test_save_attention_dump(tmp_path):
    """--save_attention dumps the distill masks/attention maps per
    (student_pos, teacher_pos) pairing as .npz (reference
    tools/test.py:163 + bevdet_distill.py:1193-1249)."""
    root = str(tmp_path / "data")
    ann = make_mini_nuscenes(root, n_samples=4, img_hw=(90, 160))
    cfg_path = write_mini_distill_config(tmp_path, ann)
    cfg = Config.fromfile(cfg_path)

    from distillbev_tpu.apis.debug import save_attention_dump
    out = str(tmp_path / "attn")
    n = save_attention_dump(cfg, None, out, limit=1)
    assert n == 1
    files = sorted(os.listdir(out))
    assert files == ["attention_0000.npz"]
    data = np.load(osp.join(out, files[0]))
    pairs = {k.split("/")[0] for k in data.files}
    p = cfg.model["distill_params"]
    assert pairs == {f"{s}_{t}" for s, t in zip(
        p["student_feat_pos"], p["teacher_feat_pos"])}
    pair = next(iter(pairs))
    for name in ("fg_mask", "bg_mask", "spatial_attention",
                 "spatial_attention_teacher", "channel_attention_teacher",
                 "teacher_feat", "student_feat"):
        assert f"{pair}/{name}" in data.files, name
    fg = data[f"{pair}/fg_mask"]
    assert fg.ndim == 3 and np.isfinite(fg).all()
    # fg and bg are disjoint by construction
    bg = data[f"{pair}/bg_mask"]
    assert (fg * bg == 0).all()


@pytest.mark.slow
def test_self_ckpt_warm_start(tmp_path):
    """model.self_ckpt warm-starts the student from a previous distill
    run (reference bevdet_distill.py:163-173 load_checkpoint(self)): a
    marker value planted in the saved params must survive into the new
    run's trained state."""
    import jax
    import orbax.checkpoint as ocp

    root = str(tmp_path / "data")
    ann = make_mini_nuscenes(root, n_samples=4, img_hw=(90, 160))
    cfg_path = write_mini_distill_config(tmp_path, ann)
    cfg = Config.fromfile(cfg_path)

    from distillbev_tpu.apis.train import train_model
    state = train_model(cfg, str(tmp_path / "w1"), max_steps_per_epoch=1)

    # plant a marker in one conv kernel and save as a self checkpoint
    params = jax.tree_util.tree_map(np.asarray, state.params)
    path = []

    def plant(tree, prefix=()):
        for k, v in tree.items():
            if isinstance(v, dict):
                if plant(v, prefix + (k,)):
                    return True
            elif hasattr(v, "shape") and v.ndim >= 2 and not path:
                tree[k] = np.full_like(v, 7.0)
                path.extend(prefix + (k,))
                return True
        return False

    assert plant(params)
    ckpt_dir = str(tmp_path / "self_ckpt")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(ckpt_dir, dict(params=params,
                              batch_stats=jax.tree_util.tree_map(
                                  np.asarray, state.batch_stats)))
    ckptr.wait_until_finished()
    ckptr.close()

    cfg2 = Config.fromfile(cfg_path)
    cfg2.model["self_ckpt"] = ckpt_dir
    state2 = train_model(cfg2, str(tmp_path / "w2"),
                         max_steps_per_epoch=1)
    node = state2.params
    for k in path:
        node = node[k]
    # one optimizer step moved it slightly off the marker; a fresh init
    # would be near zero
    assert abs(float(np.asarray(node).mean()) - 7.0) < 0.5, path
