"""Tests for the config system and registry (foundations)."""
import os.path as osp

import pytest

from distillbev_tpu.config import Config, ConfigDict, DictAction
from distillbev_tpu.registry import Registry, build_from_cfg


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


class TestConfig:

    def test_fromfile_basic(self, tmp_path):
        f = _write(tmp_path, "a.py", "x = 1\nmodel = dict(type='M', depth=50)\n")
        cfg = Config.fromfile(f)
        assert cfg.x == 1
        assert cfg.model.type == "M"
        assert cfg.model["depth"] == 50
        assert cfg.filename == f

    def test_base_inheritance(self, tmp_path):
        _write(tmp_path, "base.py",
               "model = dict(type='M', depth=50, neck=dict(type='N', c=64))\n"
               "lr = 0.1\n")
        f = _write(tmp_path, "child.py",
                   "_base_ = ['base.py']\n"
                   "model = dict(depth=101)\n")
        cfg = Config.fromfile(f)
        assert cfg.model.type == "M"          # inherited
        assert cfg.model.depth == 101          # overridden
        assert cfg.model.neck.c == 64          # deep-inherited
        assert cfg.lr == 0.1

    def test_delete_semantics(self, tmp_path):
        _write(tmp_path, "base.py",
               "model = dict(type='M', depth=50, extra=dict(a=1))\n")
        f = _write(tmp_path, "child.py",
                   "_base_ = ['base.py']\n"
                   "model = dict(_delete_=True, type='Q', width=7)\n")
        cfg = Config.fromfile(f)
        assert cfg.model.type == "Q"
        assert "depth" not in cfg.model
        assert "extra" not in cfg.model

    def test_multi_base_duplicate_raises(self, tmp_path):
        _write(tmp_path, "b1.py", "x = 1\n")
        _write(tmp_path, "b2.py", "x = 2\n")
        f = _write(tmp_path, "c.py", "_base_ = ['b1.py', 'b2.py']\n")
        with pytest.raises(KeyError):
            Config.fromfile(f)

    def test_merge_from_dict(self, tmp_path):
        f = _write(tmp_path, "a.py",
                   "model = dict(head=dict(num=10))\n"
                   "data = dict(samples_per_gpu=4)\n"
                   "steps = [dict(lr=1), dict(lr=2)]\n")
        cfg = Config.fromfile(f)
        cfg.merge_from_dict({"model.head.num": 3, "data.samples_per_gpu": 8,
                             "steps.1.lr": 5})
        assert cfg.model.head.num == 3
        assert cfg.data.samples_per_gpu == 8
        assert cfg.steps[1]["lr"] == 5

    def test_dict_action_parsing(self):
        opts = DictAction.parse(
            ["a.b=3", "c=[1,2]", "d=true", "e=none", "f=1.5,2.5", "g=text"])
        assert opts["a.b"] == 3
        assert opts["c"] == [1, 2]
        assert opts["d"] is True
        assert opts["e"] is None
        assert opts["f"] == (1.5, 2.5)
        assert opts["g"] == "text"

    def test_dump_roundtrip(self, tmp_path):
        f = _write(tmp_path, "a.py", "model = dict(type='M', lr=0.1)\n")
        cfg = Config.fromfile(f)
        text = cfg.dump()
        cfg2 = Config.fromstring(text)
        assert cfg2.model.type == "M" and cfg2.model.lr == 0.1

    def test_text_contains_base(self, tmp_path):
        _write(tmp_path, "base.py", "x = 1\n")
        f = _write(tmp_path, "c.py", "_base_ = ['base.py']\ny = 2\n")
        cfg = Config.fromfile(f)
        assert "x = 1" in cfg.text and "y = 2" in cfg.text

    def test_configdict_attr_access(self):
        d = ConfigDict._wrap({"a": {"b": [1, {"c": 2}]}})
        assert d.a.b[1].c == 2
        with pytest.raises(AttributeError):
            _ = d.missing


class TestRegistry:

    def test_register_and_build(self):
        R = Registry("things")

        @R.register_module()
        class Foo:
            def __init__(self, a, b=2):
                self.a, self.b = a, b

        obj = build_from_cfg(dict(type="Foo", a=1), R)
        assert (obj.a, obj.b) == (1, 2)
        obj = R.build(dict(type="Foo", a=1, b=9))
        assert obj.b == 9

    def test_duplicate_raises(self):
        R = Registry("r")

        @R.register_module()
        class A:
            pass

        with pytest.raises(KeyError):
            R.register_module(module=A)
        R.register_module(force=True, module=A)  # force OK

    def test_default_args_and_class_type(self):
        R = Registry("r")

        class B:
            def __init__(self, x, y):
                self.x, self.y = x, y

        obj = build_from_cfg(dict(type=B, x=1), R, dict(y=7))
        assert (obj.x, obj.y) == (1, 7)

    def test_unknown_type_message(self):
        R = Registry("widgets")
        with pytest.raises(KeyError, match="widgets"):
            build_from_cfg(dict(type="Nope"), R)

    def test_parent_lookup(self):
        parent = Registry("models")
        child = Registry("detectors", parent=parent)

        @parent.register_module()
        class P:
            pass

        assert child.get("P") is P
        assert "P" in child


def test_fuse_conv_bn_numeric():
    """Folded conv+BN must reproduce inference outputs exactly."""
    import sys, os.path as osp
    sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))
    import numpy as np
    import jax
    import jax.numpy as jnp
    from distillbev_tpu.models.layers import ConvModule
    from tools.misc.fuse_conv_bn import fuse_conv_bn

    rng = np.random.RandomState(0)
    m = ConvModule(8, 3, padding=1, norm_cfg=dict(type="BN"),
                   act_cfg=None)
    x = jnp.asarray(rng.randn(2, 6, 6, 4).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    # non-trivial running stats
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.rand(*a.shape).astype(np.float32)
                              + 0.5), v["batch_stats"])
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.randn(*a.shape).astype(np.float32)),
        v["params"])
    ref = m.apply({"params": params, "batch_stats": stats}, x)

    fp, fs, n = fuse_conv_bn(jax.tree_util.tree_map(np.asarray, params),
                             jax.tree_util.tree_map(np.asarray, stats))
    assert n == 1
    out = m.apply({"params": jax.tree_util.tree_map(jnp.asarray, fp),
                   "batch_stats": jax.tree_util.tree_map(jnp.asarray,
                                                         fs)}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
