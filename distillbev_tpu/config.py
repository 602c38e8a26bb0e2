"""Python-file config system with ``_base_`` composition.

Capability-parity with the mmcv ``Config`` surface the reference relies on
(reference: tools/train.py:105-107, configs/*/*.py):

* configs are executable python files defining module-level variables;
* ``_base_ = ['../_base_/x.py', ...]`` merges parent configs (later wins);
* a dict containing ``_delete_: True`` replaces instead of merging;
* ``Config.fromfile(path)``, attribute access, ``merge_from_dict`` for
  CLI ``--cfg-options key.sub=val`` deep overrides;
* ``cfg.dump()`` / ``cfg.text`` for embedding into checkpoints.

Re-designed from scratch for this framework (no mmcv dependency).
"""
from __future__ import annotations

import ast
import copy
import os
import os.path as osp
import pprint
import types
from typing import Any, Dict, List, Optional, Union

DELETE_KEY = "_delete_"
BASE_KEY = "_base_"
RESERVED_KEYS = ("filename", "text")


class ConfigDict(dict):
    """Dict with attribute access; missing attribute raises AttributeError."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(
                f"'ConfigDict' object has no attribute '{name}'")

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        try:
            del self[name]
        except KeyError:
            raise AttributeError(name)

    def __deepcopy__(self, memo):
        out = ConfigDict()
        memo[id(self)] = out
        for k, v in self.items():
            out[copy.deepcopy(k, memo)] = copy.deepcopy(v, memo)
        return out

    @staticmethod
    def _wrap(obj: Any) -> Any:
        if isinstance(obj, dict) and not isinstance(obj, ConfigDict):
            return ConfigDict({k: ConfigDict._wrap(v) for k, v in obj.items()})
        if isinstance(obj, ConfigDict):
            return ConfigDict({k: ConfigDict._wrap(v) for k, v in obj.items()})
        if isinstance(obj, (list, tuple)):
            return type(obj)(ConfigDict._wrap(v) for v in obj)
        return obj


def _exec_pyfile(filename: str) -> Dict[str, Any]:
    filename = osp.abspath(osp.expanduser(filename))
    if not osp.isfile(filename):
        raise FileNotFoundError(f"config file not found: {filename}")
    with open(filename, "r") as f:
        code = f.read()
    # validate syntax early with a good error message
    ast.parse(code, filename=filename)
    mod = types.ModuleType("_cfg_" + osp.splitext(osp.basename(filename))[0])
    mod.__file__ = filename
    exec(compile(code, filename, "exec"), mod.__dict__)
    cfg = {
        k: v for k, v in mod.__dict__.items()
        if not k.startswith("__") and not isinstance(v, types.ModuleType)
        and not isinstance(v, types.FunctionType)
    }
    return cfg, code


def _merge_a_into_b(a: Dict[str, Any], b: Dict[str, Any]) -> Dict[str, Any]:
    """Merge override dict ``a`` into base dict ``b`` (a wins)."""
    b = copy.deepcopy(b)
    for k, v in a.items():
        if isinstance(v, dict) and k in b and not v.pop(DELETE_KEY, False):
            if not isinstance(b[k], dict):
                raise TypeError(
                    f"cannot merge dict into non-dict for key '{k}': "
                    f"base has {type(b[k]).__name__}; add "
                    f"'{DELETE_KEY}: True' to replace it")
            b[k] = _merge_a_into_b(v, b[k])
        else:
            b[k] = copy.deepcopy(v)
    return b


class Config:
    """Config object wrapping a ConfigDict, with ``_base_`` resolution."""

    def __init__(self,
                 cfg_dict: Optional[Dict[str, Any]] = None,
                 cfg_text: str = "",
                 filename: str = ""):
        if cfg_dict is None:
            cfg_dict = {}
        for key in cfg_dict:
            if key in RESERVED_KEYS:
                raise KeyError(f"{key} is reserved for Config")
        object.__setattr__(self, "_cfg_dict", ConfigDict._wrap(cfg_dict))
        object.__setattr__(self, "_text", cfg_text)
        object.__setattr__(self, "_filename", filename)

    # -- loading ---------------------------------------------------------
    @staticmethod
    def fromfile(filename: Union[str, os.PathLike]) -> "Config":
        filename = str(filename)
        cfg_dict, cfg_text = Config._file2dict(filename)
        return Config(cfg_dict, cfg_text=cfg_text, filename=filename)

    @staticmethod
    def _file2dict(filename: str):
        cfg_dict, code = _exec_pyfile(filename)
        texts = [f"# ---- {filename} ----\n{code}"]
        base = cfg_dict.pop(BASE_KEY, None)
        if base is not None:
            if isinstance(base, str):
                base = [base]
            base_dict: Dict[str, Any] = {}
            cfg_dir = osp.dirname(osp.abspath(osp.expanduser(filename)))
            for b in base:
                b_dict, b_text = Config._file2dict(osp.join(cfg_dir, b))
                dup = set(base_dict) & set(b_dict)
                if dup:
                    raise KeyError(
                        f"duplicate keys {sorted(dup)} in multiple _base_ "
                        f"files of {filename}")
                base_dict.update(b_dict)
                texts.insert(0, b_text)
            cfg_dict = _merge_a_into_b(cfg_dict, base_dict)
        return cfg_dict, "\n".join(texts)

    @staticmethod
    def fromstring(cfg_str: str, filename: str = "<string>") -> "Config":
        mod: Dict[str, Any] = {}
        exec(compile(cfg_str, filename, "exec"), mod)
        cfg = {k: v for k, v in mod.items()
               if not k.startswith("__")
               and not isinstance(v, types.ModuleType)}
        return Config(cfg, cfg_text=cfg_str, filename=filename)

    # -- dict-ish interface ----------------------------------------------
    @property
    def filename(self) -> str:
        return self._filename

    @property
    def text(self) -> str:
        return self._text

    def __getattr__(self, name: str) -> Any:
        return getattr(self._cfg_dict, name)

    def __setattr__(self, name: str, value: Any) -> None:
        self._cfg_dict[name] = ConfigDict._wrap(value)

    def __getitem__(self, name: str) -> Any:
        return self._cfg_dict[name]

    def __setitem__(self, name: str, value: Any) -> None:
        self._cfg_dict[name] = ConfigDict._wrap(value)

    def __contains__(self, name: str) -> bool:
        return name in self._cfg_dict

    def __iter__(self):
        return iter(self._cfg_dict)

    def __len__(self) -> int:
        return len(self._cfg_dict)

    def __repr__(self) -> str:
        return f"Config (path: {self._filename}): {self._cfg_dict!r}"

    def get(self, key: str, default: Any = None) -> Any:
        return self._cfg_dict.get(key, default)

    def setdefault(self, key: str, default: Any = None) -> Any:
        return self._cfg_dict.setdefault(key, ConfigDict._wrap(default))

    def keys(self):
        return self._cfg_dict.keys()

    def items(self):
        return self._cfg_dict.items()

    def values(self):
        return self._cfg_dict.values()

    def copy(self) -> "Config":
        return Config(copy.deepcopy(dict(self._cfg_dict)),
                      cfg_text=self._text, filename=self._filename)

    def to_dict(self) -> Dict[str, Any]:
        return copy.deepcopy(dict(self._cfg_dict))

    # -- CLI override ----------------------------------------------------
    def merge_from_dict(self,
                        options: Dict[str, Any],
                        allow_list_keys: bool = True) -> None:
        """Deep-merge ``{'a.b.c': v}`` style options (CLI --cfg-options).

        With ``allow_list_keys``, integer path segments index into lists.
        """
        option_cfg: Dict[str, Any] = {}
        for full_key, v in options.items():
            d = option_cfg
            parts = full_key.split(".")
            for key in parts[:-1]:
                d = d.setdefault(key, {})
            d[parts[-1]] = v
        merged = Config._merge_opts(option_cfg, dict(self._cfg_dict),
                                    allow_list_keys)
        object.__setattr__(self, "_cfg_dict", ConfigDict._wrap(merged))

    @staticmethod
    def _merge_opts(a: Dict, b: Any, allow_list_keys: bool):
        if allow_list_keys and isinstance(b, (list, tuple)):
            b = list(b)
            for k, v in a.items():
                idx = int(k)
                if idx >= len(b):
                    raise KeyError(
                        f"index {idx} out of range for list of len {len(b)}")
                b[idx] = (Config._merge_opts(v, b[idx], allow_list_keys)
                          if isinstance(v, dict) else v)
            return b
        if not isinstance(b, dict):
            return copy.deepcopy(a)
        b = dict(b)
        for k, v in a.items():
            if isinstance(v, dict) and k in b and not v.pop(DELETE_KEY, False):
                b[k] = Config._merge_opts(v, b[k], allow_list_keys)
            else:
                b[k] = copy.deepcopy(v)
        return b

    def dump(self, file: Optional[str] = None) -> Optional[str]:
        """Serialize as a runnable python config text."""
        lines = []
        for k, v in self._cfg_dict.items():
            lines.append(f"{k} = {pprint.pformat(_plain(v), width=88)}")
        text = "\n".join(lines) + "\n"
        if file is None:
            return text
        with open(file, "w") as f:
            f.write(text)
        return None


def _plain(obj: Any) -> Any:
    if isinstance(obj, dict):
        return {k: _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_plain(v) for v in obj)
    return obj


class DictAction:
    """Parse ``KEY=VALUE`` CLI pairs with python-literal value coercion.

    Usage with argparse:
        parser.add_argument('--cfg-options', nargs='+', action=DictAction.argparse())
    or call ``DictAction.parse(['a.b=1', 'c=[1,2]'])`` directly.
    """

    @staticmethod
    def parse_value(val: str) -> Any:
        try:
            return ast.literal_eval(val)
        except (ValueError, SyntaxError):
            pass
        low = val.lower()
        if low in ("true", "false"):
            return low == "true"
        if low in ("none", "null"):
            return None
        if "," in val:  # bare comma list: a,b,c
            items = [DictAction.parse_value(v) for v in val.split(",") if v]
            return tuple(items)
        return val

    @staticmethod
    def parse(pairs: List[str]) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for pair in pairs:
            if "=" not in pair:
                raise ValueError(f"expected KEY=VALUE, got {pair!r}")
            key, val = pair.split("=", 1)
            out[key] = DictAction.parse_value(val)
        return out

    @staticmethod
    def argparse():
        import argparse

        class _Action(argparse.Action):
            def __call__(self, parser, namespace, values, option_string=None):
                opts = getattr(namespace, self.dest, None) or {}
                opts.update(DictAction.parse(list(values)))
                setattr(namespace, self.dest, opts)

        return _Action
