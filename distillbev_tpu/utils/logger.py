"""Root logger (reference: mmdet3d/utils/logger.py get_root_logger)."""
from __future__ import annotations

import logging
import os.path as osp
from typing import Optional

_initialized = False


def get_root_logger(log_file: Optional[str] = None,
                    log_level: int = logging.INFO) -> logging.Logger:
    global _initialized
    logger = logging.getLogger("distillbev_tpu")
    if _initialized:
        return logger
    logger.setLevel(log_level)
    fmt = logging.Formatter(
        "%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file:
        import os
        os.makedirs(osp.dirname(log_file) or ".", exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    _initialized = True
    return logger


def collect_env() -> dict:
    """Environment info (reference: utils/collect_env.py)."""
    import platform
    import sys
    info = dict(python=sys.version, platform=platform.platform())
    try:
        import jax
        info["jax"] = jax.__version__
        info["devices"] = str(jax.devices())
    except Exception:
        pass
    try:
        import flax
        info["flax"] = flax.__version__
    except Exception:
        pass
    return info
