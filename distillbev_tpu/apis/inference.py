"""Single-sample inference helpers.

Capability parity with the reference inference API
(reference: mmdet3d/apis/inference.py — init_model builds a model from a
config + checkpoint; inference_detector runs one point cloud through the
test pipeline and returns boxes).
"""
from __future__ import annotations

import os.path as osp
from typing import Optional, Tuple

import numpy as np


def init_model(config, checkpoint: Optional[str] = None,
               device: Optional[str] = None):
    """Build (model, variables) from a config path/Config + checkpoint."""
    import jax
    from ..config import Config
    from ..models import build_detector

    if isinstance(config, str):
        config = Config.fromfile(config)
    model = build_detector(dict(config.model), config.get("train_cfg"),
                           config.get("test_cfg"))
    if checkpoint is not None:
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        variables = ckptr.restore(osp.abspath(checkpoint))
    else:
        # random init on a minimal sample
        pts = np.zeros((1, 1024, 5), np.float32)
        mask = np.ones((1, 1024), bool)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), pts, mask)
    return model, variables


def inference_detector(model, variables, points: np.ndarray,
                       max_points: int = 300_000):
    """Run one LiDAR point cloud -> DecodedBoxes (numpy)."""
    import jax
    import jax.numpy as jnp

    n = min(len(points), max_points)
    buf = np.zeros((1, max_points, points.shape[-1]), np.float32)
    buf[0, :n] = points[:n]
    mask = np.zeros((1, max_points), bool)
    mask[0, :n] = True

    @jax.jit
    def run(pts, msk):
        preds, _ = model.apply(variables, pts, msk)
        return model.apply(variables, preds, method=model.get_bboxes)

    dec = run(jnp.asarray(buf), jnp.asarray(mask))
    return jax.tree_util.tree_map(np.asarray, dec)
