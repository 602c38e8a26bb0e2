#!/usr/bin/env python
"""FLOPs / parameter counting (reference: tools/analysis_tools/
get_flops.py — mmcv get_model_complexity_info).

TPU-native: XLA's own cost analysis on the compiled forward — exact for
the actual executed graph, rather than per-module estimation.
"""
from __future__ import annotations

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--flagship", action="store_true", default=True)
    a = p.parse_args()

    import jax
    import numpy as np
    from distillbev_tpu.apis.flagship import build_flagship

    jax.config.update("jax_platforms", "cpu")
    student, teacher, svars, tvars, batch = build_flagship(
        batch_size=1, tiny=False)

    def fwd(variables, img_inputs):
        preds, bundle, depth = student.apply(variables, img_inputs)
        return preds[0]["heatmap"]

    lowered = jax.jit(fwd).lower(svars, batch.img_inputs)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    n_params = sum(np.prod(np.shape(x))
                   for x in jax.tree_util.tree_leaves(svars["params"]))
    flops = cost.get("flops", float("nan"))
    print(f"params: {n_params / 1e6:.2f} M")
    print(f"forward flops (XLA cost analysis): {flops / 1e9:.2f} GFLOPs")
    for k in ("bytes accessed", "transcendentals"):
        if k in cost:
            print(f"{k}: {cost[k]:.3e}")


if __name__ == "__main__":
    main()
