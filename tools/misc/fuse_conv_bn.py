#!/usr/bin/env python
"""Fold BatchNorm statistics into preceding convs for inference
(reference tools/misc/fuse_conv_bn.py — torch module surgery; here
param-tree surgery on the flax checkpoint).

For every module holding a conv kernel and a sibling norm
(``{*: {conv|kernel ...}, norm: {scale, bias}}`` with matching
batch_stats ``{norm: {mean, var}}``):

    w' = w * gamma / sqrt(var + eps)        (per output channel)

and the norm degenerates to a pure affine carrier (scale=1, mean=0,
var=1, bias = beta - gamma * mean / sqrt(var + eps)) so the param-tree
structure stays valid for bias-free convs — at inference the norm then
costs one add instead of a normalize.
"""
from __future__ import annotations

import argparse
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))

from distillbev_tpu.training.param_utils import flatten_tree, \
    unflatten_tree


def fuse_conv_bn(params: dict, batch_stats: dict, eps: float = 1e-5):
    """Returns (fused_params, fused_stats, n_fused)."""
    flat_p = dict(flatten_tree(params))
    flat_s = dict(flatten_tree(batch_stats))
    n_fused = 0
    # group norm paths by their parent module
    for path in list(flat_s):
        if path[-1] != "mean":
            continue
        parent = path[:-1]                       # (..., 'norm')
        module = parent[:-1]
        var_p = parent + ("var",)
        scale_p = parent + ("scale",)
        bias_p = parent + ("bias",)
        if var_p not in flat_s or scale_p not in flat_p:
            continue
        # find the sibling conv kernel inside the same module
        kernel_p = None
        for cand in (module + ("conv", "kernel"),
                     module + ("kernel",),
                     module + ("linear", "kernel")):
            if cand in flat_p:
                kernel_p = cand
                break
        if kernel_p is None:
            continue
        w = np.asarray(flat_p[kernel_p])
        gamma = np.asarray(flat_p[scale_p])
        beta = np.asarray(flat_p.get(bias_p, np.zeros_like(gamma)))
        mean = np.asarray(flat_s[path])
        var = np.asarray(flat_s[var_p])
        if w.shape[-1] != gamma.shape[0]:
            continue                              # norm not on conv out
        factor = gamma / np.sqrt(var + eps)
        flat_p[kernel_p] = w * factor.reshape(
            (1,) * (w.ndim - 1) + (-1,))
        conv_bias_p = kernel_p[:-1] + ("bias",)
        b0 = np.zeros_like(gamma)
        if conv_bias_p in flat_p:
            b0 = np.asarray(flat_p[conv_bias_p]) * factor
            flat_p[conv_bias_p] = b0
        # norm becomes a pure affine add (keeps the tree structure valid
        # for bias-free convs)
        flat_p[scale_p] = np.ones_like(gamma)
        if bias_p in flat_p:
            flat_p[bias_p] = beta - mean * factor
        flat_s[path] = np.zeros_like(mean)
        flat_s[var_p] = np.ones_like(var)
        n_fused += 1
    return unflatten_tree(flat_p), unflatten_tree(flat_s), n_fused


def main():
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint", help="orbax checkpoint dir")
    p.add_argument("--out", required=True)
    args = p.parse_args()
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(osp.abspath(args.checkpoint))
    params, stats, n = fuse_conv_bn(tree.get("params", {}),
                                    tree.get("batch_stats", {}))
    tree["params"], tree["batch_stats"] = params, stats
    ckptr.save(osp.abspath(args.out), tree, force=True)
    ckptr.wait_until_finished()
    print(f"fused {n} conv+bn pairs -> {args.out}")


if __name__ == "__main__":
    main()
