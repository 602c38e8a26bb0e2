#!/usr/bin/env python
"""Publish a checkpoint: strip optimizer state, add content hash
(reference: tools/misc/publish_model.py semantics for orbax trees)."""
from __future__ import annotations

import argparse
import hashlib
import os.path as osp
import shutil
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("in_ckpt", help="orbax checkpoint dir (train state)")
    p.add_argument("out_ckpt", help="output dir prefix")
    a = p.parse_args()

    import jax
    import orbax.checkpoint as ocp
    jax.config.update("jax_platforms", "cpu")

    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(osp.abspath(a.in_ckpt))
    # keep only inference-relevant collections
    published = {k: v for k, v in state.items()
                 if k in ("params", "batch_stats")} if isinstance(
        state, dict) else {"params": getattr(state, "params"),
                           "batch_stats": getattr(state, "batch_stats")}
    tmp_out = osp.abspath(a.out_ckpt) + "_tmp"
    ckptr.save(tmp_out, published, force=True)
    ckptr.wait_until_finished()

    # content hash over the serialized tree
    h = hashlib.sha256()
    import numpy as np
    for leaf in jax.tree_util.tree_leaves(published):
        h.update(np.asarray(leaf).tobytes())
    digest = h.hexdigest()[:8]
    final = f"{osp.abspath(a.out_ckpt)}-{digest}"
    shutil.move(tmp_out, final)
    print(f"published {final}")


if __name__ == "__main__":
    main()
