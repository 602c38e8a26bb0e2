"""PAConv score-weighted feature assembly (``assign_score_withk``).

TPU-native equivalent of the reference CUDA extension
``assign_score_withk_ext`` (reference:
mmdet3d/ops/paconv/assign_score.py:1-80,
mmdet3d/ops/paconv/src/assign_score_withk_cuda.cu:48-80).  The CUDA
kernel is an atomic-add loop over (B, npoint, K, out_dim, M); here the
same contraction is one gather + one batched matmul over the M axis —
the MXU-friendly formulation — and autodiff supplies the backward pass
that the reference hand-writes.

Semantics (matching the kernel at assign_score_withk_cuda.cu:60-79)::

    out[b, o, n, k] = sum_m scores[b, n, k, m] *
        (points[b, idx[b,n,k], m, o] - centers[b, idx[b,n,0], m, o])

with out-of-range neighbor indices contributing zero.  Aggregation over
K ('sum' | 'avg' | 'max') mirrors the wrapper's modes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("aggregate",))
def assign_score_withk(scores: jnp.ndarray,
                       point_features: jnp.ndarray,
                       center_features: jnp.ndarray,
                       knn_idx: jnp.ndarray,
                       aggregate: str = "sum") -> jnp.ndarray:
    """Weighted assembly of kNN features with a score bank.

    Args:
        scores: [B, npoint, K, M] weights over the M weight matrices.
        point_features: [B, N, M, O] per-point transformed features.
        center_features: [B, N, M, O] per-center transformed features.
        knn_idx: [B, npoint, K] int neighbor ids; slot 0 is the center.
            Ids outside [0, N) contribute nothing (reference kernel's
            overflow `continue`).
        aggregate: 'sum' | 'avg' | 'max' over the K axis, plus the raw
            'none' per-neighbor output [B, O, npoint, K].  NOTE: the
            reference CUDA op (ops/paconv/) ignores its aggregate flag
            and always returns the per-neighbor [B, O, npoint, K]
            (PAConv max-pools over K later) — reference-parity call
            sites must pass aggregate='none' here.

    Returns:
        [B, O, npoint] aggregated features ([B, O, npoint, K] for 'none').
    """
    b, n, m, o = point_features.shape
    _, npoint, k, _ = scores.shape
    valid = (knn_idx >= 0) & (knn_idx < n)                 # [B, P, K]
    idx = jnp.clip(knn_idx, 0, n - 1)
    center_idx = jnp.broadcast_to(idx[:, :, :1], idx.shape)

    # gather [B, P, K, M, O] neighbor/center features
    barange = jnp.arange(b, dtype=jnp.int32)[:, None, None]
    gathered = point_features[barange, idx.astype(jnp.int32)]
    gathered_c = center_features[barange, center_idx.astype(jnp.int32)]
    diff = gathered - gathered_c
    diff = jnp.where(valid[..., None, None], diff, 0.0)

    # contract m: [B,P,K,1,M] @ [B,P,K,M,O] -> [B,P,K,O]
    out = jnp.einsum("bpkm,bpkmo->bpko", scores, diff,
                     preferred_element_type=jnp.float32)
    out = jnp.transpose(out, (0, 3, 1, 2))                 # [B, O, P, K]
    if aggregate == "none":
        return out
    if aggregate == "sum":
        return out.sum(axis=-1)
    if aggregate == "avg":
        return out.mean(axis=-1)
    if aggregate == "max":
        return out.max(axis=-1)
    raise ValueError(f"unknown aggregate {aggregate!r}")
