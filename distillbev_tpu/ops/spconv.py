"""Sparse 3D convolution — TPU-native gather-GEMM-accumulate.

Capability parity with the reference's spconv CUDA library
(reference: mmdet3d/ops/spconv/conv.py:1-465, ops.py:1-183,
src/indice_cuda.cu + reordering*.cu — hash-map rulebook build and
gather-GEMM-scatter), which powers the ``SparseEncoder`` middle encoder of
the LidarFormer/MVPFormer teachers (middle_encoders/sparse_encoder.py:110).

TPU-native design (not a port):
* static shapes: active sites live in fixed-capacity arrays
  (``feats [N, C]``, ``coords [N, 4]``, ``valid [N]``); overflow drops
  deterministically in sorted-key order;
* the CUDA hash-map rulebook becomes sort + ``searchsorted`` binary
  search: for each (output site, kernel offset) the input neighbor index
  is looked up in the sorted flat-key table — O(K·N log N) fully
  vectorized int ops;
* gather-GEMM-accumulate: for each kernel offset k, gather the matched
  input rows and multiply by ``W[k] (Cin x Cout)`` — K dense matmuls on
  the MXU, accumulated in fp32.  Misses gather a zero row (index N
  sentinel into a zero-padded table) instead of branching;
* autodiff: gathers and matmuls are natively differentiable (the
  transpose of the gather is XLA scatter-add); teachers run under
  ``stop_gradient`` in the distillation path so the backward is off the
  hot path entirely.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .segmented import segment_starts, segment_ids_from_starts, sort_by_key


class SparseTensor(NamedTuple):
    """Fixed-capacity COO sparse 4D tensor (batch, z, y, x)."""
    feats: jnp.ndarray        # [N, C] float
    coords: jnp.ndarray       # [N, 4] int32 (b, z, y, x); padding rows = -1
    valid: jnp.ndarray        # [N] bool
    spatial_shape: Tuple[int, int, int]   # static (Z, Y, X)
    batch_size: int           # static


def _flat_key(coords: jnp.ndarray, valid: jnp.ndarray,
              spatial_shape: Tuple[int, int, int]) -> jnp.ndarray:
    """(b,z,y,x) -> flat int32 key; invalid -> INT32_MAX."""
    zz, yy, xx = spatial_shape
    key = ((coords[:, 0] * zz + coords[:, 1]) * yy + coords[:, 2]) * xx \
        + coords[:, 3]
    return jnp.where(valid, key, jnp.iinfo(jnp.int32).max)


def _kernel_offsets(kernel_size: Tuple[int, int, int]) -> np.ndarray:
    """All (dz, dy, dx) offsets of a kernel, C-order. [K, 3] numpy."""
    kz, ky, kx = kernel_size
    g = np.stack(np.meshgrid(np.arange(kz), np.arange(ky), np.arange(kx),
                             indexing="ij"), -1).reshape(-1, 3)
    return g.astype(np.int32)


def _lookup(sorted_keys: jnp.ndarray, sorted_pos: jnp.ndarray,
            query: jnp.ndarray, n: int) -> jnp.ndarray:
    """Binary-search each query key; return original row index or n (miss).

    sorted_keys: [N] ascending (padding = INT_MAX).
    sorted_pos: [N] original index of each sorted key.
    """
    # method="sort" (concat + one XLA sort) beats the default binary
    # scan 5.6x at rulebook shapes on TPU: the scan lowers to log2(N)
    # dependent gather passes over the whole query array (~280 ms at
    # [120k table, 2.4M queries] vs ~50 ms — round-4 microbench);
    # ~870 -> ~150 ms of the LidarFormer teacher forward
    loc = jnp.searchsorted(sorted_keys, query, method="sort")
    loc = jnp.clip(loc, 0, n - 1)
    hit = (sorted_keys[loc] == query) & (query != jnp.iinfo(jnp.int32).max)
    return jnp.where(hit, sorted_pos[loc], n)


@partial(jax.jit, static_argnames=("spatial_shape", "kernel_size"))
def build_subm_rulebook(coords: jnp.ndarray,
                        valid: jnp.ndarray,
                        spatial_shape: Tuple[int, int, int],
                        kernel_size: Tuple[int, int, int]) -> jnp.ndarray:
    """Neighbor table for submanifold conv: [N, K] input row per (site, k);
    misses = N.  Output sites == input sites (SubMConv3d semantics,
    reference conv.py SubMConv3d)."""
    n = coords.shape[0]
    offs = _kernel_offsets(kernel_size)
    center = (np.asarray(kernel_size, np.int32) - 1) // 2
    rel = jnp.asarray(offs - center[None])                      # [K, 3]
    keys = _flat_key(coords, valid, spatial_shape)
    sorted_keys, sorted_pos = jax.lax.sort_key_val(
        keys, jnp.arange(n, dtype=jnp.int32))

    zz, yy, xx = spatial_shape
    nb = coords[:, None, 1:4] + rel[None, :, :]                 # [N, K, 3]
    in_bounds = ((nb[..., 0] >= 0) & (nb[..., 0] < zz) &
                 (nb[..., 1] >= 0) & (nb[..., 1] < yy) &
                 (nb[..., 2] >= 0) & (nb[..., 2] < xx) & valid[:, None])
    b = coords[:, None, 0]
    q = ((b * zz + nb[..., 0]) * yy + nb[..., 1]) * xx + nb[..., 2]
    q = jnp.where(in_bounds, q, jnp.iinfo(jnp.int32).max)
    return _lookup(sorted_keys, sorted_pos, q.reshape(-1), n).reshape(
        n, -1)


class SparseConvPlan(NamedTuple):
    out_coords: jnp.ndarray   # [M, 4]
    out_valid: jnp.ndarray    # [M]
    gather_idx: jnp.ndarray   # [M, K] input row per (out site, k); miss = N
    out_spatial_shape: Tuple[int, int, int]


@partial(jax.jit, static_argnames=("spatial_shape", "kernel_size", "stride",
                                   "padding", "max_out"))
def build_sparse_conv_plan(coords: jnp.ndarray,
                           valid: jnp.ndarray,
                           spatial_shape: Tuple[int, int, int],
                           kernel_size: Tuple[int, int, int],
                           stride: Tuple[int, int, int],
                           padding: Tuple[int, int, int],
                           max_out: int) -> SparseConvPlan:
    """Output sites + gather table for a strided sparse conv.

    Output site exists wherever >= 1 input falls in its receptive field
    (regular sparse conv semantics, reference ops.py get_indice_pairs).
    out = (in + pad - k) / stride for each kernel offset k where the
    division is exact and in range; dedup via sort+unique with a static
    ``max_out`` budget.
    """
    n = coords.shape[0]
    offs = jnp.asarray(_kernel_offsets(kernel_size))            # [K, 3]
    k = offs.shape[0]
    st = jnp.asarray(stride, jnp.int32)
    pd = jnp.asarray(padding, jnp.int32)
    ssz = np.asarray(spatial_shape, np.int64)
    out_sp = tuple(int((ssz[i] + 2 * padding[i] - kernel_size[i])
                       // stride[i] + 1) for i in range(3))
    oz, oy, ox = out_sp

    # candidate output coords per (input, kernel offset)
    num = coords[:, None, 1:4] + pd[None, None] - offs[None]     # [N, K, 3]
    oc = num // st[None, None]
    exact = (oc * st[None, None] == num)
    okc = (exact.all(-1) &
           (oc[..., 0] >= 0) & (oc[..., 0] < oz) &
           (oc[..., 1] >= 0) & (oc[..., 1] < oy) &
           (oc[..., 2] >= 0) & (oc[..., 2] < ox) & valid[:, None])
    b = jnp.broadcast_to(coords[:, None, 0], (n, k))
    cand_key = (((b * oz + oc[..., 0]) * oy + oc[..., 1]) * ox
                + oc[..., 2])
    cand_key = jnp.where(okc, cand_key, jnp.iinfo(jnp.int32).max)

    flat_key = cand_key.reshape(-1)
    sorted_ck, _ = jax.lax.sort_key_val(
        flat_key, jnp.zeros_like(flat_key))
    starts = segment_starts(sorted_ck) & \
        (sorted_ck != jnp.iinfo(jnp.int32).max)
    uid = segment_ids_from_starts(
        starts | (sorted_ck == jnp.iinfo(jnp.int32).max))
    keep = starts & (uid < max_out)
    dst = jnp.where(keep, uid, max_out)
    uniq_keys = jnp.full((max_out + 1,), jnp.iinfo(jnp.int32).max,
                         jnp.int32).at[dst].set(sorted_ck, mode="drop")
    uniq_keys = uniq_keys[:max_out]
    out_valid = uniq_keys != jnp.iinfo(jnp.int32).max

    # decode keys back to coords
    kk = jnp.where(out_valid, uniq_keys, 0)
    ocx = kk % ox
    kk = kk // ox
    ocy = kk % oy
    kk = kk // oy
    ocz = kk % oz
    ob = kk // oz
    out_coords = jnp.stack([ob, ocz, ocy, ocx], -1)
    out_coords = jnp.where(out_valid[:, None], out_coords, -1)

    # rulebook: input at in = out*stride - pad + k
    keys_in = _flat_key(coords, valid, spatial_shape)
    sorted_keys, sorted_pos = jax.lax.sort_key_val(
        keys_in, jnp.arange(n, dtype=jnp.int32))
    zz2, yy2, xx2 = spatial_shape
    ic = (out_coords[:, None, 1:4] * st[None, None] - pd[None, None]
          + offs[None])                                          # [M, K, 3]
    ib = ((ic[..., 0] >= 0) & (ic[..., 0] < zz2) &
          (ic[..., 1] >= 0) & (ic[..., 1] < yy2) &
          (ic[..., 2] >= 0) & (ic[..., 2] < xx2) & out_valid[:, None])
    qb = out_coords[:, None, 0]
    q = ((qb * zz2 + ic[..., 0]) * yy2 + ic[..., 1]) * xx2 + ic[..., 2]
    q = jnp.where(ib, q, jnp.iinfo(jnp.int32).max)
    gather_idx = _lookup(sorted_keys, sorted_pos, q.reshape(-1), n) \
        .reshape(max_out, k)
    return SparseConvPlan(out_coords, out_valid, gather_idx, out_sp)


def conv_out_shape(spatial_shape, kernel_size, stride, padding):
    """Static output spatial shape of a strided sparse conv."""
    return tuple(
        (spatial_shape[i] + 2 * padding[i] - kernel_size[i])
        // stride[i] + 1 for i in range(3))


def gather_gemm(feats: jnp.ndarray,
                gather_idx: jnp.ndarray,
                weights: jnp.ndarray,
                out_valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Apply Σ_k W[k] · x[gather_idx[:, k]] with zero rows for misses.

    Args:
        feats: [N, Cin]; a zero row is appended internally for the miss
            sentinel index N.
        gather_idx: [M, K] int32.
        weights: [K, Cin, Cout].
        out_valid: optional [M] mask zeroing padded output rows.

    Returns [M, Cout] fp32.
    """
    n, cin = feats.shape
    m, k = gather_idx.shape
    table = jnp.concatenate(
        [feats, jnp.zeros((1, cin), feats.dtype)], axis=0)
    # k-major 2-D-index take: each of the K slices is a contiguous
    # [M, Cin] gather (index varies along the major dim, channels stay
    # whole in lanes).  Measured on v5e vs the flat [M*K] gather at all
    # four teacher stages: 14.9->7.5, 7.7->4.4, 6.2->4.4, 3.3->2.6 ms
    # (C=16/32/64/128) — the flat form also materializes [R, 1] index
    # operands in T(1,128) layout (same pathology as ms_deform_attn r5).
    gathered = table[gather_idx.T]                  # [K, M, Cin]
    out = jnp.einsum("kmc,kcd->md", gathered, weights,
                     preferred_element_type=jnp.float32)
    if out_valid is not None:
        out = jnp.where(out_valid[:, None], out, 0.0)
    return out


def subm_conv(sp: SparseTensor, weights: jnp.ndarray,
              kernel_size: Tuple[int, int, int]) -> SparseTensor:
    """Submanifold sparse conv: same sites, new features."""
    nb = build_subm_rulebook(sp.coords, sp.valid, sp.spatial_shape,
                             kernel_size)
    out = gather_gemm(sp.feats, nb, weights, sp.valid)
    return SparseTensor(out, sp.coords, sp.valid, sp.spatial_shape,
                        sp.batch_size)


def sparse_conv(sp: SparseTensor, weights: jnp.ndarray,
                kernel_size: Tuple[int, int, int],
                stride: Tuple[int, int, int],
                padding: Tuple[int, int, int],
                max_out: int) -> SparseTensor:
    """Strided sparse conv producing a new (downsampled) site set."""
    plan = build_sparse_conv_plan(sp.coords, sp.valid, sp.spatial_shape,
                                  kernel_size, stride, padding, max_out)
    out = gather_gemm(sp.feats, plan.gather_idx, weights, plan.out_valid)
    # recompute statically: the jitted plan's shape entry is traced
    out_sp = conv_out_shape(sp.spatial_shape, kernel_size, stride,
                            padding)
    return SparseTensor(out, plan.out_coords, plan.out_valid, out_sp,
                        sp.batch_size)


def sparse_to_dense(sp: SparseTensor) -> jnp.ndarray:
    """Densify to [B, Z, Y, X, C] (channels-last; the reference's
    SparseConvTensor.dense() emits NCDHW)."""
    zz, yy, xx = sp.spatial_shape
    c = sp.feats.shape[-1]
    b = sp.batch_size
    flat = _flat_key(sp.coords, sp.valid, sp.spatial_shape)
    flat = jnp.where(sp.valid, flat, b * zz * yy * xx)
    dense = jnp.zeros((b * zz * yy * xx + 1, c), sp.feats.dtype)
    dense = dense.at[flat].set(sp.feats, mode="drop")
    return dense[:-1].reshape(b, zz, yy, xx, c)


@partial(jax.jit, static_argnames=("down_spatial_shape", "kernel_size",
                                   "stride", "padding"))
def build_inverse_conv_plan(up_coords: jnp.ndarray,
                            up_valid: jnp.ndarray,
                            down_coords: jnp.ndarray,
                            down_valid: jnp.ndarray,
                            down_spatial_shape: Tuple[int, int, int],
                            kernel_size: Tuple[int, int, int],
                            stride: Tuple[int, int, int],
                            padding: Tuple[int, int, int]) -> jnp.ndarray:
    """Gather table for SparseInverseConv3d: restore a finer site set
    from its strided-conv downsampling (reference: ops/spconv/conv.py
    SparseInverseConv3d via stored indice pairs).

    For each fine (up) site and kernel offset k, the contributing coarse
    site is (up + pad - k) / stride when exact.  Returns [N_up, K] rows
    into the coarse array; miss = N_down.
    """
    n_down = down_coords.shape[0]
    offs = jnp.asarray(_kernel_offsets(kernel_size))
    st = jnp.asarray(stride, jnp.int32)
    pd = jnp.asarray(padding, jnp.int32)
    dz, dy, dx = down_spatial_shape
    keys_down = _flat_key(down_coords, down_valid, down_spatial_shape)
    sorted_keys, sorted_pos = jax.lax.sort_key_val(
        keys_down, jnp.arange(n_down, dtype=jnp.int32))
    num = up_coords[:, None, 1:4] + pd[None, None] - offs[None]
    dc = num // st[None, None]
    exact = (dc * st[None, None] == num)
    ok = (exact.all(-1) &
          (dc[..., 0] >= 0) & (dc[..., 0] < dz) &
          (dc[..., 1] >= 0) & (dc[..., 1] < dy) &
          (dc[..., 2] >= 0) & (dc[..., 2] < dx) & up_valid[:, None])
    b = up_coords[:, None, 0]
    q = ((b * dz + dc[..., 0]) * dy + dc[..., 1]) * dx + dc[..., 2]
    q = jnp.where(ok, q, jnp.iinfo(jnp.int32).max)
    return _lookup(sorted_keys, sorted_pos, q.reshape(-1),
                   n_down).reshape(up_coords.shape[0], -1)
