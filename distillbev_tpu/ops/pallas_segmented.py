"""Pallas TPU kernel: single-pass segmented inclusive scan.

The XLA path (ops/segmented.py) lowers the segmented cumsum as a
log-depth ``associative_scan`` — O(log N) full passes over the [N, C]
stream in HBM.  This kernel streams the data ONCE: a sequential 1-D grid
over row tiles keeps the running (key, accumulated row) carry in VMEM
scratch between grid steps (TPU grid execution is sequential), performs
the within-tile scan on VMEM-resident data, and stitches tiles together
through the carry.  HBM traffic drops from ~2·log(N)·N·C to 2·N·C —
the op is bandwidth-bound, so this is the speed-of-light formulation.

Used under bev_pool (the LSS splat), dynamic scatter and the spconv
rulebook reductions via ``segmented.use_pallas``.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _seg_scan_kernel(keys_ref, vals_ref, out_ref, carry_key, carry_val):
    """One tile: [T, 1] keys + [T, C] vals -> [T, C] inclusive segmented
    cumsum, with cross-tile carry in SMEM/VMEM scratch."""
    i = pl.program_id(0)
    keys = keys_ref[:]                     # [T, 1] int32
    vals = vals_ref[:].astype(jnp.float32)  # [T, C]
    t = keys.shape[0]

    @pl.when(i == 0)
    def _():
        carry_key[0] = keys[0, 0] - 1      # sentinel: no carry match
        carry_val[:] = jnp.zeros_like(carry_val)

    # Within-tile segmented inclusive scan as ONE MXU matmul:
    # scanned[i] = sum_{j<=i, key_j == key_i} vals[j]
    # (keys ascending -> same-key pairs are exactly same-segment pairs).
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    eq = keys == jnp.transpose(keys)                    # [T, T]
    if vals_ref.dtype == jnp.bfloat16:
        # bf16 inputs: the 0/1 mask and the bf16 values are BOTH exact
        # in bf16, and preferred_element_type keeps the MXU accumulator
        # fp32 — so ONE native bf16 pass equals the fp32 matmul of the
        # upcast values, at ~3x the MXU rate and half the VMEM read
        # build the 0/1 mask via an fp32 select, then convert: a direct
        # bool-select into bf16 trips a Mosaic i1->(16,128) relayout
        # error ("Invalid relayout ... vector<512x512xi1>")
        mask = jnp.where(eq & (col_ids <= row_ids), 1.0, 0.0).astype(
            jnp.bfloat16)
        scanned = jax.lax.dot_general(
            mask, vals_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    else:
        mask = jnp.where(eq & (col_ids <= row_ids), 1.0, 0.0)
        # HIGHEST precision: the v5e MXU natively multiplies in bf16;
        # the mask is exact in bf16 but fp32 vals are not —
        # fp32-emulated passes keep the segment sums at fp32 accuracy
        # (verified vs float64 reference)
        scanned = jax.lax.dot_general(
            mask, vals, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    # keys ascending => only the leading run can equal the carried key
    add_carry = jnp.where(keys == carry_key[0], 1.0, 0.0)
    scanned = scanned + add_carry * carry_val[:]

    out_ref[:] = scanned
    carry_key[0] = keys[t - 1, 0]
    carry_val[:] = scanned[t - 1:t, :]


@partial(jax.jit, static_argnames=("tile",))
def segmented_cumsum_pallas(values: jnp.ndarray,
                            starts_keys: jnp.ndarray,
                            tile: int = 1024) -> jnp.ndarray:
    """Inclusive segmented cumsum over rows sharing ascending keys.

    Args:
        values: [N, C] float rows (N % tile == 0; pad with a trailing
            sentinel segment if needed).
        starts_keys: [N] int32 ascending segment keys.
        tile: rows per grid step.

    Returns [N, C] fp32 scanned rows.
    """
    n, c = values.shape
    assert n % tile == 0, (n, tile)
    keys2d = starts_keys.reshape(n, 1)
    grid = (n // tile,)
    return pl.pallas_call(
        _seg_scan_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),
            pltpu.VMEM((1, c), jnp.float32),
        ],
    )(keys2d, values)


def pad_rows_to_multiple(values: jnp.ndarray, keys: jnp.ndarray,
                         tile: int, pad_key: int):
    """Pad rows so N % tile == 0; padding rows form their own trailing
    segment (pad_key must exceed every real key)."""
    n = values.shape[0]
    rem = (-n) % tile
    if rem == 0:
        return values, keys, n
    values = jnp.concatenate(
        [values, jnp.zeros((rem,) + values.shape[1:], values.dtype)], 0)
    keys = jnp.concatenate(
        [keys, jnp.full((rem,), pad_key, keys.dtype)], 0)
    return values, keys, n
