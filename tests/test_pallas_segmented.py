"""Pallas segmented-scan kernel vs the XLA associative_scan path
(interpret mode on CPU; compiled on TPU via bench)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from distillbev_tpu.ops import segmented
from distillbev_tpu.ops.pallas_segmented import (pad_rows_to_multiple,
                                                 segmented_cumsum_pallas)


def reference_scan(vals, keys):
    out = np.zeros_like(vals, dtype=np.float64)
    acc = None
    prev = None
    for i, (v, k) in enumerate(zip(vals, keys)):
        if prev is None or k != prev:
            acc = v.astype(np.float64).copy()
        else:
            acc = acc + v
        out[i] = acc
        prev = k
    return out


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    # CPU test platform: run the TPU kernel through the interpreter
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        yield


class TestPallasSegScan:

    def test_matches_reference(self, rng):
        n, c, tile = 256, 8, 64
        keys = np.sort(rng.randint(0, 40, n)).astype(np.int32)
        vals = rng.randn(n, c).astype(np.float32)
        got = np.asarray(segmented_cumsum_pallas(
            jnp.asarray(vals), jnp.asarray(keys), tile=tile))
        want = reference_scan(vals, keys)
        assert np.allclose(got, want, atol=1e-3)

    def test_matches_xla_path(self, rng):
        n, c, tile = 512, 4, 128
        keys = np.sort(rng.randint(0, 100, n)).astype(np.int32)
        vals = rng.randn(n, c).astype(np.float32)
        got = np.asarray(segmented_cumsum_pallas(
            jnp.asarray(vals), jnp.asarray(keys), tile=tile))
        starts = segmented.segment_starts(jnp.asarray(keys))
        want = np.asarray(segmented.segmented_cumsum(
            jnp.asarray(vals), starts))
        assert np.allclose(got, want, atol=1e-3)

    def test_segment_spanning_many_tiles(self, rng):
        """One giant segment crossing every tile boundary."""
        n, c, tile = 256, 4, 32
        keys = np.zeros(n, np.int32)
        vals = np.ones((n, c), np.float32)
        got = np.asarray(segmented_cumsum_pallas(
            jnp.asarray(vals), jnp.asarray(keys), tile=tile))
        want = np.cumsum(vals, axis=0)
        assert np.allclose(got, want, atol=1e-3)

    def test_boundary_exactly_at_tile_edge(self, rng):
        n, c, tile = 128, 4, 32
        keys = np.repeat(np.arange(4), 32).astype(np.int32)  # edges align
        vals = rng.randn(n, c).astype(np.float32)
        got = np.asarray(segmented_cumsum_pallas(
            jnp.asarray(vals), jnp.asarray(keys), tile=tile))
        want = reference_scan(vals, keys)
        assert np.allclose(got, want, atol=1e-3)

    def test_padding_helper(self, rng):
        vals = jnp.ones((100, 4))
        keys = jnp.zeros((100,), jnp.int32)
        v2, k2, n = pad_rows_to_multiple(vals, keys, 64, pad_key=999)
        assert v2.shape[0] == 128 and n == 100
        assert int(k2[-1]) == 999


def test_bf16_input_accumulates_fp32():
    """bf16 rows into the kernel: single-pass bf16 MXU matmul with fp32
    accumulation must equal the fp32 scan of the upcast values exactly
    (0/1 mask and bf16 values are both exact bf16 products)."""
    r = np.random.RandomState(5)
    n, c = 1024, 16
    keys = np.sort(r.randint(0, 40, n)).astype(np.int32)
    vals16 = r.randn(n, c).astype(jnp.bfloat16)
    got = segmented_cumsum_pallas(jnp.asarray(vals16),
                                  jnp.asarray(keys), tile=512)
    want = segmented_cumsum_pallas(
        jnp.asarray(vals16).astype(jnp.float32),
        jnp.asarray(keys), tile=512)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=0)
