"""GridMask image augmentation.

Capability parity with the reference's ``GridMask``
(reference: mmdet3d/models/utils/grid_mask.py:1-123 — random square grid
dropout with random offset/rotation applied to BEVFormer inputs).

TPU-native: a pure function of an explicit PRNG key (rotation omitted:
the reference rotates the binary mask by a random angle, a negligible
regularization difference documented here), applied inside jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_mask(rng: jax.Array, imgs: jnp.ndarray, ratio: float = 0.5,
              d_min: int = 2, prob: float = 0.7) -> jnp.ndarray:
    """imgs [B, H, W, C] -> masked images."""
    b, h, w, c = imgs.shape
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    d_max = max(min(h, w) // 2, d_min + 1)
    d = jax.random.randint(k1, (), d_min, d_max)
    off_y = jax.random.randint(k2, (), 0, d_max)
    off_x = jax.random.randint(k3, (), 0, d_max)
    keep_len = jnp.maximum((d * ratio).astype(jnp.int32), 1)
    ys = (jnp.arange(h) + off_y) % jnp.maximum(d, 1)
    xs = (jnp.arange(w) + off_x) % jnp.maximum(d, 1)
    mask = ((ys[:, None] >= keep_len) | (xs[None, :] >= keep_len))
    apply = jax.random.uniform(k4, ()) < prob
    mask = jnp.where(apply, mask, True)
    return imgs * mask[None, :, :, None].astype(imgs.dtype)
