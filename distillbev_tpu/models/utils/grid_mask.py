"""GridMask image augmentation.

Capability parity with the reference's ``GridMask``
(reference: mmdet3d/models/utils/grid_mask.py:69-123 — random square
grid dropout with random offset/rotation applied to BEVFormer inputs;
instantiated with ``rotate=1, ratio=0.5, mode=1, prob=0.7`` at
bevformer.py:48-49, where ``randint(rotate=1)`` always draws 0, i.e.
the shipped recipe never actually rotates).

TPU-native: a pure function of an explicit PRNG key, applied inside
jit.  Rotation is supported by evaluating the stripe-band membership at
inverse-rotated pixel coordinates — the same geometry as the
reference's "build 1.5x canvas, PIL-rotate, center-crop" without the
host round trip or the dynamic canvas.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_mask(rng: jax.Array, imgs: jnp.ndarray, ratio: float = 0.5,
              d_min: int = 2, prob: float = 0.7,
              rotate: int = 1) -> jnp.ndarray:
    """imgs [B, H, W, C] -> masked images.

    ``rotate``: upper bound (exclusive) of the uniform integer rotation
    angle in degrees, matching the reference's
    ``np.random.randint(self.rotate)`` (grid_mask.py:107) — ``rotate=1``
    (the BEVFormer recipe) means angle 0, no rotation.
    """
    b, h, w, c = imgs.shape
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    d_max = max(min(h, w), d_min + 1)
    d = jax.random.randint(k1, (), d_min, d_max)
    off_y = jax.random.randint(k2, (), 0, d_max)
    off_x = jax.random.randint(k3, (), 0, d_max)
    off_y = off_y % jnp.maximum(d, 1)
    off_x = off_x % jnp.maximum(d, 1)
    # reference l = min(max(int(d*ratio+0.5), 1), d-1)
    keep_len = jnp.clip((d * ratio + 0.5).astype(jnp.int32), 1, d - 1)

    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32),
                          indexing="ij")
    if rotate > 1:
        ang = jax.random.randint(k5, (), 0, rotate).astype(
            jnp.float32) * (jnp.pi / 180.0)
        cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
        cos, sin = jnp.cos(ang), jnp.sin(ang)
        # inverse-rotate pixel centers into the unrotated mask frame
        ry, rx = yy - cy, xx - cx
        yy = cos * ry + sin * rx + cy
        xx = -sin * ry + cos * rx + cx
    ys = (jnp.floor(yy).astype(jnp.int32) + off_y) % jnp.maximum(d, 1)
    xs = (jnp.floor(xx).astype(jnp.int32) + off_x) % jnp.maximum(d, 1)
    mask = (ys >= keep_len) | (xs >= keep_len)
    apply = jax.random.uniform(k4, ()) < prob
    mask = jnp.where(apply, mask, True)
    return imgs * mask[None, :, :, None].astype(imgs.dtype)
