"""Non-local (embedded-gaussian) block.

Capability parity with the reference's ``NonLocalBlockND``
(reference: mmdet3d/models/bricks/non_local.py:1-86): theta/phi/g 1x1
projections to C/2, attention over all pixels, W projection back + residual.
Channels-last; the pairwise attention is two MXU matmuls.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class NonLocalBlock(nn.Module):
    inter_ratio: int = 2

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        inter = max(c // self.inter_ratio, 1)
        theta = nn.Conv(inter, (1, 1), name="theta")(x).reshape(b, h * w,
                                                                inter)
        phi = nn.Conv(inter, (1, 1), name="phi")(x).reshape(b, h * w,
                                                            inter)
        g = nn.Conv(inter, (1, 1), name="g")(x).reshape(b, h * w, inter)
        attn = jnp.einsum("bqc,bkc->bqk", theta, phi,
                          preferred_element_type=jnp.float32)
        attn = nn.softmax(attn, axis=-1)
        y = jnp.einsum("bqk,bkc->bqc", attn, g,
                       preferred_element_type=jnp.float32)
        y = y.reshape(b, h, w, inter)
        y = nn.Conv(c, (1, 1), name="out",
                    kernel_init=nn.initializers.zeros)(y)
        return x + y
