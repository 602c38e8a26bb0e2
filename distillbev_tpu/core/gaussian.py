"""Gaussian heatmap utilities (numpy + JAX).

Capability parity with the reference's gaussian target helpers
(reference: mmdet3d/core/utils/gaussian.py — gaussian_2d:6,
draw_heatmap_gaussian:25, gaussian_radius:58, centerpoint_radius_func1/2/3
and maxwh_radius_func:91-123), redesigned for TPU: instead of per-object
in-place patch writes, the JAX path evaluates the full-grid gaussian per
object and reduces with a segment-max over classes — a dense, fused,
statically-shaped computation that XLA maps onto the VPU.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# -- radius functions (shared math, operate on floats) ----------------------


def _r1(height, width, min_overlap):
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = np.sqrt(np.maximum(b1 ** 2 - 4 * c1, 0.0))
    return (b1 + sq1) / 2


def _r2(height, width, min_overlap):
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = np.sqrt(np.maximum(b2 ** 2 - 16 * c2, 0.0))
    return (b2 + sq2) / 8


def _r3(height, width, min_overlap):
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = np.sqrt(np.maximum(b3 ** 2 - 4 * a3 * c3, 0.0))
    return (b3 + sq3) / (2 * a3)


def gaussian_radius(det_size, min_overlap: float = 0.5):
    """min of the three CornerNet radii (reference gaussian.py:58-88)."""
    height, width = det_size
    return np.minimum(np.minimum(_r1(height, width, min_overlap),
                                 _r2(height, width, min_overlap)),
                      _r3(height, width, min_overlap))


def centerpoint_radius_func1(det_size, min_overlap: float = 0.5, **kw):
    height, width = det_size
    return _r1(height, width, min_overlap)


def centerpoint_radius_func2(det_size, min_overlap: float = 0.5, **kw):
    height, width = det_size
    return _r2(height, width, min_overlap)


def centerpoint_radius_func3(det_size, min_overlap: float = 0.5, **kw):
    height, width = det_size
    return _r3(height, width, min_overlap)


def maxwh_radius_func(det_size, min_overlap=None, scale: float = 1.0):
    height, width = det_size
    return np.maximum(height, width) * scale


def gaussian_radius_jnp(height, width, min_overlap: float = 0.5):
    """Device version of gaussian_radius for batched target generation."""
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 + jnp.sqrt(jnp.maximum(b1 ** 2 - 4 * c1, 0.0))) / 2
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    r2 = (b2 + jnp.sqrt(jnp.maximum(b2 ** 2 - 16 * c2, 0.0))) / 8
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    r3 = (b3 + jnp.sqrt(jnp.maximum(b3 ** 2 - 4 * a3 * c3, 0.0))) / (2 * a3)
    return jnp.minimum(jnp.minimum(r1, r2), r3)


RADIUS_FUNCS = {
    "gaussian_radius": gaussian_radius,
    "centerpoint_radius_func1": centerpoint_radius_func1,
    "centerpoint_radius_func2": centerpoint_radius_func2,
    "centerpoint_radius_func3": centerpoint_radius_func3,
    "maxwh_radius_func": maxwh_radius_func,
}


# -- numpy drawing (host-side target generation / tests) --------------------


def gaussian_2d(shape, sigma: float = 1.0) -> np.ndarray:
    m, n = [(s - 1.0) / 2.0 for s in shape]
    y, x = np.ogrid[-m:m + 1, -n:n + 1]
    h = np.exp(-(x * x + y * y) / (2 * sigma * sigma))
    h[h < np.finfo(h.dtype).eps * h.max()] = 0
    return h


def draw_heatmap_gaussian(heatmap: np.ndarray, center, radius: int,
                          k: float = 1.0) -> np.ndarray:
    """Max-compose a gaussian patch into ``heatmap`` (in place, numpy)."""
    diameter = 2 * radius + 1
    gaussian = gaussian_2d((diameter, diameter), sigma=diameter / 6)
    x, y = int(center[0]), int(center[1])
    height, width = heatmap.shape[:2]
    left, right = min(x, radius), min(width - x, radius + 1)
    top, bottom = min(y, radius), min(height - y, radius + 1)
    if right + left <= 0 or top + bottom <= 0:
        return heatmap
    masked = heatmap[y - top:y + bottom, x - left:x + right]
    patch = gaussian[radius - top:radius + bottom,
                     radius - left:radius + right] * k
    np.maximum(masked, patch, out=masked)
    return heatmap


# -- JAX dense drawing (device-side target generation) ----------------------


def gaussian_heatmap_dense(centers_xy: jnp.ndarray,
                           radii: jnp.ndarray,
                           class_ids: jnp.ndarray,
                           valid: jnp.ndarray,
                           num_classes: int,
                           height: int,
                           width: int,
                           k: float = 1.0) -> jnp.ndarray:
    """Dense multi-object gaussian heatmap.

    Args:
        centers_xy: [M, 2] float centers in pixel coords (x, y).
        radii: [M] float radii (pre-clamped to >= min_radius by caller).
        class_ids: [M] int class per object.
        valid: [M] bool padding mask.
        num_classes, height, width: output grid.

    Returns:
        [num_classes, H, W] heatmap = max over objects of its gaussian.

    Matches the semantics of the reference's per-object patch draws
    (gaussian.py:25-55): sigma = diameter/6 with diameter = 2*floor(r)+1,
    integer-snapped centers, patch truncated at radius — expressed as a
    dense masked evaluation so it jits with static shapes.
    """
    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    grid_y = ys[:, None]                                 # [H, 1]
    grid_x = xs[None, :]                                 # [1, W]
    r_int = jnp.floor(radii).astype(jnp.int32)
    cx = jnp.floor(centers_xy[:, 0]).astype(jnp.int32)
    cy = jnp.floor(centers_xy[:, 1]).astype(jnp.int32)
    diameter = (2 * r_int + 1).astype(jnp.float32)
    sigma = diameter / 6.0

    dx = grid_x[None] - cx[:, None, None].astype(jnp.float32)  # [M, H, W]
    dy = grid_y[None] - cy[:, None, None].astype(jnp.float32)
    dist2 = dx * dx + dy * dy
    g = jnp.exp(-dist2 / (2.0 * sigma * sigma)[:, None, None]) * k
    # truncate outside the square patch of half-size r (reference semantics)
    inpatch = ((jnp.abs(dx) <= r_int[:, None, None]) &
               (jnp.abs(dy) <= r_int[:, None, None]))
    in_grid = ((cx >= 0) & (cx < width) & (cy >= 0) & (cy < height))
    ok = valid & in_grid
    g = jnp.where(inpatch & ok[:, None, None], g, 0.0)

    # segment-max over classes
    onehot = jax.nn.one_hot(class_ids, num_classes, dtype=g.dtype)  # [M, K]
    per_class = g[:, None] * onehot[:, :, None, None]               # [M,K,H,W]
    return per_class.max(axis=0)


def gaussian_scale_mask_dense(centers_xy: jnp.ndarray,
                              radii: jnp.ndarray,
                              valid: jnp.ndarray,
                              height: int,
                              width: int,
                              k: float = 1.0) -> jnp.ndarray:
    """Classless variant returning a single [H, W] max-gaussian (used by the
    distillation `gauss_focal_heatmap` masks, reference
    bevdet_distill.py:1025-1052)."""
    hm = gaussian_heatmap_dense(
        centers_xy, radii, jnp.zeros(centers_xy.shape[0], jnp.int32),
        valid, 1, height, width, k=k)
    return hm[0]


def radius_jnp(name: str, height, width, min_overlap: float = 0.5,
               scale: float = 1.0):
    """Device dispatcher over the custom radius functions (reference
    gaussian.py:91-123) for batched mask generation."""
    b1 = height + width
    if name in ("centerpoint1", "centerpoint_radius_func1"):
        c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
        return (b1 + jnp.sqrt(jnp.maximum(b1 ** 2 - 4 * c1, 0.0))) / 2
    if name in ("centerpoint2", "centerpoint_radius_func2"):
        b2 = 2 * b1
        c2 = (1 - min_overlap) * width * height
        return (b2 + jnp.sqrt(jnp.maximum(b2 ** 2 - 16 * c2, 0.0))) / 8
    if name in ("centerpoint3", "centerpoint_radius_func3"):
        a3 = 4 * min_overlap
        b3 = -2 * min_overlap * b1
        c3 = (min_overlap - 1) * width * height
        return (b3 + jnp.sqrt(jnp.maximum(b3 ** 2 - 4 * a3 * c3,
                                          0.0))) / (2 * a3)
    if name in ("maxwh", "maxwh_radius_func"):
        return jnp.maximum(height, width) * scale
    if name == "gaussian_radius":
        return gaussian_radius_jnp(height, width, min_overlap)
    raise NotImplementedError(name)
