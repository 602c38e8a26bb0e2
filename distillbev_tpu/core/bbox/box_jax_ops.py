"""JAX (on-device) box operations.

The reference computes its distillation foreground masks with a *numpy*
point-in-rotated-box test on the host every training step
(reference: mmdet3d/models/detectors/bevdet_distill.py:787 calling
core/bbox/box_np_ops.py:426) — a device->host serialization point.  Here the
same tests run fully on-device as vectorized, statically-shaped JAX ops that
XLA fuses into the surrounding loss computation, plus a rotated-box IoU /
NMS used by CenterHead post-processing (reference: ops/iou3d).

All functions are jit-friendly: static shapes, no data-dependent control
flow; invalid/padded boxes are handled with masks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def limit_period(val, offset: float = 0.5, period: float = jnp.pi):
    return val - jnp.floor(val / period + offset) * period


def points_in_rbbox(points: jnp.ndarray,
                    boxes: jnp.ndarray,
                    origin=(0.5, 0.5, 0.0)) -> jnp.ndarray:
    """Point-in-rotated-3D-box test on device.  [N,3+], [M,7+] -> bool [N,M].

    Padded boxes (all-zero dims) match no points.
    """
    pts = points[:, :3]
    ctr, dims, yaw = boxes[:, :3], boxes[:, 3:6], boxes[:, 6]
    rel = pts[:, None, :] - ctr[None, :, :]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    lx = rel[..., 0] * c[None, :] + rel[..., 1] * s[None, :]
    ly = -rel[..., 0] * s[None, :] + rel[..., 1] * c[None, :]
    lz = rel[..., 2]
    org = jnp.asarray(origin, dtype=pts.dtype)
    lo = -org[None, :] * dims
    hi = (1.0 - org[None, :]) * dims
    valid = (dims > 0).all(axis=-1)
    inside = ((lx >= lo[None, :, 0]) & (lx <= hi[None, :, 0]) &
              (ly >= lo[None, :, 1]) & (ly <= hi[None, :, 1]) &
              (lz >= lo[None, :, 2]) & (lz <= hi[None, :, 2]))
    return inside & valid[None, :]


def points_in_rbbox_bev(points_xy: jnp.ndarray,
                        boxes: jnp.ndarray) -> jnp.ndarray:
    """BEV-only membership: [N,2] grid-cell centers vs [M,5|7+] rboxes.

    Boxes may be (x,y,dx,dy,yaw) or full 3D (x,y,z,dx,dy,dz,yaw); the z
    extent is ignored — matching the reference's z-flattened FG mask
    (bevdet_distill.py:773-787 enlarges dz to cover all z).
    """
    if boxes.shape[-1] >= 7:
        ctr = boxes[:, :2]
        dims = boxes[:, 3:5]
        yaw = boxes[:, 6]
    else:
        ctr, dims, yaw = boxes[:, :2], boxes[:, 2:4], boxes[:, 4]
    rel = points_xy[:, None, :] - ctr[None, :, :]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    lx = rel[..., 0] * c[None, :] + rel[..., 1] * s[None, :]
    ly = -rel[..., 0] * s[None, :] + rel[..., 1] * c[None, :]
    valid = (dims > 0).all(axis=-1)
    inside = ((jnp.abs(lx) <= dims[None, :, 0] / 2) &
              (jnp.abs(ly) <= dims[None, :, 1] / 2))
    return inside & valid[None, :]


def center_to_corner_box2d(centers, dims, angles):
    """BEV boxes -> 4 CCW corners [N, 4, 2] (device)."""
    corners_norm = jnp.array(
        [[-0.5, -0.5], [0.5, -0.5], [0.5, 0.5], [-0.5, 0.5]],
        dtype=centers.dtype)
    corners = dims[:, None, :] * corners_norm[None]
    c, s = jnp.cos(angles), jnp.sin(angles)
    rot = jnp.stack(
        [jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], -2)  # [N,2,2]
    corners = jnp.einsum("npj,nij->npi", corners, rot)
    return corners + centers[:, None, :]


# ---------------------------------------------------------------------------
# Rotated BEV IoU via Sutherland–Hodgman polygon clipping, fully vectorized
# with static shapes.  Replaces the reference's iou3d CUDA kernels
# (reference: mmdet3d/ops/iou3d/src/iou3d_kernel.cu).
# ---------------------------------------------------------------------------

_MAX_VERTS = 8  # intersection of two convex quads has <= 8 vertices


def _clip_polygon_halfplane(poly, valid, a, b):
    """Clip polygon (poly [V,2], valid [V]) by half-plane on the inside of
    directed edge a->b.  Returns new (poly, valid) with V=_MAX_VERTS."""
    V = poly.shape[0]
    edge = b - a
    # signed side: cross(edge, p - a) >= 0 keeps the point (CCW interior)
    rel = poly - a[None, :]
    side = edge[0] * rel[:, 1] - edge[1] * rel[:, 0]
    inside = (side >= 0) & valid

    nxt = jnp.roll(jnp.arange(V), -1)
    # for wrap-around correctness with padding, roll validity-aware: the
    # polygon is stored densely in the first K valid slots.
    n_valid = jnp.sum(valid)
    nxt_idx = jnp.where(jnp.arange(V) == n_valid - 1, 0, jnp.arange(V) + 1)
    nxt_idx = jnp.clip(nxt_idx, 0, V - 1)
    p_next = poly[nxt_idx]
    inside_next = inside[nxt_idx]
    side_next = side[nxt_idx]

    # intersection point of segment poly[i]->p_next[i] with the edge line
    denom = side - side_next
    t = jnp.where(jnp.abs(denom) > 1e-12, side / jnp.where(
        jnp.abs(denom) > 1e-12, denom, 1.0), 0.0)
    inter = poly + t[:, None] * (p_next - poly)

    # each input vertex emits up to 2 output vertices:
    #   slot0: the vertex itself, if inside
    #   slot1: the intersection, if the edge crosses the plane
    crossing = (inside ^ inside_next) & valid
    emit0 = inside
    emit1 = crossing
    out_pts = jnp.stack([poly, inter], axis=1).reshape(2 * V, 2)
    out_ok = jnp.stack([emit0, emit1], axis=1).reshape(2 * V)

    # compact: stable sort by ~ok keeps emitted vertices in order at front
    order = jnp.argsort(~out_ok, stable=True)
    out_pts = out_pts[order][:V]
    out_ok = out_ok[order][:V]
    return out_pts, out_ok


def _polygon_area(poly, valid):
    """Shoelace area of a dense-packed polygon with validity mask."""
    V = poly.shape[0]
    n_valid = jnp.sum(valid)
    idx = jnp.arange(V)
    nxt_idx = jnp.where(idx == n_valid - 1, 0, idx + 1)
    nxt_idx = jnp.clip(nxt_idx, 0, V - 1)
    p, q = poly, poly[nxt_idx]
    cross = p[:, 0] * q[:, 1] - q[:, 0] * p[:, 1]
    return 0.5 * jnp.abs(jnp.sum(jnp.where(valid, cross, 0.0)))


def _rect_corners(box):
    """(cx,cy,dx,dy,yaw) -> 4 CCW corners [4,2]."""
    cx, cy, dx, dy, yaw = box[0], box[1], box[2], box[3], box[4]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    local = jnp.array([[-0.5, -0.5], [0.5, -0.5], [0.5, 0.5], [-0.5, 0.5]])
    local = local * jnp.stack([dx, dy])[None, :]
    x = local[:, 0] * c - local[:, 1] * s + cx
    y = local[:, 0] * s + local[:, 1] * c + cy
    return jnp.stack([x, y], axis=-1)


def _pair_intersection_area(box_a, box_b):
    """Intersection area of two (cx,cy,dx,dy,yaw) rectangles."""
    quad_a = _rect_corners(box_a)
    quad_b = _rect_corners(box_b)
    poly = jnp.zeros((_MAX_VERTS, 2), dtype=quad_a.dtype)
    poly = poly.at[:4].set(quad_a)
    valid = jnp.arange(_MAX_VERTS) < 4

    def clip_edge(i, carry):
        poly, valid = carry
        a = quad_b[i]
        b = quad_b[(i + 1) % 4]
        return _clip_polygon_halfplane(poly, valid, a, b)

    poly, valid = jax.lax.fori_loop(0, 4, clip_edge, (poly, valid))
    return _polygon_area(poly, valid)


def rotated_iou_bev(boxes_a: jnp.ndarray,
                    boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise rotated BEV IoU.  [N,5] x [M,5] (cx,cy,dx,dy,yaw) -> [N,M]."""
    inter = jax.vmap(lambda a: jax.vmap(
        lambda b: _pair_intersection_area(a, b))(boxes_b))(boxes_a)
    area_a = boxes_a[:, 2] * boxes_a[:, 3]
    area_b = boxes_b[:, 2] * boxes_b[:, 3]
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 1e-8, inter / jnp.maximum(union, 1e-8), 0.0)


def rotated_overlaps_bev(boxes_a: jnp.ndarray,
                         boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise rotated intersection area (no normalization)."""
    return jax.vmap(lambda a: jax.vmap(
        lambda b: _pair_intersection_area(a, b))(boxes_b))(boxes_a)
