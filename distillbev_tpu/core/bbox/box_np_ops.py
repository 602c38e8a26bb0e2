"""Numpy box operations (host side).

Capability parity with the reference's numpy box utilities
(reference: mmdet3d/core/bbox/box_np_ops.py — rotation_3d_in_axis:175,
center_to_corner_box3d:206, corner_to_surfaces_3d:404, points_in_rbbox:426),
re-implemented vectorized (no numba): the point-in-rotated-box test is done
in the box frame (rotate + bounds check) instead of surface half-space
tests — mathematically equivalent for rectangular boxes and ~10x simpler.

Box convention throughout this framework: ``(x, y, z, dx, dy, dz, yaw)``
with ``(x, y, z)`` the *bottom center* (origin (0.5, 0.5, 0)) and ``yaw``
the CCW rotation around +z from the +x axis.
"""
from __future__ import annotations

import numpy as np


def limit_period(val, offset: float = 0.5, period: float = np.pi):
    """Limit ``val`` into ``[-offset*period, (1-offset)*period)``."""
    return val - np.floor(val / period + offset) * period


def rotation_2d(points: np.ndarray, angles: np.ndarray) -> np.ndarray:
    """Rotate 2D points CCW. points [N, P, 2], angles [N] -> [N, P, 2]."""
    c, s = np.cos(angles), np.sin(angles)
    rot = np.stack([np.stack([c, -s], -1), np.stack([s, c], -1)], -2)
    return np.einsum("npj,nij->npi", points, rot)


def corners_nd(dims: np.ndarray, origin=0.5) -> np.ndarray:
    """Generate axis-aligned box corners from dims. [N, D] -> [N, 2**D, D]."""
    ndim = dims.shape[-1]
    corners_norm = np.stack(
        np.meshgrid(*([np.array([0.0, 1.0])] * ndim), indexing="ij"),
        axis=-1).reshape(-1, ndim)
    if ndim == 3:
        # match reference corner ordering (start from minimum, loop bottom
        # face then top face) so surfaces/visuals agree
        corners_norm = corners_norm[[0, 1, 3, 2, 4, 5, 7, 6]]
    corners_norm = corners_norm - np.asarray(origin, dtype=dims.dtype)
    return dims.reshape(-1, 1, ndim) * corners_norm.reshape(1, -1, ndim)


def rotation_3d_in_axis(points: np.ndarray, angles: np.ndarray,
                        axis: int = 2) -> np.ndarray:
    """Rotate [N, P, 3] points by per-box angles around ``axis`` (CCW)."""
    c, s = np.cos(angles), np.sin(angles)
    one, zero = np.ones_like(c), np.zeros_like(c)
    if axis == 2 or axis == -1:
        rows = [[c, -s, zero], [s, c, zero], [zero, zero, one]]
    elif axis == 1:
        rows = [[c, zero, -s], [zero, one, zero], [s, zero, c]]
    elif axis == 0:
        rows = [[one, zero, zero], [zero, c, -s], [zero, s, c]]
    else:
        raise ValueError(f"axis must be in {{0,1,2}}, got {axis}")
    rot = np.stack([np.stack(r, -1) for r in rows], -2)  # [N, 3, 3]
    return np.einsum("npj,nij->npi", points, rot)


def center_to_corner_box3d(centers: np.ndarray,
                           dims: np.ndarray,
                           angles: np.ndarray = None,
                           origin=(0.5, 0.5, 0.0),
                           axis: int = 2) -> np.ndarray:
    """Boxes -> 8 corners [N, 8, 3]."""
    corners = corners_nd(dims, origin=origin)
    if angles is not None:
        corners = rotation_3d_in_axis(corners, angles, axis=axis)
    return corners + centers.reshape(-1, 1, 3)


def center_to_corner_box2d(centers: np.ndarray,
                           dims: np.ndarray,
                           angles: np.ndarray = None) -> np.ndarray:
    """BEV boxes -> 4 corners [N, 4, 2] (CCW order)."""
    corners_norm = np.array(
        [[-0.5, -0.5], [0.5, -0.5], [0.5, 0.5], [-0.5, 0.5]],
        dtype=dims.dtype)
    corners = dims.reshape(-1, 1, 2) * corners_norm.reshape(1, 4, 2)
    if angles is not None:
        corners = rotation_2d(corners, angles)
    return corners + centers.reshape(-1, 1, 2)


def points_in_rbbox(points: np.ndarray,
                    rbbox: np.ndarray,
                    z_axis: int = 2,
                    origin=(0.5, 0.5, 0.0)) -> np.ndarray:
    """Point-in-rotated-3D-box test.  [N, 3+], [M, 7+] -> bool [N, M].

    In-box-frame formulation: shift to box center, rotate by -yaw, then
    bounds-test against dims with the given origin (default bottom-center).
    Equivalent to the reference's corner/surface half-space test
    (box_np_ops.py:426) for rectangular boxes.
    """
    assert z_axis == 2, "only z-up supported"
    if rbbox.shape[0] == 0 or points.shape[0] == 0:
        return np.zeros((points.shape[0], rbbox.shape[0]), dtype=bool)
    pts = points[:, :3].astype(np.float64)
    ctr = rbbox[:, :3].astype(np.float64)
    dims = rbbox[:, 3:6].astype(np.float64)
    yaw = rbbox[:, 6].astype(np.float64)
    rel = pts[:, None, :] - ctr[None, :, :]          # [N, M, 3]
    c, s = np.cos(yaw), np.sin(yaw)
    # rotate by -yaw into box frame
    local_x = rel[..., 0] * c[None, :] + rel[..., 1] * s[None, :]
    local_y = -rel[..., 0] * s[None, :] + rel[..., 1] * c[None, :]
    local_z = rel[..., 2]
    org = np.asarray(origin, dtype=np.float64)
    lo = -org[None, :] * dims                        # [M, 3]
    hi = (1.0 - org[None, :]) * dims
    inside = ((local_x >= lo[None, :, 0]) & (local_x <= hi[None, :, 0]) &
              (local_y >= lo[None, :, 1]) & (local_y <= hi[None, :, 1]) &
              (local_z >= lo[None, :, 2]) & (local_z <= hi[None, :, 2]))
    return inside


def corner_to_standup_nd(boxes_corner: np.ndarray) -> np.ndarray:
    """[N, K, D] corners -> axis-aligned standup boxes [N, 2*D]."""
    return np.concatenate(
        [boxes_corner.min(axis=1), boxes_corner.max(axis=1)], axis=1)


def boxes3d_to_bev(boxes3d: np.ndarray) -> np.ndarray:
    """(x,y,z,dx,dy,dz,yaw,...) -> BEV (x,y,dx,dy,yaw)."""
    return boxes3d[:, [0, 1, 3, 4, 6]]


def in_range_bev(boxes: np.ndarray, bev_range) -> np.ndarray:
    """Whether box centers fall inside [x0, y0, x1, y1]."""
    return ((boxes[:, 0] > bev_range[0]) & (boxes[:, 1] > bev_range[1]) &
            (boxes[:, 0] < bev_range[2]) & (boxes[:, 1] < bev_range[3]))


def xywhr2xyxyr(boxes_xywhr: np.ndarray) -> np.ndarray:
    """(cx,cy,w,h,r) -> (x1,y1,x2,y2,r) (reference: box coder output fmt)."""
    out = np.zeros_like(boxes_xywhr)
    half_w = boxes_xywhr[:, 2] / 2
    half_h = boxes_xywhr[:, 3] / 2
    out[:, 0] = boxes_xywhr[:, 0] - half_w
    out[:, 1] = boxes_xywhr[:, 1] - half_h
    out[:, 2] = boxes_xywhr[:, 0] + half_w
    out[:, 3] = boxes_xywhr[:, 1] + half_h
    out[:, 4] = boxes_xywhr[:, 4]
    return out
