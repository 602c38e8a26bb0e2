"""Point-cloud container (host-side, numpy-backed).

Capability parity with the reference's ``LiDARPoints``
(reference: mmdet3d/core/points/lidar_points.py + base_points.py): an
[N, points_dim] array with named extra-dim attributes, shuffle/range
filters and the geometric transforms the augmentation pipeline needs.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np


class LiDARPoints:
    """Points in LiDAR coordinates: columns [x, y, z, ...extras]."""

    def __init__(self,
                 tensor,
                 points_dim: int = 3,
                 attribute_dims: Optional[Dict[str, int]] = None):
        tensor = np.asarray(tensor, dtype=np.float32)
        if tensor.size == 0:
            tensor = tensor.reshape(0, points_dim)
        assert tensor.ndim == 2 and tensor.shape[-1] == points_dim, \
            f"expected [N, {points_dim}], got {tensor.shape}"
        self.tensor = tensor.copy()
        self.points_dim = points_dim
        self.attribute_dims = attribute_dims or {}
        self.rotation_axis = 2

    def __len__(self) -> int:
        return self.tensor.shape[0]

    def __getitem__(self, item) -> "LiDARPoints":
        t = np.atleast_2d(self.tensor[item])
        return type(self)(t, points_dim=self.points_dim,
                          attribute_dims=self.attribute_dims)

    def __repr__(self) -> str:
        return f"LiDARPoints({self.tensor})"

    @property
    def coord(self) -> np.ndarray:
        return self.tensor[:, :3]

    @coord.setter
    def coord(self, value) -> None:
        self.tensor[:, :3] = value

    @property
    def shape(self):
        return self.tensor.shape

    def clone(self) -> "LiDARPoints":
        return type(self)(self.tensor.copy(), points_dim=self.points_dim,
                          attribute_dims=dict(self.attribute_dims))

    @classmethod
    def cat(cls, points_list: Sequence["LiDARPoints"]) -> "LiDARPoints":
        p0 = points_list[0]
        t = np.concatenate([p.tensor for p in points_list], axis=0)
        return cls(t, points_dim=p0.points_dim,
                   attribute_dims=p0.attribute_dims)

    def shuffle(self, rng: Optional[np.random.RandomState] = None):
        rng = rng or np.random
        idx = rng.permutation(len(self))
        self.tensor = self.tensor[idx]
        return idx

    def rotate(self, rotation, axis: int = 2) -> np.ndarray:
        """Rotate by scalar angle (CCW about +z) or 3x3 matrix (row-vec)."""
        if isinstance(rotation, np.ndarray) and rotation.size == 9:
            rot_mat_T = rotation.reshape(3, 3).astype(np.float32)
        else:
            c, s = np.cos(rotation), np.sin(rotation)
            rot_mat_T = np.array(
                [[c, s, 0], [-s, c, 0], [0, 0, 1]], dtype=np.float32)
        self.tensor[:, :3] = self.tensor[:, :3] @ rot_mat_T
        return rot_mat_T

    def flip(self, bev_direction: str = "horizontal") -> None:
        if bev_direction == "horizontal":
            self.tensor[:, 1] = -self.tensor[:, 1]
        elif bev_direction == "vertical":
            self.tensor[:, 0] = -self.tensor[:, 0]
        else:
            raise ValueError(bev_direction)

    def translate(self, trans_vector) -> None:
        self.tensor[:, :3] += np.asarray(trans_vector, dtype=np.float32)

    def scale(self, factor: float) -> None:
        self.tensor[:, :3] *= factor

    def in_range_3d(self, point_range) -> np.ndarray:
        t = self.tensor
        return ((t[:, 0] > point_range[0]) & (t[:, 1] > point_range[1]) &
                (t[:, 2] > point_range[2]) & (t[:, 0] < point_range[3]) &
                (t[:, 1] < point_range[4]) & (t[:, 2] < point_range[5]))

    def in_range_bev(self, bev_range) -> np.ndarray:
        t = self.tensor
        return ((t[:, 0] > bev_range[0]) & (t[:, 1] > bev_range[1]) &
                (t[:, 0] < bev_range[2]) & (t[:, 1] < bev_range[3]))

    def new_point(self, data) -> "LiDARPoints":
        data = np.asarray(data, dtype=np.float32)
        return type(self)(data, points_dim=data.shape[-1],
                          attribute_dims=self.attribute_dims)
