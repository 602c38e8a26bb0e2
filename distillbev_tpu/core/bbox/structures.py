"""3D box structures (host-side, numpy-backed).

Capability parity with the reference's ``LiDARInstance3DBoxes``
(reference: mmdet3d/core/bbox/structures/lidar_box3d.py and base_box3d.py):
a thin container over an ``[N, box_dim]`` float array in the convention
``(x, y, z_bottom, dx, dy, dz, yaw[, vx, vy])``, yaw CCW around +z.

These objects live on the host in the data pipeline and at eval time;
inside jitted train/infer steps boxes are plain padded jnp arrays.
"""
from __future__ import annotations

from typing import Iterator, Optional, Sequence, Tuple, Union

import numpy as np

from . import box_np_ops


class LiDARInstance3DBoxes:
    """3D boxes in LiDAR coordinates (x forward-ish, z up).

    Args:
        tensor: [N, box_dim] array-like.
        box_dim: number of box values (7 without velocity, 9 with).
        with_yaw: whether the 7th value is a valid yaw.
        origin: where (x, y, z) sits inside the box; internally stored with
            origin (0.5, 0.5, 0) = bottom center, like the reference.
    """

    YAW_AXIS = 2

    def __init__(self,
                 tensor,
                 box_dim: int = 7,
                 with_yaw: bool = True,
                 origin: Tuple[float, float, float] = (0.5, 0.5, 0.0)):
        tensor = np.asarray(tensor, dtype=np.float32)
        if tensor.size == 0:
            tensor = tensor.reshape(0, box_dim)
        assert tensor.ndim == 2 and tensor.shape[-1] == box_dim, \
            f"expected [N, {box_dim}], got {tensor.shape}"
        tensor = tensor.copy()
        if not with_yaw:
            assert box_dim == 6
            tensor = np.concatenate(
                [tensor, np.zeros((tensor.shape[0], 1), np.float32)], axis=1)
            box_dim += 1
            with_yaw = True
        if origin != (0.5, 0.5, 0.0):
            src = np.array(origin, dtype=np.float32)
            dst = np.array((0.5, 0.5, 0.0), dtype=np.float32)
            tensor[:, :3] = tensor[:, :3] + tensor[:, 3:6] * (dst - src)
        self.tensor = tensor
        self.box_dim = box_dim
        self.with_yaw = with_yaw

    # -- basic container protocol ---------------------------------------
    def __len__(self) -> int:
        return self.tensor.shape[0]

    def __getitem__(self, item) -> "LiDARInstance3DBoxes":
        if isinstance(item, (int, np.integer)):
            t = self.tensor[item:item + 1]
        else:
            t = np.atleast_2d(self.tensor[item])
        return type(self)(t, box_dim=self.box_dim, with_yaw=self.with_yaw)

    def __iter__(self) -> Iterator[np.ndarray]:
        return iter(self.tensor)

    def __repr__(self) -> str:
        return f"{type(self).__name__}({self.tensor})"

    def clone(self) -> "LiDARInstance3DBoxes":
        return type(self)(self.tensor.copy(), box_dim=self.box_dim,
                          with_yaw=self.with_yaw)

    @classmethod
    def cat(cls, boxes_list: Sequence["LiDARInstance3DBoxes"]):
        assert len(boxes_list) > 0
        b0 = boxes_list[0]
        t = np.concatenate([b.tensor for b in boxes_list], axis=0)
        return cls(t, box_dim=b0.box_dim, with_yaw=b0.with_yaw)

    # -- geometry properties ---------------------------------------------
    @property
    def volume(self) -> np.ndarray:
        return self.tensor[:, 3] * self.tensor[:, 4] * self.tensor[:, 5]

    @property
    def dims(self) -> np.ndarray:
        return self.tensor[:, 3:6]

    @property
    def yaw(self) -> np.ndarray:
        return self.tensor[:, 6]

    @property
    def height(self) -> np.ndarray:
        return self.tensor[:, 5]

    @property
    def top_height(self) -> np.ndarray:
        return self.bottom_height + self.height

    @property
    def bottom_height(self) -> np.ndarray:
        return self.tensor[:, 2]

    @property
    def center(self) -> np.ndarray:
        """Bottom center (the stored center)."""
        return self.tensor[:, :3]

    @property
    def bottom_center(self) -> np.ndarray:
        return self.tensor[:, :3]

    @property
    def gravity_center(self) -> np.ndarray:
        g = self.tensor[:, :3].copy()
        g[:, 2] += self.tensor[:, 5] * 0.5
        return g

    @property
    def corners(self) -> np.ndarray:
        """[N, 8, 3] corners (origin (0.5,0.5,0), yaw about z)."""
        return box_np_ops.center_to_corner_box3d(
            self.tensor[:, :3], self.tensor[:, 3:6], self.tensor[:, 6],
            origin=(0.5, 0.5, 0.0), axis=2)

    @property
    def bev(self) -> np.ndarray:
        """[N, 5] (x, y, dx, dy, yaw)."""
        return self.tensor[:, [0, 1, 3, 4, 6]]

    @property
    def nearest_bev(self) -> np.ndarray:
        """[N, 4] axis-aligned (x1,y1,x2,y2) after snapping yaw to 0/90."""
        bev = self.bev.copy()
        rot = box_np_ops.limit_period(bev[:, 4], 0.5, np.pi)
        swap = np.abs(rot) > np.pi / 4
        dims = np.where(swap[:, None], bev[:, [3, 2]], bev[:, 2:4])
        ctr = bev[:, :2]
        return np.concatenate([ctr - dims / 2, ctr + dims / 2], axis=1)

    # -- transforms ------------------------------------------------------
    def rotate(self, angle, points: Optional[np.ndarray] = None):
        """Rotate boxes (and optionally points) CCW around +z.

        ``angle`` may be a scalar or a 3x3 rotation matrix.  Returns the
        (rot_mat_T, rot_angle) pair when points is None for pipeline use.
        """
        if isinstance(angle, np.ndarray) and angle.size == 9:
            rot_mat_T = angle.reshape(3, 3).T.astype(np.float32)
            rot_sin = rot_mat_T[0, 1]
            rot_cos = rot_mat_T[0, 0]
            angle_val = np.arctan2(rot_sin, rot_cos)
        else:
            angle_val = float(angle)
            c, s = np.cos(angle_val), np.sin(angle_val)
            # row-vector convention: p' = p @ rot_mat_T
            rot_mat_T = np.array(
                [[c, s, 0], [-s, c, 0], [0, 0, 1]], dtype=np.float32)
        self.tensor[:, :3] = self.tensor[:, :3] @ rot_mat_T
        self.tensor[:, 6] += angle_val
        if self.box_dim > 7:
            self.tensor[:, 7:9] = self.tensor[:, 7:9] @ rot_mat_T[:2, :2]
        if points is not None:
            points[:, :3] = points[:, :3] @ rot_mat_T
            return points, rot_mat_T
        return rot_mat_T, angle_val

    def flip(self, bev_direction: str = "horizontal",
             points: Optional[np.ndarray] = None):
        """Flip in BEV. 'horizontal' flips y, 'vertical' flips x
        (matching the reference's LiDAR convention)."""
        assert bev_direction in ("horizontal", "vertical")
        if bev_direction == "horizontal":
            self.tensor[:, 1] = -self.tensor[:, 1]
            self.tensor[:, 6] = -self.tensor[:, 6]
            if self.box_dim > 7:
                self.tensor[:, 8] = -self.tensor[:, 8]
            if points is not None:
                points[:, 1] = -points[:, 1]
        else:
            self.tensor[:, 0] = -self.tensor[:, 0]
            self.tensor[:, 6] = -self.tensor[:, 6] + np.pi
            if self.box_dim > 7:
                self.tensor[:, 7] = -self.tensor[:, 7]
            if points is not None:
                points[:, 0] = -points[:, 0]
        return points

    def translate(self, trans_vector) -> None:
        self.tensor[:, :3] += np.asarray(trans_vector, dtype=np.float32)

    def scale(self, scale_factor: float) -> None:
        self.tensor[:, :6] *= scale_factor
        if self.box_dim > 7:
            self.tensor[:, 7:9] *= scale_factor

    def limit_yaw(self, offset: float = 0.5, period: float = np.pi) -> None:
        self.tensor[:, 6] = box_np_ops.limit_period(
            self.tensor[:, 6], offset, period)

    # -- queries ---------------------------------------------------------
    def in_range_bev(self, box_range) -> np.ndarray:
        return box_np_ops.in_range_bev(self.tensor, box_range)

    def in_range_3d(self, box_range) -> np.ndarray:
        return ((self.tensor[:, 0] > box_range[0]) &
                (self.tensor[:, 1] > box_range[1]) &
                (self.tensor[:, 2] > box_range[2]) &
                (self.tensor[:, 0] < box_range[3]) &
                (self.tensor[:, 1] < box_range[4]) &
                (self.tensor[:, 2] < box_range[5]))

    def points_in_boxes(self, points: np.ndarray) -> np.ndarray:
        """[P, 3+] -> bool [P, N]."""
        return box_np_ops.points_in_rbbox(points, self.tensor)

    def enlarged_box(self, extra_width: float) -> "LiDARInstance3DBoxes":
        t = self.tensor.copy()
        t[:, 3:6] += extra_width * 2
        t[:, 2] -= extra_width
        return type(self)(t, box_dim=self.box_dim, with_yaw=self.with_yaw)

    def new_box(self, data) -> "LiDARInstance3DBoxes":
        return type(self)(np.asarray(data, np.float32),
                          box_dim=self.box_dim, with_yaw=self.with_yaw)


def get_box_type(box_type: str):
    """Resolve a box type name (reference: core/bbox/structures/utils.py)."""
    box_type = box_type.lower()
    if box_type == "lidar":
        return LiDARInstance3DBoxes, 0  # Box3DMode.LIDAR == 0
    raise NotImplementedError(
        f"only 'lidar' box type is supported, got {box_type}")
