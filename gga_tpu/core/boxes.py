"""Host-side 3D box containers (numpy).

Thin, functional-style replacements for the reference's box structure
classes (/root/reference/mmdet3d/core/bbox/structures/): the device path in
this framework works on raw ``[N, 7]`` arrays (see ``gga_tpu.core.geometry``),
so these classes exist only for the host data pipeline (dataset loading,
augmentation, format conversion) where ragged numpy is fine.

Conventions (identical to the reference dev-1.0 coordinate refactor):
- LiDARBoxes3D: (x, y, z, dx, dy, dz, yaw); bottom center; yaw about +z,
  0 at +x, CCW (lidar_box3d.py:11-27).
- CameraBoxes3D: (x, y, z, dx, dy, dz, yaw); origin (0.5, 1.0, 0.5); yaw
  about y (cam_box3d.py).
- DepthBoxes3D: like LiDAR but in depth coords (x right, y front, z up).
"""
from __future__ import annotations

import numpy as np

from . import np_geometry as ng


class BaseBoxes3D:
    """[N, box_dim] float array of boxes + convention metadata."""

    origin = (0.5, 0.5, 0.0)
    yaw_axis = 2

    def __init__(self, tensor, box_dim=7):
        tensor = np.asarray(tensor, dtype=np.float32).reshape(-1, box_dim)
        self.tensor = tensor
        self.box_dim = box_dim

    def __len__(self):
        return self.tensor.shape[0]

    def __getitem__(self, item):
        return type(self)(self.tensor[item].reshape(-1, self.box_dim),
                          self.box_dim)

    @property
    def dims(self):
        return self.tensor[:, 3:6]

    @property
    def yaw(self):
        return self.tensor[:, 6]

    @property
    def bottom_center(self):
        return self.tensor[:, :3] + self.dims * (
            np.array([0.5, 0.5, 0.0]) - np.array(self.origin))

    @property
    def gravity_center(self):
        return self.tensor[:, :3] + self.dims * (
            np.array([0.5, 0.5, 0.5]) - np.array(self.origin))

    @property
    def corners(self):
        """[N, 8, 3] corners, reference ordering."""
        return ng.center_to_corner_box3d(
            self.tensor[:, :3], self.dims, self.yaw,
            origin=self.origin, axis=self.yaw_axis)

    @property
    def volume(self):
        return self.dims.prod(axis=1)

    def copy(self):
        return type(self)(self.tensor.copy(), self.box_dim)


class LiDARBoxes3D(BaseBoxes3D):
    """LiDAR-frame boxes; the training-path native format."""

    origin = (0.5, 0.5, 0.0)
    yaw_axis = 2

    @property
    def bev(self):
        """[N, 5] (x, y, dx, dy, yaw) BEV boxes (base_box3d.py:138)."""
        return self.tensor[:, [0, 1, 3, 4, 6]]

    @property
    def nearest_bev(self):
        """Axis-aligned BEV [N, 4] by snapping yaw to the nearest axis."""
        bev = self.bev.copy()
        rot = ng.limit_period(bev[:, -1], 0.5, np.pi)
        swap = np.abs(rot) > np.pi / 4
        dims = np.where(swap[:, None], bev[:, [3, 2]], bev[:, [2, 3]])
        return np.concatenate(
            [bev[:, :2] - dims / 2, bev[:, :2] + dims / 2], axis=-1)

    def rotate(self, angle, points=None):
        """Rotate boxes (and optionally points) CCW about +z by ``angle``.

        Matches LiDARInstance3DBoxes.rotate (base/lidar box semantics:
        points and centers multiply the same rot_mat_T).
        """
        rot_mat_T = ng.rotation_matrix_3d(np.float64(angle), axis=2)
        self.tensor[:, :3] = self.tensor[:, :3] @ rot_mat_T.astype(np.float32)
        self.tensor[:, 6] += angle
        if points is not None:
            points[:, :3] = points[:, :3] @ rot_mat_T.astype(points.dtype)
        return points

    def flip(self, bev_direction='horizontal', points=None):
        """Flip boxes in BEV. horizontal: y -> -y; vertical: x -> -x
        (lidar_box3d.py flip)."""
        if bev_direction == 'horizontal':
            self.tensor[:, 1] = -self.tensor[:, 1]
            self.tensor[:, 6] = -self.tensor[:, 6]
            if points is not None:
                points[:, 1] = -points[:, 1]
        elif bev_direction == 'vertical':
            self.tensor[:, 0] = -self.tensor[:, 0]
            self.tensor[:, 6] = -(self.tensor[:, 6] + np.pi)
            if points is not None:
                points[:, 0] = -points[:, 0]
        return points

    def scale(self, factor, points=None):
        self.tensor[:, :6] *= factor
        if points is not None:
            points[:, :3] *= factor
        return points

    def translate(self, trans, points=None):
        self.tensor[:, :3] += np.asarray(trans, dtype=np.float32)
        if points is not None:
            points[:, :3] += np.asarray(trans, dtype=points.dtype)
        return points

    def in_range_bev(self, box_range):
        """Boxes whose BEV center lies in [x0, y0, x1, y1]
        (base_box3d.in_range_bev)."""
        return ((self.tensor[:, 0] > box_range[0])
                & (self.tensor[:, 1] > box_range[1])
                & (self.tensor[:, 0] < box_range[2])
                & (self.tensor[:, 1] < box_range[3]))

    def points_in_boxes(self, points):
        """[P, N] mask."""
        return ng.points_in_rbbox(points, self.tensor[:, :7])

    def limit_yaw(self, offset=0.5, period=np.pi * 2):
        self.tensor[:, 6] = ng.limit_period(self.tensor[:, 6], offset, period)

    def convert_to_camera(self, rect, Trv2c):
        """-> CameraBoxes3D (KITTI)."""
        cam = ng.box_lidar_to_camera(self.tensor[:, :7], rect, Trv2c)
        return CameraBoxes3D(cam)


class CameraBoxes3D(BaseBoxes3D):
    """Camera-frame boxes, KITTI label convention (x, y, z, l, h, w, ry)
    stored as (x, y, z, dx=l, dy=h, dz=w, yaw=ry) with origin
    (0.5, 1.0, 0.5)."""

    origin = (0.5, 1.0, 0.5)
    yaw_axis = 1

    def convert_to_lidar(self, rect, Trv2c):
        """-> LiDARBoxes3D via box_camera_to_lidar. The camera tensor here
        is (x, y, z, l, h, w, ry) exactly as read from KITTI labels."""
        lidar = ng.box_camera_to_lidar(self.tensor[:, :7], rect, Trv2c)
        return LiDARBoxes3D(lidar)


class DepthBoxes3D(BaseBoxes3D):
    """Depth-frame boxes (indoor datasets; x right, y front, z up)."""

    origin = (0.5, 0.5, 0.0)
    yaw_axis = 2

    @property
    def bev(self):
        return self.tensor[:, [0, 1, 3, 4, 6]]

    def rotate(self, angle, points=None):
        rot_mat_T = ng.rotation_matrix_3d(np.float64(angle), axis=2)
        self.tensor[:, :3] = self.tensor[:, :3] @ rot_mat_T.astype(np.float32)
        if self.box_dim > 6:
            self.tensor[:, 6] += angle
        if points is not None:
            points[:, :3] = points[:, :3] @ rot_mat_T.astype(points.dtype)
        return points

    def flip(self, bev_direction='horizontal', points=None):
        if bev_direction == 'horizontal':
            self.tensor[:, 0] = -self.tensor[:, 0]
            if self.box_dim > 6:
                self.tensor[:, 6] = -(self.tensor[:, 6] + np.pi)
            if points is not None:
                points[:, 0] = -points[:, 0]
        else:
            self.tensor[:, 1] = -self.tensor[:, 1]
            if self.box_dim > 6:
                self.tensor[:, 6] = -self.tensor[:, 6]
            if points is not None:
                points[:, 1] = -points[:, 1]
        return points
