"""Point containers (host-side numpy).

Thin equivalents of /root/reference/mmdet3d/core/points/ (BasePoints,
LiDARPoints, CameraPoints, DepthPoints): the device path uses raw arrays;
these exist for pipeline-code parity (flip/rotate/scale/range).
"""
from __future__ import annotations

import numpy as np

from . import np_geometry as ng


class BasePoints:
    """[N, points_dim] float array; columns 0:3 are coordinates."""

    rotation_axis = 2

    def __init__(self, tensor, points_dim=4):
        self.tensor = np.asarray(tensor, np.float32).reshape(-1, points_dim)
        self.points_dim = points_dim

    def __len__(self):
        return self.tensor.shape[0]

    def __getitem__(self, item):
        return type(self)(self.tensor[item].reshape(-1, self.points_dim),
                          self.points_dim)

    @property
    def coord(self):
        return self.tensor[:, :3]

    def shuffle(self, rng=None):
        rng = rng or np.random
        self.tensor = self.tensor[rng.permutation(len(self))]
        return self

    def rotate(self, angle, axis=None):
        axis = self.rotation_axis if axis is None else axis
        rot = ng.rotation_matrix_3d(np.float64(angle), axis=axis)
        self.tensor[:, :3] = (self.tensor[:, :3]
                              @ rot.astype(np.float32))
        return self

    def scale(self, factor):
        self.tensor[:, :3] *= factor
        return self

    def translate(self, trans):
        self.tensor[:, :3] += np.asarray(trans, np.float32)
        return self

    def in_range_3d(self, pc_range):
        r = np.asarray(pc_range)
        c = self.tensor
        return ((c[:, 0] > r[0]) & (c[:, 1] > r[1]) & (c[:, 2] > r[2])
                & (c[:, 0] < r[3]) & (c[:, 1] < r[4]) & (c[:, 2] < r[5]))

    def cat(self, others):
        arrs = [self.tensor] + [o.tensor for o in others]
        return type(self)(np.concatenate(arrs), self.points_dim)


class LiDARPoints(BasePoints):
    rotation_axis = 2

    def flip(self, bev_direction='horizontal'):
        if bev_direction == 'horizontal':
            self.tensor[:, 1] = -self.tensor[:, 1]
        else:
            self.tensor[:, 0] = -self.tensor[:, 0]
        return self


class DepthPoints(BasePoints):
    rotation_axis = 2

    def flip(self, bev_direction='horizontal'):
        if bev_direction == 'horizontal':
            self.tensor[:, 0] = -self.tensor[:, 0]
        else:
            self.tensor[:, 1] = -self.tensor[:, 1]
        return self


class CameraPoints(BasePoints):
    rotation_axis = 1

    def flip(self, bev_direction='horizontal'):
        if bev_direction == 'horizontal':
            self.tensor[:, 0] = -self.tensor[:, 0]
        else:
            self.tensor[:, 2] = -self.tensor[:, 2]
        return self
