"""Jittable (jax.numpy) 3D box geometry.

Re-implements the geometric semantics of the reference's box structures and
``box_np_ops`` for on-device use, TPU-first: all functions are pure, take
fixed-shape arrays, and are safe under ``jax.jit``/``vmap``.

Reference semantics reproduced here (cited for parity checking):
- rotation_3d_in_axis: /root/reference/mmdet3d/core/bbox/structures/utils.py:29
- LiDAR box convention (yaw about z, 0 at +x, CCW; bottom-center origin
  (0.5, 0.5, 0)): /root/reference/mmdet3d/core/bbox/structures/lidar_box3d.py:11
- Camera box convention (yaw about y; origin (0.5, 1.0, 0.5)):
  /root/reference/mmdet3d/core/bbox/structures/cam_box3d.py
- corner ordering: unravel_index(arange(8), [2]*3) reordered by
  [0, 1, 3, 2, 4, 5, 7, 6] (lidar_box3d.py:78-80)
- xywhr2xyxyr: /root/reference/mmdet3d/core/bbox/structures/utils.py:120

Boxes are plain arrays ``[N, 7]``: (x, y, z, dx, dy, dz, yaw).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Corner ordering shared with the reference: 8 binary corners of the unit
# cube, reordered so BEV faces walk clockwise (see lidar_box3d.py:52-80).
_CORNER_ORDER = np.stack(np.unravel_index(np.arange(8), [2] * 3), axis=1)[
    [0, 1, 3, 2, 4, 5, 7, 6]
].astype(np.float32)  # [8, 3] in {0,1}

# LiDAR boxes: bottom-center origin. Camera boxes: (0.5, 1.0, 0.5).
LIDAR_ORIGIN = (0.5, 0.5, 0.0)
CAMERA_ORIGIN = (0.5, 1.0, 0.5)
DEPTH_ORIGIN = (0.5, 0.5, 0.0)


def rotation_matrix_3d(angles, axis=2, clockwise=False):
    """Right-multiplication rotation matrices ``M`` with ``p_rot = p @ M``.

    Matches reference rotation_3d_in_axis (structures/utils.py:29): for
    axis=2 and clockwise=False, ``x' = x cos - y sin`` (CCW about +z).

    Args:
        angles: [...] array of angles (radians).
        axis: rotation axis (0, 1 or 2).
        clockwise: if True, transpose (i.e. rotate by -angle).

    Returns:
        [..., 3, 3] rotation matrices.
    """
    angles = jnp.asarray(angles)
    c = jnp.cos(angles)
    s = jnp.sin(angles)
    one = jnp.ones_like(c)
    zero = jnp.zeros_like(c)
    if axis in (1, -2):
        rows = [[c, zero, -s], [zero, one, zero], [s, zero, c]]
    elif axis in (2, -1):
        rows = [[c, s, zero], [-s, c, zero], [zero, zero, one]]
    elif axis in (0, -3):
        rows = [[one, zero, zero], [zero, c, s], [zero, -s, c]]
    else:
        raise ValueError(f'axis should be in [-3, 2], got {axis}')
    mat = jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)
    if clockwise:
        mat = jnp.swapaxes(mat, -1, -2)
    return mat


def rotation_matrix_2d(angles, clockwise=False):
    """[..., 2, 2] right-multiplication rotation matrices (CCW default)."""
    angles = jnp.asarray(angles)
    c = jnp.cos(angles)
    s = jnp.sin(angles)
    mat = jnp.stack(
        [jnp.stack([c, s], axis=-1), jnp.stack([-s, c], axis=-1)], axis=-2)
    if clockwise:
        mat = jnp.swapaxes(mat, -1, -2)
    return mat


def rotate_points(points, angles, axis=2, clockwise=False):
    """Rotate points by per-box angles.

    Args:
        points: [..., M, D] with D in (2, 3); leading dims broadcast
            against ``angles``.
        angles: [...] angles.

    Returns:
        rotated points, same shape.
    """
    points = jnp.asarray(points)
    if points.shape[-1] == 2:
        mat = rotation_matrix_2d(angles, clockwise)
    else:
        mat = rotation_matrix_3d(angles, axis, clockwise)
    # HIGHEST: geometry must stay fp32 on TPU (default einsum precision is
    # bf16 on the MXU — a ~1e-3 error that breaks box/NMS parity). These
    # contractions are tiny, so there is no MXU throughput to lose.
    return jnp.einsum('...md,...de->...me', points, mat,
                      precision=jax.lax.Precision.HIGHEST)


def corners_3d(centers, dims, angles, origin=LIDAR_ORIGIN, axis=2):
    """Boxes (center, dim, yaw) -> 8 corners, reference corner ordering.

    Matches box_np_ops.center_to_corner_box3d
    (/root/reference/mmdet3d/core/bbox/box_np_ops.py:171).

    Args:
        centers: [N, 3] box origin points (meaning set by ``origin``).
        dims: [N, 3] sizes.
        angles: [N] yaw.
        origin: relative origin within the box; (0.5, 0.5, 0) means
            ``centers`` are bottom centers (LiDAR convention).
        axis: yaw axis (2 for LiDAR/depth, 1 for camera).

    Returns:
        [N, 8, 3] corner coordinates.
    """
    corners_norm = jnp.asarray(_CORNER_ORDER) - jnp.asarray(origin,
                                                            jnp.float32)
    corners = dims[..., None, :] * corners_norm  # [N, 8, 3]
    corners = rotate_points(corners, angles, axis=axis)
    return corners + centers[..., None, :]


def boxes7_to_corners(boxes, origin=LIDAR_ORIGIN, axis=2):
    """[N, 7] boxes -> [N, 8, 3] corners."""
    return corners_3d(boxes[..., :3], boxes[..., 3:6], boxes[..., 6],
                      origin=origin, axis=axis)


def bev_corners(boxes_xywhr):
    """BEV rotated rectangles -> 4 corners.

    Args:
        boxes_xywhr: [..., 5] (cx, cy, dx, dy, yaw), yaw CCW about +z.

    Returns:
        [..., 4, 2] corner coords, counter-clockwise.
    """
    boxes_xywhr = jnp.asarray(boxes_xywhr)
    half = boxes_xywhr[..., 2:4] / 2.0
    hx, hy = half[..., 0], half[..., 1]
    local = jnp.stack([
        jnp.stack([hx, hy], -1),
        jnp.stack([-hx, hy], -1),
        jnp.stack([-hx, -hy], -1),
        jnp.stack([hx, -hy], -1),
    ], axis=-2)  # [..., 4, 2]
    rot = rotate_points(local, boxes_xywhr[..., 4])
    return rot + boxes_xywhr[..., None, :2]


def xywhr2xyxyr(boxes_xywhr):
    """Rotated XYWHR -> XYXYR (axis-aligned extent + yaw).

    Matches structures/utils.py:120.
    """
    half_w = boxes_xywhr[..., 2] / 2
    half_h = boxes_xywhr[..., 3] / 2
    return jnp.stack([
        boxes_xywhr[..., 0] - half_w,
        boxes_xywhr[..., 1] - half_h,
        boxes_xywhr[..., 0] + half_w,
        boxes_xywhr[..., 1] + half_h,
        boxes_xywhr[..., 4],
    ], axis=-1)


def gravity_center(boxes):
    """[N, 7] bottom-center boxes -> [N, 3] gravity centers
    (lidar_box3d.py:40)."""
    return jnp.concatenate(
        [boxes[..., :2], (boxes[..., 2] + boxes[..., 5] * 0.5)[..., None]],
        axis=-1)


def points_in_rbbox(points, boxes, origin=LIDAR_ORIGIN):
    """Mask of points inside rotated 3D boxes.

    Reference: box_np_ops.points_in_rbbox
    (/root/reference/mmdet3d/core/bbox/box_np_ops.py:353), reimplemented by
    transforming points into each box's canonical frame (no surface tests —
    cheaper and exact for rectangular boxes).

    Args:
        points: [P, 3+] point coordinates.
        boxes: [N, 7] (x, y, z, dx, dy, dz, yaw) with ``origin`` semantics.

    Returns:
        [P, N] boolean mask.
    """
    centers = boxes[..., :3] + boxes[..., 3:6] * (
        0.5 - jnp.asarray(origin, jnp.float32))  # gravity centers
    rel = points[:, None, :3] - centers[None, :, :]  # [P, N, 3]
    # rotate into box frame: inverse of CCW yaw rotation = clockwise
    c = jnp.cos(boxes[..., 6])
    s = jnp.sin(boxes[..., 6])
    local_x = rel[..., 0] * c + rel[..., 1] * s
    local_y = -rel[..., 0] * s + rel[..., 1] * c
    local_z = rel[..., 2]
    half = boxes[..., 3:6] / 2.0
    return ((jnp.abs(local_x) <= half[..., 0])
            & (jnp.abs(local_y) <= half[..., 1])
            & (jnp.abs(local_z) <= half[..., 2]))


def project_to_image(pts_3d, proj_mat):
    """Project 3D points with a 4x4 projection (e.g. lidar2img).

    Args:
        pts_3d: [..., N, 3].
        proj_mat: [..., 4, 4] (broadcastable).

    Returns:
        (pixels [..., N, 2], depth [..., N]).
    """
    ones = jnp.ones_like(pts_3d[..., :1])
    hom = jnp.concatenate([pts_3d, ones], axis=-1)
    cam = jnp.einsum('...ij,...nj->...ni', proj_mat, hom,
                     precision=jax.lax.Precision.HIGHEST)
    depth = cam[..., 2]
    pix = cam[..., :2] / jnp.maximum(depth[..., None], 1e-5)
    return pix, depth


def limit_period(val, offset=0.5, period=jnp.pi):
    """Limit value into [-offset*period, (1-offset)*period).

    Matches structures/utils.py limit_period.
    """
    return val - jnp.floor(val / period + offset) * period


def center_to_corner_box2d(centers, dims, angles):
    """BEV boxes -> [N, 4, 2] corners with the reference's 2D corner
    ordering (box_np_ops.center_to_corner_box2d): origin (0.5, 0.5), corners
    order [(0,0),(0,1),(1,1),(1,0)] - origin, rotated CCW."""
    corners_norm = jnp.asarray(
        [[-0.5, -0.5], [-0.5, 0.5], [0.5, 0.5], [0.5, -0.5]], jnp.float32)
    corners = dims[..., None, :] * corners_norm
    corners = rotate_points(corners, angles)
    return corners + centers[..., None, :]
