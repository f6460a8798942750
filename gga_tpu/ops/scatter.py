"""Scatter ops: pillar scatter and dynamic voxel-feature scatter.

TPU-native equivalents of mmcv's ``DynamicScatter`` CUDA op and the
reference's ``PointPillarsScatter`` middle encoder
(/root/reference/mmdet3d/models/middle_encoders/pillar_scatter.py:10) —
both are single XLA scatters / segment reductions here.
"""
from __future__ import annotations

import jax.numpy as jnp


def pillar_scatter(voxel_features, coords, valid, grid_hw):
    """Scatter pillar features onto a dense BEV canvas.

    Args:
        voxel_features: [V, C].
        coords: [V, 3] int32 (z, y, x) voxel coords (z ignored for pillars).
        valid: [V] bool (real voxels).
        grid_hw: static (H, W) = (ny, nx).

    Returns:
        [C, H, W] canvas (batch handled by vmap).
    """
    H, W = grid_hw
    y = jnp.where(valid, coords[:, 1], H)  # park invalid in overflow row
    x = jnp.where(valid, coords[:, 2], 0)
    canvas = jnp.zeros((H + 1, W, voxel_features.shape[-1]),
                       voxel_features.dtype)
    canvas = canvas.at[y, x].set(
        jnp.where(valid[:, None], voxel_features, 0.0))
    return canvas[:H].transpose(2, 0, 1)


def dynamic_scatter_mean(point_features, point_voxel_ids, valid, num_voxels):
    """Mean-reduce point features into voxels (DynamicScatter 'mean').

    Args:
        point_features: [P, C].
        point_voxel_ids: [P] int32 slot of each point in the voxel list
            (out-of-range points must carry id >= num_voxels).
        valid: [P] bool.
        num_voxels: static voxel budget V.

    Returns:
        ([V, C] means, [V] counts).
    """
    ids = jnp.where(valid, point_voxel_ids, num_voxels)
    feat = jnp.where(valid[:, None], point_features, 0.0)
    sums = jnp.zeros((num_voxels + 1, point_features.shape[-1]),
                     point_features.dtype).at[ids].add(feat)
    cnt = jnp.zeros((num_voxels + 1,), jnp.int32).at[ids].add(
        valid.astype(jnp.int32))
    mean = sums / jnp.maximum(cnt[:, None], 1)
    return mean[:num_voxels], cnt[:num_voxels]


def dynamic_scatter_max(point_features, point_voxel_ids, valid, num_voxels):
    """Max-reduce point features into voxels (DynamicScatter 'max')."""
    ids = jnp.where(valid, point_voxel_ids, num_voxels)
    neg = jnp.finfo(point_features.dtype).min
    feat = jnp.where(valid[:, None], point_features, neg)
    out = jnp.full((num_voxels + 1, point_features.shape[-1]), neg,
                   point_features.dtype).at[ids].max(feat)
    cnt = jnp.zeros((num_voxels + 1,), jnp.int32).at[ids].add(
        valid.astype(jnp.int32))
    out = jnp.where(cnt[:, None] > 0, out, 0.0)
    return out[:num_voxels], cnt[:num_voxels]


def assign_point_voxel_ids(coords_zyx_points, coords_zyx_voxels,
                           valid_points, valid_voxels, grid_zyx):
    """Map each point's voxel coord to its slot in a voxel list via sorted
    binary search (no hash tables — TPU-friendly).

    Args:
        coords_zyx_points: [P, 3] int32 per-point voxel coords (z, y, x).
        coords_zyx_voxels: [V, 3] int32 unique voxel coords.
        valid_points / valid_voxels: bool masks.
        grid_zyx: static (nz, ny, nx) for linearization.

    Returns:
        [P] int32 slot ids (V for misses / invalid points).
    """
    nz, ny, nx = grid_zyx
    big = jnp.int64(nz) * ny * nx

    def lin(c, ok):
        v = (c[:, 0].astype(jnp.int64) * ny * nx
             + c[:, 1].astype(jnp.int64) * nx + c[:, 2].astype(jnp.int64))
        return jnp.where(ok, v, big)

    vp = lin(coords_zyx_points, valid_points)
    vv = lin(coords_zyx_voxels, valid_voxels)
    order = jnp.argsort(vv)
    vv_sorted = vv[order]
    pos = jnp.searchsorted(vv_sorted, vp, method='sort')
    pos = jnp.clip(pos, 0, vv.shape[0] - 1)
    hit = (vv_sorted[pos] == vp) & valid_points & (vp < big)
    slot = order[pos]
    return jnp.where(hit, slot, coords_zyx_voxels.shape[0]).astype(jnp.int32)
