"""Voxel feature encoders.

Flax equivalents of the reference voxel encoders
(/root/reference/mmdet3d/models/voxel_encoders/): everything operates on the
static padded [V, max_points, C] voxel buffers of ``ops.voxelize``.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .layers import MaskedBatchNorm


class HardSimpleVFE(nn.Module):
    """Mean of the points in each voxel (voxel_encoder.py:14). Stateless."""
    num_features: int = 4

    @nn.compact
    def __call__(self, voxels, num_points):
        """voxels: [..., V, P, C]; num_points: [..., V] -> [..., V, C]."""
        s = voxels[..., :self.num_features].sum(axis=-2)
        return s / jnp.maximum(num_points[..., None], 1).astype(s.dtype)


class PillarFeatureNet(nn.Module):
    """PointPillars feature net (pillar_encoder.py:13).

    Augments each point with its offset to the pillar points-mean
    (f_cluster) and to the pillar center (f_center), then PFNLayer(s):
    linear + BN + ReLU + max over points.
    """
    in_channels: int = 4
    feat_channels: Tuple[int, ...] = (64,)
    with_distance: bool = False
    voxel_size: Tuple[float, float, float] = (0.16, 0.16, 4.0)
    point_cloud_range: Sequence[float] = (0, -39.68, -3, 69.12, 39.68, 1)

    @nn.compact
    def __call__(self, voxels, num_points, coords, train: bool = True):
        """voxels [B, V, P, C]; num_points [B, V]; coords [B, V, 3] (z,y,x).

        Returns [B, V, feat_channels[-1]].
        """
        P = voxels.shape[-2]
        cnt = jnp.maximum(num_points, 1)[..., None, None].astype(jnp.float32)
        pt_idx = jnp.arange(P)
        pmask = (pt_idx[None, None, :] < num_points[..., None])[..., None]

        mean = voxels[..., :3].sum(axis=-2, keepdims=True) / cnt
        f_cluster = voxels[..., :3] - mean

        vx, vy = self.voxel_size[0], self.voxel_size[1]
        x0, y0 = self.point_cloud_range[0], self.point_cloud_range[1]
        cx = (coords[..., 2:3].astype(jnp.float32) * vx + vx / 2 + x0)
        cy = (coords[..., 1:2].astype(jnp.float32) * vy + vy / 2 + y0)
        f_center = jnp.stack([
            voxels[..., 0] - cx, voxels[..., 1] - cy], axis=-1)

        feats = [voxels, f_cluster, f_center]
        if self.with_distance:
            feats.append(jnp.linalg.norm(voxels[..., :3], axis=-1,
                                         keepdims=True))
        x = jnp.concatenate(feats, axis=-1) * pmask

        for i, ch in enumerate(self.feat_channels):
            x = nn.Dense(ch, use_bias=False,
                         kernel_init=nn.initializers.variance_scaling(
                             1 / 3, 'fan_in', 'uniform'))(x)
            bn = MaskedBatchNorm()
            flat_valid = jnp.broadcast_to(
                pmask[..., 0], x.shape[:-1])
            x = bn(x, flat_valid, train)
            x = nn.relu(x)
            pooled = jnp.max(jnp.where(pmask, x, -jnp.inf), axis=-2)
            pooled = jnp.where(num_points[..., None] > 0, pooled, 0.0)
            if i < len(self.feat_channels) - 1:
                x = jnp.concatenate(
                    [x, jnp.broadcast_to(pooled[..., None, :], x.shape)],
                    axis=-1) * pmask
        return pooled


class DynamicSimpleVFE(nn.Module):
    """Mean over dynamically scattered points (voxel_encoder.py:49) — the
    scatter itself happens in ops.scatter.dynamic_scatter_mean; this module
    is an alias kept for config parity."""
    num_features: int = 4

    def __call__(self, voxel_mean):
        return voxel_mean[..., :self.num_features]
