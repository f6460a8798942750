"""Voxel feature encoders.

Flax equivalents of the reference voxel encoders
(/root/reference/mmdet3d/models/voxel_encoders/): everything operates on the
static padded [V, max_points, C] voxel buffers of ``ops.voxelize``.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
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


class DynamicVFE(nn.Module):
    """Dynamic voxel feature encoder (voxel_encoder.py:88 DynamicVFE).

    Decorates per-point features with cluster-mean and voxel-center
    offsets, runs Linear+BN+ReLU layers with voxel-pooled context
    concatenated back between layers (scatter-max + gather), and
    optionally fuses per-point image features via a fusion layer before
    the final scatter. TPU-first: fixed budgets, segment ops over
    point->voxel ids (sorted-voxel invariant preserved).
    """
    feat_channels: Tuple[int, ...] = (64, 64)
    voxel_size: Tuple[float, float, float] = (0.05, 0.05, 0.1)
    point_cloud_range: Tuple[float, ...] = (0, -40, -3, 70.4, 40, 1)
    max_voxels: int = 16000
    with_cluster_center: bool = True
    with_voxel_center: bool = True
    with_distance: bool = False

    @nn.compact
    def __call__(self, points, ids, pok, coords, vvalid, train: bool = True,
                 fusion=None):
        """points [B, P, C]; ids [B, P] point->voxel slot; pok [B, P];
        coords [B, V, 3] (z, y, x); vvalid [B, V]. ``fusion``: optional
        callable(point_feats, pok) -> point_feats applied before the last
        scatter (the reference's fusion_layer hook).

        Returns voxel features [B, V, feat_channels[-1]].
        """
        from ..ops.scatter import dynamic_scatter_max, dynamic_scatter_mean

        V = self.max_voxels
        pts_xyz = points[..., :3]
        parts = [points]
        if self.with_cluster_center:
            vmean, _ = jax.vmap(lambda p, i, o: dynamic_scatter_mean(
                p, i, o, V))(points, ids, pok)
            mean_pt = jax.vmap(lambda m, i: m[jnp.clip(i, 0, V - 1)]
                               )(vmean, ids)
            parts.append(pts_xyz - mean_pt[..., :3])
        if self.with_voxel_center:
            vsz = jnp.asarray(self.voxel_size, jnp.float32)
            off = jnp.asarray(self.point_cloud_range[:3], jnp.float32)
            cz = jax.vmap(lambda cc, i: cc[jnp.clip(i, 0, V - 1)]
                          )(coords, ids)
            centers = (cz[..., ::-1].astype(jnp.float32) + 0.5) * vsz + off
            parts.append(pts_xyz - centers)
        if self.with_distance:
            parts.append(jnp.linalg.norm(pts_xyz, axis=-1, keepdims=True))
        feats = jnp.where(pok[..., None], jnp.concatenate(parts, -1), 0.0)

        vfeat = None
        for i, ch in enumerate(self.feat_channels):
            feats = nn.Dense(ch, use_bias=False, name=f'vfe{i}')(feats)
            feats = MaskedBatchNorm(name=f'vfe_bn{i}')(feats, pok, train)
            feats = nn.relu(feats)
            last = i == len(self.feat_channels) - 1
            if last and fusion is not None:
                feats = fusion(feats, pok)
            vfeat, _ = jax.vmap(lambda f, i_, o: dynamic_scatter_max(
                f, i_, o, V))(feats, ids, pok)
            if not last:
                back = jax.vmap(lambda vf, i_: vf[jnp.clip(i_, 0, V - 1)]
                                )(vfeat, ids)
                feats = jnp.concatenate([feats, back], axis=-1)
                feats = jnp.where(pok[..., None], feats, 0.0)
        return jnp.where(vvalid[..., None], vfeat, 0.0)
