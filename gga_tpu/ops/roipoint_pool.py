"""RoI point pooling: gather a fixed number of in-box points per RoI.

TPU-native rebuild of mmcv's ``RoIPointPool3d`` CUDA op as consumed by
``Single3DRoIPointExtractor``
(/root/reference/mmdet3d/models/roi_heads/roi_extractors/single_roipoint_extractor.py:33):
for each RoI collect up to ``num_sampled`` points that fall inside the
(rotated, lidar bottom-center) box, in original point order; RoIs with
fewer in-box points repeat them cyclically (the CUDA kernel's
``pooled_idx[j] = pooled_idx[j %% cnt]`` duplication); empty RoIs are
zeroed and flagged. Coordinates are then canonically transformed into
the RoI frame (center-subtract + yaw-derotate), matching the extractor.

Static shapes: one batched sort per RoI set instead of per-point atomic
scans — the [R, N] in-box mask and an argsort over keyed point indices
give the first-k in-box points per RoI.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import geometry as geo


def roipoint_pool3d(points_xyz, feats, valid, rois, num_sampled=512):
    """Pool per-RoI point features (single sample).

    Args:
        points_xyz: [N, 3] lidar coords.
        feats: [N, C] per-point features to pool alongside xyz.
        valid: [N] bool.
        rois: [R, 7] lidar bottom-center boxes.
        num_sampled: static in-box point budget per RoI.

    Returns:
        pooled: [R, num_sampled, 3 + C] — canonical xyz then features.
        empty: [R] bool, True when the RoI contains no valid point.
    """
    N = points_xyz.shape[0]
    inbox = geo.points_in_rbbox(points_xyz, rois).T  # [R, N]
    inbox = inbox & valid[None, :]

    # first-k in-box point indices per RoI, in original order
    order = jnp.arange(N, dtype=jnp.int32)
    key = jnp.where(inbox, order[None, :], N + order[None, :])
    idx = jnp.argsort(key, axis=1)[:, :num_sampled]      # [R, S]
    cnt = inbox.sum(1)                                    # [R]
    # cyclic duplication for rois with cnt < num_sampled
    slot = jnp.arange(num_sampled, dtype=jnp.int32)
    wrapped = slot[None, :] % jnp.maximum(cnt, 1)[:, None]
    idx = jnp.take_along_axis(idx, wrapped, axis=1)

    xyz = points_xyz[idx]                                 # [R, S, 3]
    f = feats[idx]                                        # [R, S, C]

    # canonical transform into the RoI frame
    rel = xyz - rois[:, None, :3]
    yaw = rois[:, 6]
    c, s = jnp.cos(-yaw), jnp.sin(-yaw)
    lx = rel[..., 0] * c[:, None] - rel[..., 1] * s[:, None]
    ly = rel[..., 0] * s[:, None] + rel[..., 1] * c[:, None]
    local = jnp.stack([lx, ly, rel[..., 2]], -1)

    pooled = jnp.concatenate([local, f], -1)
    empty = cnt == 0
    pooled = jnp.where(empty[:, None, None], 0.0, pooled)
    return pooled, empty
