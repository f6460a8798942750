"""3D anchor generation.

Jittable rebuild of AlignedAnchor3DRangeGenerator
(/root/reference/mmdet3d/core/anchor/anchor_3d_generator.py:225): anchor
centers aligned with feature-grid voxel centers; one (range, size) pair per
class, ``rotations`` copies per location.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def aligned_anchors_single_range(feature_size, anchor_range, size,
                                 rotations=(0.0, 1.5707963)):
    """Anchors for one class on one feature map.

    Args:
        feature_size: (H, W) BEV feature map size.
        anchor_range: (x0, y0, z0, x1, y1, z1).
        size: (dx, dy, dz).
        rotations: yaw values per location.

    Returns:
        [H, W, len(rotations), 7] anchors (x, y, z, dx, dy, dz, yaw) with
        z at the configured center.
    """
    H, W = feature_size
    r = np.asarray(anchor_range, np.float32)
    # align_corner=False: centers at voxel centers of an (H, W) grid
    xs = r[0] + (np.arange(W, dtype=np.float32) + 0.5) * (r[3] - r[0]) / W
    ys = r[1] + (np.arange(H, dtype=np.float32) + 0.5) * (r[4] - r[1]) / H
    z = (r[2] + r[5]) / 2.0
    xx, yy = np.meshgrid(xs, ys)                      # [H, W]
    rot = np.asarray(rotations, np.float32)
    R = len(rot)
    out = np.zeros((H, W, R, 7), np.float32)
    out[..., 0] = xx[..., None]
    out[..., 1] = yy[..., None]
    out[..., 2] = z
    out[..., 3:6] = np.asarray(size, np.float32)
    out[..., 6] = rot
    return jnp.asarray(out)


def multiclass_anchors(feature_size, ranges, sizes,
                       rotations=(0.0, 1.5707963)):
    """Per-class anchors stacked: [num_classes, H*W*R, 7]."""
    per_cls = [
        aligned_anchors_single_range(feature_size, r, s, rotations)
        .reshape(-1, 7)
        for r, s in zip(ranges, sizes)]
    return jnp.stack(per_cls)
