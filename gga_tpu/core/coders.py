"""Box coders.

Jittable rebuild of DeltaXYZWLHRBBoxCoder
(/root/reference/mmdet3d/core/bbox/coders/delta_xyzwhlr_bbox_coder.py):
SECOND-style residual encoding against anchors with diagonal
normalization.
"""
from __future__ import annotations

import jax.numpy as jnp


def delta_encode(boxes, anchors):
    """[..., 7] GT boxes vs anchors -> deltas (xt..rt)."""
    xa, ya, za, wa, la, ha, ra = jnp.split(anchors, 7, axis=-1)
    xg, yg, zg, wg, lg, hg, rg = jnp.split(boxes, 7, axis=-1)
    za = za + ha / 2
    zg = zg + hg / 2
    diag = jnp.sqrt(la ** 2 + wa ** 2)
    xt = (xg - xa) / diag
    yt = (yg - ya) / diag
    zt = (zg - za) / ha
    lt = jnp.log(jnp.maximum(lg, 1e-6) / la)
    wt = jnp.log(jnp.maximum(wg, 1e-6) / wa)
    ht = jnp.log(jnp.maximum(hg, 1e-6) / ha)
    rt = rg - ra
    return jnp.concatenate([xt, yt, zt, wt, lt, ht, rt], axis=-1)


def delta_decode(deltas, anchors):
    """Inverse of delta_encode -> [..., 7] boxes (bottom-center z)."""
    xa, ya, za, wa, la, ha, ra = jnp.split(anchors, 7, axis=-1)
    xt, yt, zt, wt, lt, ht, rt = jnp.split(deltas, 7, axis=-1)
    za = za + ha / 2
    diag = jnp.sqrt(la ** 2 + wa ** 2)
    xg = xt * diag + xa
    yg = yt * diag + ya
    zg = zt * ha + za
    lg = jnp.exp(lt) * la
    wg = jnp.exp(wt) * wa
    hg = jnp.exp(ht) * ha
    rg = rt + ra
    zg = zg - hg / 2
    return jnp.concatenate([xg, yg, zg, wg, lg, hg, rg], axis=-1)


def point_xyzwhlr_encode(gt_boxes, points, labels, mean_sizes):
    """Point-based box encoding (PointXYZWHLRBBoxCoder.encode,
    /root/reference/mmdet3d/core/bbox/coders/point_xyzwhlr_bbox_coder.py:31)
    with per-class mean sizes.

    Args:
        gt_boxes: [..., 7] GRAVITY-center boxes (x, y, z, dx, dy, dz, r).
        points: [..., 3] anchor points.
        labels: [...] int class per target.
        mean_sizes: [K, 3] per-class mean (dx, dy, dz).

    Returns [..., 8]: (xt, yt, zt, log-dims x3, cos r, sin r).
    """
    mean = jnp.asarray(mean_sizes, jnp.float32)[labels]        # [..., 3]
    dims = jnp.maximum(gt_boxes[..., 3:6], 1e-5)
    diag = jnp.sqrt(mean[..., 0] ** 2 + mean[..., 1] ** 2)
    xt = (gt_boxes[..., 0] - points[..., 0]) / diag
    yt = (gt_boxes[..., 1] - points[..., 1]) / diag
    zt = (gt_boxes[..., 2] - points[..., 2]) / mean[..., 2]
    dt = jnp.log(dims / mean)
    r = gt_boxes[..., 6]
    return jnp.concatenate(
        [jnp.stack([xt, yt, zt], -1), dt,
         jnp.stack([jnp.cos(r), jnp.sin(r)], -1)], -1)


def point_xyzwhlr_decode(encodings, points, labels, mean_sizes):
    """Inverse of :func:`point_xyzwhlr_encode` (decode:200). Returns
    [..., 7] gravity-center boxes."""
    mean = jnp.asarray(mean_sizes, jnp.float32)[labels]
    diag = jnp.sqrt(mean[..., 0] ** 2 + mean[..., 1] ** 2)
    x = encodings[..., 0] * diag + points[..., 0]
    y = encodings[..., 1] * diag + points[..., 1]
    z = encodings[..., 2] * mean[..., 2] + points[..., 2]
    dims = jnp.exp(encodings[..., 3:6]) * mean
    # guarded atan2: (0, 0) has NaN grad that leaks through masked losses
    cos, sin = encodings[..., 6], encodings[..., 7]
    safe = (jnp.abs(cos) + jnp.abs(sin)) > 1e-8
    r = jnp.arctan2(jnp.where(safe, sin, 0.0),
                    jnp.where(safe, cos, 1.0))
    return jnp.concatenate(
        [jnp.stack([x, y, z], -1), dims, r[..., None]], -1)
