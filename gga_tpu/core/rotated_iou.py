"""Rotated (BEV) box overlap — jittable and numpy variants.

TPU-native replacement for mmcv's CUDA ``nms_rotated``/``iou3d`` kernels and
the reference's numba-CUDA ``rotate_iou_gpu_eval``
(/root/reference/mmdet3d/core/evaluation/kitti_utils/rotate_iou.py:337):
instead of a per-pair scalar kernel, the convex intersection of two rotated
rectangles is computed fully vectorized over the [N, M] pair grid:

1. all 16 edge-edge intersection points,
2. corners of each box inside the other (canonical-frame test),
3. the <= 24 candidate vertices are angle-sorted around their centroid and
   the polygon area is taken by the shoelace formula with invalid vertices
   collapsed onto the first valid vertex.

The same code runs under numpy (host eval) and jax.numpy (on-device NMS);
pass the array module via ``xp``.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _cross2(a, b):
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def _angle_sort_network(ang, pts, mask):
    """Sort the 24 candidate vertices by (angle, index) along the last
    axis with a branchless bitonic network — jnp path only.

    XLA's TPU sort over a 24-element minor axis is pathological:
    argsort + take_along_axis alone measured 46 ms of the 47 ms
    [8, 100, 100] rotated-IoU matrix (tools/microbench_rotated_iou.py),
    i.e. the entire stage-3 NMS tail. The network is ~15 rounds of
    reshape-paired min/max selects — pure elementwise VPU work, no
    gathers/sorts — and reproduces jnp.argsort's stable order exactly
    (lexicographic (key, original-index) comparisons).

    Args:
        ang: [..., 24] float keys (invalid entries pre-set to 1e9).
        pts: [..., 24, 2] payload vertices.
        mask: [..., 24] bool payload.

    Returns:
        (pts_sorted, mask_sorted) in ascending (ang, idx) order,
        padded back to 24 lanes.
    """
    n = ang.shape[-1]
    L = 1
    while L < n:
        L *= 2
    pad = L - n
    if pad:
        big = jnp.full(ang.shape[:-1] + (pad,), 2e9, ang.dtype)
        ang = jnp.concatenate([ang, big], -1)
        pts = jnp.concatenate(
            [pts, jnp.zeros(pts.shape[:-2] + (pad, 2), pts.dtype)], -2)
        mask = jnp.concatenate(
            [mask, jnp.zeros(mask.shape[:-1] + (pad,), bool)], -1)
    idx = jnp.broadcast_to(
        jnp.arange(L, dtype=jnp.int32), ang.shape).astype(jnp.int32)
    px, py = pts[..., 0], pts[..., 1]
    lanes = np.arange(L)

    import math
    for s in range(int(math.log2(L))):
        for t in range(s, -1, -1):
            d = 1 << t
            g = L // (2 * d)

            def ex(a):
                shp = a.shape[:-1] + (g, 2, d)
                return a.reshape(shp)

            ka, kb = (lambda r: (r[..., 0, :], r[..., 1, :]))(ex(ang))
            ia, ib = (lambda r: (r[..., 0, :], r[..., 1, :]))(ex(idx))
            # ascending iff block bit (s+1) of the lane index is 0
            asc = jnp.asarray(
                ((lanes.reshape(g, 2, d)[:, 0, :] >> (s + 1)) & 1) == 0)
            lt = (ka < kb) | ((ka == kb) & (ia < ib))
            swap = jnp.where(asc, ~lt, lt)

            def merge(a):
                r = ex(a)
                x0, x1 = r[..., 0, :], r[..., 1, :]
                y0 = jnp.where(swap, x1, x0)
                y1 = jnp.where(swap, x0, x1)
                return jnp.stack([y0, y1], -2).reshape(a.shape)

            ang, idx, px, py = (merge(ang), merge(idx), merge(px),
                                merge(py))
            mask = merge(mask)
    out_pts = jnp.stack([px, py], -1)
    if pad:
        return out_pts[..., :n, :], mask[..., :n]
    return out_pts, mask


def _box_corners(boxes, xp):
    """[..., 5] (x, y, dx, dy, yaw) -> [..., 4, 2] CCW corners."""
    half = boxes[..., 2:4] / 2.0
    hx, hy = half[..., 0], half[..., 1]
    local = xp.stack([
        xp.stack([hx, hy], -1),
        xp.stack([-hx, hy], -1),
        xp.stack([-hx, -hy], -1),
        xp.stack([hx, -hy], -1),
    ], axis=-2)
    c = xp.cos(boxes[..., 4])[..., None]
    s = xp.sin(boxes[..., 4])[..., None]
    rx = local[..., 0] * c - local[..., 1] * s
    ry = local[..., 0] * s + local[..., 1] * c
    rot = xp.stack([rx, ry], axis=-1)
    return rot + boxes[..., None, :2]


def _corners_in_box(corners, boxes, xp, eps=1e-5):
    """corners [..., 4, 2] tested against boxes [..., 5] -> [..., 4] bool."""
    rel = corners - boxes[..., None, :2]
    c = xp.cos(boxes[..., 4])[..., None]
    s = xp.sin(boxes[..., 4])[..., None]
    lx = rel[..., 0] * c + rel[..., 1] * s
    ly = -rel[..., 0] * s + rel[..., 1] * c
    half = boxes[..., 2:4] / 2.0
    return ((xp.abs(lx) <= half[..., 0:1] + eps)
            & (xp.abs(ly) <= half[..., 1:2] + eps))


def rotated_overlap(boxes1, boxes2, xp=jnp):
    """Pairwise intersection areas of rotated BEV rectangles.

    Args:
        boxes1: [N, 5] (x, y, dx, dy, yaw).
        boxes2: [M, 5].
        xp: numpy or jax.numpy.

    Returns:
        [N, M] intersection areas.
    """
    N, M = boxes1.shape[0], boxes2.shape[0]
    b1 = xp.broadcast_to(boxes1[:, None, :], (N, M, 5))
    b2 = xp.broadcast_to(boxes2[None, :, :], (N, M, 5))
    c1 = _box_corners(b1, xp)  # [N, M, 4, 2]
    c2 = _box_corners(b2, xp)

    # --- edge-edge intersections (16 pairs) ---
    p = c1[..., :, None, :]                      # [N, M, 4, 1, 2]
    r = (xp.roll(c1, -1, axis=-2) - c1)[..., :, None, :]
    q = c2[..., None, :, :]                      # [N, M, 1, 4, 2]
    s = (xp.roll(c2, -1, axis=-2) - c2)[..., None, :, :]
    denom = _cross2(r, s)                        # [N, M, 4, 4]
    qp = q - p
    t = _cross2(qp, s) / xp.where(denom == 0, 1.0, denom)
    u = _cross2(qp, r) / xp.where(denom == 0, 1.0, denom)
    hit = ((xp.abs(denom) > 1e-10) & (t >= 0) & (t <= 1)
           & (u >= 0) & (u <= 1))
    ipts = p + t[..., None] * r                  # [N, M, 4, 4, 2]
    ipts = ipts.reshape(N, M, 16, 2)
    hit = hit.reshape(N, M, 16)

    # --- contained corners ---
    in12 = _corners_in_box(c1, b2, xp)           # [N, M, 4]
    in21 = _corners_in_box(c2, b1, xp)

    pts = xp.concatenate([ipts, c1, c2], axis=-2)          # [N, M, 24, 2]
    mask = xp.concatenate([hit, in12, in21], axis=-1)      # [N, M, 24]

    count = mask.sum(axis=-1, keepdims=True)               # [N, M, 1]
    safe = xp.maximum(count, 1)
    centroid = (pts * mask[..., None]).sum(axis=-2,
                                           keepdims=True) / safe[..., None]
    ang = xp.arctan2(pts[..., 1] - centroid[..., 1],
                     pts[..., 0] - centroid[..., 0])
    ang = xp.where(mask, ang, 1e9)               # invalid sorted to end
    if xp is jnp:
        # bitonic network: XLA's 24-minor-axis sort costs ~46 ms at
        # [8, 100, 100] — the entire NMS tail (microbench_rotated_iou)
        pts_s, mask_s = _angle_sort_network(ang, pts, mask)
    else:
        order = xp.argsort(ang, axis=-1)
        pts_s = xp.take_along_axis(pts, order[..., None], axis=-2)
        mask_s = xp.take_along_axis(mask, order, axis=-1)
    first = pts_s[..., 0:1, :]
    pts_s = xp.where(mask_s[..., None], pts_s, first)
    nxt = xp.roll(pts_s, -1, axis=-2)
    area = 0.5 * xp.abs(_cross2(pts_s, nxt).sum(axis=-1))
    return xp.where(count[..., 0] >= 3, area, 0.0)


def rotated_iou_bev(boxes1, boxes2, xp=jnp, eps=1e-8):
    """Pairwise BEV IoU of [N, 5] x [M, 5] (x, y, dx, dy, yaw) boxes."""
    inter = rotated_overlap(boxes1, boxes2, xp)
    a1 = boxes1[:, 2] * boxes1[:, 3]
    a2 = boxes2[:, 2] * boxes2[:, 3]
    union = a1[:, None] + a2[None, :] - inter
    return inter / xp.maximum(union, eps)


def rotated_iou_3d(boxes1, boxes2, xp=jnp, eps=1e-8, mode='iou',
                   yaw_axis_z_bottom=True):
    """Pairwise 3D IoU of [N, 7] x [M, 7] bottom-center boxes
    (x, y, z, dx, dy, dz, yaw). BEV rotated overlap x z-overlap."""
    inter_bev = rotated_overlap(boxes1[:, [0, 1, 3, 4, 6]],
                                boxes2[:, [0, 1, 3, 4, 6]], xp)
    z1lo, z1hi = boxes1[:, 2], boxes1[:, 2] + boxes1[:, 5]
    z2lo, z2hi = boxes2[:, 2], boxes2[:, 2] + boxes2[:, 5]
    zoverlap = xp.maximum(
        xp.minimum(z1hi[:, None], z2hi[None, :])
        - xp.maximum(z1lo[:, None], z2lo[None, :]), 0.0)
    inter = inter_bev * zoverlap
    v1 = boxes1[:, 3] * boxes1[:, 4] * boxes1[:, 5]
    v2 = boxes2[:, 3] * boxes2[:, 4] * boxes2[:, 5]
    if mode == 'iou':
        denom = v1[:, None] + v2[None, :] - inter
    else:  # 'iof'
        denom = v1[:, None] + xp.zeros_like(v2)[None, :]
    return inter / xp.maximum(denom, eps)


def rotated_iou_camera_eval(boxes1, boxes2, criterion=-1):
    """KITTI-eval flavored rotated overlap for camera-frame boxes [N, 5]
    (x, z, l, w, ry_eval) following rotate_iou_gpu_eval semantics
    (rotate_iou.py:337): criterion -1 -> IoU denominator union, 0 -> area1,
    1 -> area2. Numpy only (host eval path)."""
    boxes1 = np.asarray(boxes1, np.float64)
    boxes2 = np.asarray(boxes2, np.float64)
    # rotate_iou uses boxes (x, y, w, h, angle) with its own corner order;
    # the polygon-intersection area is orientation-agnostic, reuse ours.
    inter = rotated_overlap(
        np.concatenate([boxes1[:, :2], boxes1[:, 2:4], -boxes1[:, 4:5]], 1),
        np.concatenate([boxes2[:, :2], boxes2[:, 2:4], -boxes2[:, 4:5]], 1),
        np)
    a1 = boxes1[:, 2] * boxes1[:, 3]
    a2 = boxes2[:, 2] * boxes2[:, 3]
    if criterion == -1:
        denom = a1[:, None] + a2[None, :] - inter
    elif criterion == 0:
        denom = np.broadcast_to(a1[:, None], inter.shape)
    elif criterion == 1:
        denom = np.broadcast_to(a2[None, :], inter.shape)
    else:
        # criterion 2: raw intersection area (rotate_iou.py devide_method
        # fall-through; consumed by d3_box_overlap, eval.py:158)
        return inter
    return inter / np.maximum(denom, 1e-8)
