"""Reusable loss functions.

Jittable equivalents of /root/reference/mmdet3d/models/losses/: chamfer
distance, axis-aligned / rotated 3D IoU losses, uncertain smooth-L1,
multi-bin, plus the common focal / smooth-L1 / gaussian-focal already used
across the heads (re-exported here for API parity).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.gaussian import gaussian_focal_loss  # noqa: F401 (re-export)
from ..core.rotated_iou import rotated_overlap


def smooth_l1_loss(pred, target, beta=1.0):
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def focal_loss(logits, labels, num_classes, gamma=2.0, alpha=0.25):
    """Sigmoid focal loss; labels == num_classes means background."""
    onehot = jax.nn.one_hot(labels, num_classes)
    p = jax.nn.sigmoid(logits)
    pt = p * onehot + (1 - p) * (1 - onehot)
    w = alpha * onehot + (1 - alpha) * (1 - onehot)
    ce = -(onehot * jax.nn.log_sigmoid(logits)
           + (1 - onehot) * jax.nn.log_sigmoid(-logits))
    return (w * (1 - pt) ** gamma * ce).sum(-1)


def chamfer_distance(src, dst, src_valid=None, dst_valid=None, mode='l2'):
    """Bidirectional chamfer distance (losses/chamfer_distance.py).

    Args:
        src: [N, D]; dst: [M, D].

    Returns:
        (loss_src [N], loss_dst [M], idx_src [N], idx_dst [M]).
    """
    d = jnp.sum((src[:, None, :] - dst[None, :, :]) ** 2, -1)
    if mode == 'l1':
        d = jnp.sqrt(jnp.maximum(d, 1e-12))
    if dst_valid is not None:
        d = jnp.where(dst_valid[None, :], d, 1e12)
    if src_valid is not None:
        d = jnp.where(src_valid[:, None], d, 1e12)
    loss_src = d.min(-1)
    idx_src = d.argmin(-1)
    loss_dst = d.min(0)
    idx_dst = d.argmin(0)
    return loss_src, loss_dst, idx_src, idx_dst


def axis_aligned_iou_loss(pred, target):
    """1 - IoU of [..., 6] (x1, y1, z1, x2, y2, z2) boxes
    (losses/axis_aligned_iou_loss.py)."""
    lo = jnp.maximum(pred[..., :3], target[..., :3])
    hi = jnp.minimum(pred[..., 3:], target[..., 3:])
    inter = jnp.prod(jnp.maximum(hi - lo, 0.0), -1)
    vp = jnp.prod(jnp.maximum(pred[..., 3:] - pred[..., :3], 0.0), -1)
    vt = jnp.prod(jnp.maximum(target[..., 3:] - target[..., :3], 0.0), -1)
    iou = inter / jnp.maximum(vp + vt - inter, 1e-8)
    return 1.0 - iou


def rotated_iou_3d_loss(pred, target):
    """1 - rotated 3D IoU of [..., 7] gravity-centered boxes
    (losses/rotated_iou_loss.py wrapping mmcv diff_iou_rotated_3d);
    differentiable through the polygon-clipping overlap."""
    inter_bev = jax.vmap(
        lambda a, b: rotated_overlap(a[None, [0, 1, 3, 4, 6]],
                                     b[None, [0, 1, 3, 4, 6]])[0, 0]
    )(pred.reshape(-1, 7), target.reshape(-1, 7))
    a = pred.reshape(-1, 7)
    b = target.reshape(-1, 7)
    zov = jnp.maximum(
        jnp.minimum(a[:, 2] + a[:, 5] / 2, b[:, 2] + b[:, 5] / 2)
        - jnp.maximum(a[:, 2] - a[:, 5] / 2, b[:, 2] - b[:, 5] / 2), 0.0)
    inter = inter_bev * zov
    va = a[:, 3] * a[:, 4] * a[:, 5]
    vb = b[:, 3] * b[:, 4] * b[:, 5]
    iou = inter / jnp.maximum(va + vb - inter, 1e-8)
    return (1.0 - iou).reshape(pred.shape[:-1])


def uncertain_smooth_l1_loss(pred, target, sigma, alpha=1.0, beta=1.0):
    """Smooth-L1 with learned aleatoric uncertainty
    (losses/uncertain_smooth_l1_loss.py:10)."""
    l = smooth_l1_loss(pred, target, beta)
    return jnp.exp(-sigma) * l + alpha * sigma


def multibin_loss(pred_orientations, gt_orientations, num_dir_bins=4):
    """Multi-bin orientation loss (losses/multibin_loss.py, MonoFlex):
    per bin a 2-way cls CE + cos/sin regression on the assigned bin.

    Args:
        pred_orientations: [N, num_bins * 4] (2 cls + 2 reg per bin).
        gt_orientations: [N, num_bins * 2] (cls index, residual) packed as
            (cls per bin [N, num_bins], residual [N, num_bins]).
    """
    cls_losses = 0.0
    reg_losses = 0.0
    reg_cnt = 0.0
    for i in range(num_dir_bins):
        cls_ce = -jax.nn.log_softmax(
            pred_orientations[:, i * 2:i * 2 + 2], -1)
        cls_label = gt_orientations[:, i].astype(jnp.int32)
        cls_losses = cls_losses + jnp.take_along_axis(
            cls_ce, cls_label[:, None], -1)[:, 0]
        mask = cls_label == 1
        s = num_dir_bins * 2 + i * 2
        pred_sin = pred_orientations[:, s]
        pred_cos = pred_orientations[:, s + 1]
        gt_res = gt_orientations[:, num_dir_bins + i]
        reg = (smooth_l1_loss(pred_sin, jnp.sin(gt_res))
               + smooth_l1_loss(pred_cos, jnp.cos(gt_res)))
        reg_losses = reg_losses + jnp.where(mask, reg, 0.0)
        reg_cnt = reg_cnt + mask.astype(jnp.float32)
    return cls_losses / num_dir_bins + reg_losses / jnp.maximum(reg_cnt,
                                                                1.0)
