"""PartA2 RoI bbox head: per-RoI 14^3 grids -> masked 3D convs -> FCs ->
IoU-score cls + canonical box refinement (+ corner loss).

Rebuild of PartA2BboxHead
(/root/reference/mmdet3d/models/roi_heads/bbox_heads/parta2_bbox_head.py:26).
TPU design note: the reference runs spconv submanifold convs over the
pooled RoI grids; on TPU the 14^3 grids are small and dense, so the exact
SubM semantics are reproduced with DENSE 3D convs — inactive cells hold
zeros (so neighbor gathers contribute zero, like spconv's misses) and
outputs are masked to the occupancy set. SparseMaxPool3d becomes a masked
window max. This keeps the MXU busy instead of building per-RoI rulebooks.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core import geometry as geo
from ...core.coders import delta_decode, delta_encode
from ..layers import conv_init


@dataclasses.dataclass(frozen=True)
class PartA2BboxConfig:
    num_classes: int = 3
    seg_in_channels: int = 16
    part_in_channels: int = 4
    seg_conv_channels: Tuple[int, ...] = (64, 64)
    part_conv_channels: Tuple[int, ...] = (64, 64)
    merge_conv_channels: Tuple[int, ...] = (128, 128)
    down_conv_channels: Tuple[int, ...] = (128, 256)
    shared_fc_channels: Tuple[int, ...] = (256, 512, 512, 512)
    cls_channels: Tuple[int, ...] = (256, 256)
    reg_channels: Tuple[int, ...] = (256, 256)
    dropout_ratio: float = 0.1
    roi_feat_size: int = 14
    with_corner_loss: bool = True
    # rcnn train cfg (configs/_base_/models/parta2.py:188-189)
    cls_pos_thr: float = 0.75
    cls_neg_thr: float = 0.25
    loss_bbox_weight: float = 1.0
    loss_cls_weight: float = 1.0


class MaskedBN(nn.Module):
    """BN over occupied cells of [R, ..., C] grids (BN1d eps=1e-3
    momentum=0.01 in the reference's sparse conv modules)."""
    eps: float = 1e-3
    momentum: float = 0.01

    @nn.compact
    def __call__(self, x, occ, train: bool):
        c = x.shape[-1]
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param('scale', nn.initializers.ones, (c,))
        bias = self.param('bias', nn.initializers.zeros, (c,))
        if train:
            m = occ[..., None].astype(jnp.float32)
            xf = x.astype(jnp.float32)
            cnt = jnp.maximum(m.sum(), 1.0)
            axes = tuple(range(x.ndim - 1))
            mean = (xf * m).sum(axes) / cnt
            var = (((xf - mean) ** 2) * m).sum(axes) / cnt
            if not self.is_initializing():
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ub = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * ub)
        else:
            mean, var = ra_mean.value, ra_var.value
        y = ((x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
             * scale + bias)
        return jnp.where(occ[..., None], y, 0.0).astype(x.dtype)


class SubMConvDense(nn.Module):
    """SubM conv on a dense occupancy-masked grid: conv of zero-padded
    actives, output masked to the active set — exactly spconv SubMConv3d
    on these grids."""
    out_channels: int

    @nn.compact
    def __call__(self, x, occ, train: bool):
        y = nn.Conv(self.out_channels, (3, 3, 3), padding='SAME',
                    use_bias=False, kernel_init=conv_init)(x)
        y = jnp.where(occ[..., None], y, 0.0)
        y = MaskedBN()(y, occ, train)
        return nn.relu(y)


def sparse_max_pool_dense(x, occ):
    """SparseMaxPool3d(2, 2): masked window max + occupancy union."""
    neg = jnp.finfo(x.dtype).min
    xm = jnp.where(occ[..., None], x, neg)
    pooled = nn.max_pool(xm, (2, 2, 2), strides=(2, 2, 2))
    occ_out = nn.max_pool(occ[..., None].astype(jnp.float32), (2, 2, 2),
                          strides=(2, 2, 2))[..., 0] > 0
    return jnp.where(occ_out[..., None], pooled, 0.0), occ_out


class PartA2BboxHead(nn.Module):
    cfg: PartA2BboxConfig

    @nn.compact
    def __call__(self, seg_grids, part_grids, occ, train: bool = True):
        """seg_grids [R, S, S, S, Cs]; part_grids [R, S, S, S, Cp];
        occ [R, S, S, S] (shared occupancy of the pooled grids).

        Returns (cls_score [R, 1], bbox_pred [R, 7]).
        """
        c = self.cfg
        x_part = part_grids
        for ch in c.part_conv_channels:
            x_part = SubMConvDense(ch)(x_part, occ, train)
        x_seg = seg_grids
        for ch in c.seg_conv_channels:
            x_seg = SubMConvDense(ch)(x_seg, occ, train)
        x = jnp.concatenate([x_seg, x_part], -1)
        for ch in c.merge_conv_channels:
            x = SubMConvDense(ch)(x, occ, train)
        x, occ2 = sparse_max_pool_dense(x, occ)
        for ch in c.down_conv_channels:
            x = SubMConvDense(ch)(x, occ2, train)

        R = x.shape[0]
        x = x.reshape(R, -1)
        for k in range(1, len(c.shared_fc_channels)):
            x = nn.Dense(c.shared_fc_channels[k], use_bias=False)(x)
            x = nn.BatchNorm(use_running_average=not train, epsilon=1e-3,
                             momentum=0.99)(x)
            x = nn.relu(x)
            if k != len(c.shared_fc_channels) - 1 and c.dropout_ratio > 0:
                x = nn.Dropout(c.dropout_ratio, deterministic=not train)(x)

        def branch(x, chans, out_ch, name):
            h = x
            for i, ch in enumerate(chans):
                h = nn.Dense(ch, use_bias=False, name=f'{name}_{i}')(h)
                h = nn.BatchNorm(use_running_average=not train,
                                 epsilon=1e-3, momentum=0.99,
                                 name=f'{name}_bn{i}')(h)
                h = nn.relu(h)
                if i == 0 and c.dropout_ratio > 0:
                    h = nn.Dropout(c.dropout_ratio,
                                   deterministic=not train)(h)
            return nn.Dense(out_ch, name=f'{name}_out')(h)

        cls_score = branch(x, c.cls_channels, 1, 'cls')
        bbox_pred = branch(x, c.reg_channels, 7, 'reg')
        return cls_score, bbox_pred


def canonical_targets(cfg: PartA2BboxConfig, rois, gt_of_roi, ious,
                      pos_mask, roi_valid):
    """Static-shape rebuild of _get_target_single
    (parta2_bbox_head.py:405-467): IoU-derived cls target + canonical-frame
    delta regression targets for positives.

    Args (single sample):
        rois: [R, 7]; gt_of_roi: [R, 7] matched GT box per roi;
        ious: [R]; pos_mask/roi_valid: [R].

    Returns dict(label, label_weights, bbox_targets [R, 7], reg_mask).
    """
    label = (ious > cfg.cls_pos_thr).astype(jnp.float32)
    interval = (ious >= cfg.cls_neg_thr) & (ious <= cfg.cls_pos_thr)
    # reference PartA2 writes the interval ramp as iou*2-0.5, which is
    # (iou-neg)/(pos-neg) for its (0.75, 0.25); the general form also
    # serves PointRCNN's (0.7, 0.25)
    label = jnp.where(
        interval,
        (ious - cfg.cls_neg_thr) / (cfg.cls_pos_thr - cfg.cls_neg_thr),
        label)
    label_weights = roi_valid.astype(jnp.float32)

    # canonical transform
    roi_ry = rois[:, 6] % (2 * np.pi)
    rel = gt_of_roi[:, :3] - rois[:, :3]
    c, s = jnp.cos(-roi_ry), jnp.sin(-roi_ry)
    lx = rel[:, 0] * c - rel[:, 1] * s
    ly = rel[:, 0] * s + rel[:, 1] * c
    ry = gt_of_roi[:, 6] - roi_ry
    ry = ry % (2 * np.pi)
    opposite = (ry > np.pi * 0.5) & (ry < np.pi * 1.5)
    ry = jnp.where(opposite, (ry + np.pi) % (2 * np.pi), ry)
    ry = jnp.where(ry > np.pi, ry - 2 * np.pi, ry)
    ry = jnp.clip(ry, -np.pi / 2, np.pi / 2)
    gt_ct = jnp.concatenate(
        [jnp.stack([lx, ly, rel[:, 2]], -1), gt_of_roi[:, 3:6],
         ry[:, None]], -1)
    rois_anchor = jnp.concatenate(
        [jnp.zeros_like(rois[:, :3]), rois[:, 3:6],
         jnp.zeros_like(rois[:, 6:7])], -1)
    bbox_targets = delta_encode(gt_ct, rois_anchor)
    reg_mask = pos_mask & roi_valid
    return dict(label=label, label_weights=label_weights,
                bbox_targets=jnp.where(reg_mask[:, None], bbox_targets,
                                       0.0),
                reg_mask=reg_mask)


def decode_refined(rois, bbox_pred):
    """Decode canonical-frame predictions back to lidar boxes
    (parta2_bbox_head.loss:341-356 / get_bboxes)."""
    rois_anchor = jnp.concatenate(
        [jnp.zeros_like(rois[..., :3]), rois[..., 3:6],
         jnp.zeros_like(rois[..., 6:7])], -1)
    boxes_ct = delta_decode(bbox_pred, rois_anchor)
    ry = rois[..., 6]
    c, s = jnp.cos(ry), jnp.sin(ry)
    x = boxes_ct[..., 0] * c - boxes_ct[..., 1] * s + rois[..., 0]
    y = boxes_ct[..., 0] * s + boxes_ct[..., 1] * c + rois[..., 1]
    z = boxes_ct[..., 2] + rois[..., 2]
    return jnp.concatenate(
        [jnp.stack([x, y, z], -1), boxes_ct[..., 3:6],
         (boxes_ct[..., 6] + ry)[..., None]], -1)


def corner_loss_lidar(pred_boxes, gt_boxes, delta=1.0):
    """Huber corner distance with heading-flip min
    (get_corner_loss_lidar:471-506). Returns [N]."""
    pc = geo.boxes7_to_corners(pred_boxes)
    gc = geo.boxes7_to_corners(gt_boxes)
    gt_flip = gt_boxes.at[..., 6].add(np.pi)
    gcf = geo.boxes7_to_corners(gt_flip)
    d = jnp.minimum(jnp.linalg.norm(pc - gc, axis=-1),
                    jnp.linalg.norm(pc - gcf, axis=-1))    # [N, 8]
    quad = jnp.clip(d, None, delta)
    lin = d - quad
    return (0.5 * quad ** 2 + delta * lin).mean(-1)


def bbox_head_loss(cfg: PartA2BboxConfig, cls_score, bbox_pred, rois,
                   targets):
    """Batched loss (parta2_bbox_head.loss:291-363). All inputs [B, R, ...]
    (targets from vmapped canonical_targets)."""
    label = targets['label']
    lw = targets['label_weights']
    lw = lw / jnp.maximum(lw.sum(), 1.0)
    logits = cls_score[..., 0]
    bce = (jnp.maximum(logits, 0) - logits * label
           + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    loss_cls = (bce * lw).sum() * cfg.loss_cls_weight

    reg_mask = targets['reg_mask']
    bw = reg_mask.astype(jnp.float32)
    bw = bw / jnp.maximum(bw.sum(), 1.0)
    diff = bbox_pred - targets['bbox_targets']
    beta = 1.0 / 9.0
    sl1 = jnp.where(jnp.abs(diff) < beta, 0.5 * diff ** 2 / beta,
                    jnp.abs(diff) - 0.5 * beta)
    loss_bbox = (sl1 * bw[..., None]).sum() * cfg.loss_bbox_weight

    logs = dict(loss_rcnn_cls=loss_cls, loss_rcnn_bbox=loss_bbox)
    total = loss_cls + loss_bbox
    if cfg.with_corner_loss:
        pred_boxes = decode_refined(rois, bbox_pred)
        cl = corner_loss_lidar(pred_boxes, targets['gt_of_roi'])
        loss_corner = (cl * reg_mask).sum() / jnp.maximum(
            reg_mask.sum(), 1.0)
        logs['loss_rcnn_corner'] = loss_corner
        total = total + loss_corner
    logs['loss_rcnn'] = total
    return total, logs
