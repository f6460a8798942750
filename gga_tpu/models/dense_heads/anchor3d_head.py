"""Anchor3DHead: the SECOND / PointPillars anchor-based head.

Batched jittable rebuild of the reference Anchor3DHead
(/root/reference/mmdet3d/models/dense_heads/anchor3d_head.py, configured as
in configs/_base_/models/hv_pointpillars_secfpn_kitti.py): per-class
aligned anchors with 2 rotations, MaxIoU assignment on nearest-BEV overlap
(assign_per_class), delta box coding with sin-difference rotation, focal
cls + smooth-L1 box + direction CE losses, rotated-NMS decode.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.anchors import multiclass_anchors
from ...core.coders import delta_decode, delta_encode
from ...core.geometry import limit_period
from ..layers import conv_init


@dataclasses.dataclass(frozen=True)
class Anchor3DConfig:
    num_classes: int = 3
    feat_channels: int = 384
    anchor_ranges: Tuple[Tuple[float, ...], ...] = (
        (0, -39.68, -0.6, 69.12, 39.68, -0.6),
        (0, -39.68, -0.6, 69.12, 39.68, -0.6),
        (0, -39.68, -1.78, 69.12, 39.68, -1.78))
    anchor_sizes: Tuple[Tuple[float, float, float], ...] = (
        (0.8, 0.6, 1.73), (1.76, 0.6, 1.73), (3.9, 1.6, 1.56))
    rotations: Tuple[float, ...] = (0.0, 1.5707963)
    pos_iou_thr: Tuple[float, ...] = (0.5, 0.5, 0.6)
    neg_iou_thr: Tuple[float, ...] = (0.35, 0.35, 0.45)
    min_pos_iou: Tuple[float, ...] = (0.35, 0.35, 0.45)
    dir_offset: float = 0.0
    loss_bbox_weight: float = 2.0
    loss_dir_weight: float = 0.2
    # test cfg
    nms_pre: int = 100
    nms_thr: float = 0.01
    score_thr: float = 0.1
    max_num: int = 50


class Anchor3DHead(nn.Module):
    cfg: Anchor3DConfig

    @nn.compact
    def __call__(self, x, train: bool = True):
        """x: [B, H, W, C] -> dict of NHWC maps.

        cls [B, H, W, A*num_cls], reg [B, H, W, A*7], dir [B, H, W, A*2]
        where A = num_classes * len(rotations) anchors per location.
        """
        c = self.cfg
        A = c.num_classes * len(c.rotations)
        cls = nn.Conv(A * c.num_classes, (1, 1), use_bias=True,
                      kernel_init=conv_init,
                      bias_init=nn.initializers.constant(-4.595),
                      name='conv_cls')(x)
        reg = nn.Conv(A * 7, (1, 1), use_bias=True, kernel_init=conv_init,
                      name='conv_reg')(x)
        dirc = nn.Conv(A * 2, (1, 1), use_bias=True, kernel_init=conv_init,
                       name='conv_dir')(x)
        return dict(cls=cls, reg=reg, dir=dirc)


def make_anchors(cfg: Anchor3DConfig, feature_size):
    """[num_classes, H*W*R, 7] per-class anchors."""
    return multiclass_anchors(feature_size, cfg.anchor_ranges,
                              cfg.anchor_sizes, cfg.rotations)


def _nearest_bev(boxes):
    """Axis-aligned nearest BEV boxes [..., 4] (BboxOverlapsNearest3D)."""
    rot = limit_period(boxes[..., 6], 0.5, np.pi)
    swap = jnp.abs(rot) > np.pi / 4
    dx = jnp.where(swap, boxes[..., 4], boxes[..., 3])
    dy = jnp.where(swap, boxes[..., 3], boxes[..., 4])
    return jnp.stack([boxes[..., 0] - dx / 2, boxes[..., 1] - dy / 2,
                      boxes[..., 0] + dx / 2, boxes[..., 1] + dy / 2], -1)


def _bev_iou(a, b):
    """[N, 4] x [M, 4] axis-aligned IoU."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = jnp.prod(jnp.clip(rb - lt, 0, None), -1)
    area_a = jnp.prod(a[:, 2:] - a[:, :2], -1)
    area_b = jnp.prod(b[:, 2:] - b[:, :2], -1)
    return inter / jnp.maximum(
        area_a[:, None] + area_b[None, :] - inter, 1e-8)


def assign_targets(cfg: Anchor3DConfig, anchors, gt_boxes, gt_labels,
                   obj_valid):
    """Per-class MaxIoU assignment for one sample.

    Args:
        anchors: [C, A, 7] per-class anchors.
        gt_boxes: [M, 7] bottom-center lidar boxes; gt_labels [M];
        obj_valid [M].

    Returns dict (flattened over classes, [C*A]):
        labels (num_classes = bg), bbox_targets [C*A, 7], dir_targets,
        pos_mask, neg_mask.
    """
    C, A, _ = anchors.shape
    labels_out, targets_out, dirs_out, pos_out, neg_out = [], [], [], [], []
    gt_bev = _nearest_bev(gt_boxes)
    for ci in range(C):
        anc = anchors[ci]
        iou = _bev_iou(_nearest_bev(anc), gt_bev)       # [A, M]
        cls_ok = (gt_labels == ci) & obj_valid
        iou = jnp.where(cls_ok[None, :], iou, -1.0)
        max_iou = iou.max(-1)
        argmax = iou.argmax(-1)
        pos = max_iou >= cfg.pos_iou_thr[ci]
        neg = (max_iou < cfg.neg_iou_thr[ci]) & (max_iou >= -0.5)
        # force-match: each GT's best anchor becomes positive when its
        # overlap reaches min_pos_iou (MaxIoUAssigner step 4); scatter-max
        # so a padded GT can't overwrite a real one at a shared index
        gt_best = iou.max(0)                                 # [M]
        ok_force = cls_ok & (gt_best >= cfg.min_pos_iou[ci])
        best_anchor = iou.argmax(0)                          # [M]
        force = jnp.zeros((A,), jnp.int32).at[best_anchor].max(
            ok_force.astype(jnp.int32)).astype(bool)
        pos = pos | force
        neg = neg & ~pos

        tgt_boxes = gt_boxes[argmax]
        enc = delta_encode(tgt_boxes, anc)
        rot = limit_period(tgt_boxes[:, 6] - cfg.dir_offset, 0, 2 * np.pi)
        dir_t = jnp.clip((rot / np.pi).astype(jnp.int32), 0, 1)
        labels = jnp.where(pos, ci, cfg.num_classes)
        labels_out.append(labels)
        targets_out.append(jnp.where(pos[:, None], enc, 0.0))
        dirs_out.append(dir_t)
        pos_out.append(pos)
        neg_out.append(neg)
    return dict(labels=jnp.concatenate(labels_out),
                bbox_targets=jnp.concatenate(targets_out),
                dir_targets=jnp.concatenate(dirs_out),
                pos_mask=jnp.concatenate(pos_out),
                neg_mask=jnp.concatenate(neg_out))


def loss(cfg: Anchor3DConfig, preds, anchors, targets):
    """Batch loss (anchor3d_head.loss).

    Args:
        preds: head output dict of NHWC maps.
        anchors: [C, A, 7].
        targets: vmapped assign_targets outputs, each [B, C*A, ...].
    """
    B = preds['cls'].shape[0]
    C = cfg.num_classes
    R = len(cfg.rotations)
    # NHWC [B,H,W,A*ch] -> [B, C*A_locrot, ch]; anchor layout must match
    # multiclass_anchors: per class contiguous [H*W*R]
    H, W = preds['cls'].shape[1:3]

    def flat(m, ch):
        m = m.reshape(B, H * W, C, R, ch)
        return m.transpose(0, 2, 1, 3, 4).reshape(B, C * H * W * R, ch)

    cls = flat(preds['cls'], C)
    reg = flat(preds['reg'], 7)
    dirp = flat(preds['dir'], 2)

    labels = targets['labels']
    pos = targets['pos_mask'].astype(jnp.float32)
    neg = targets['neg_mask'].astype(jnp.float32)
    num_pos = jnp.maximum(pos.sum(), 1.0)

    onehot = jax.nn.one_hot(labels, C)
    p = jax.nn.sigmoid(cls)
    pt = p * onehot + (1 - p) * (1 - onehot)
    alpha_w = 0.25 * onehot + 0.75 * (1 - onehot)
    ce = -(onehot * jax.nn.log_sigmoid(cls)
           + (1 - onehot) * jax.nn.log_sigmoid(-cls))
    valid_w = (pos + neg)[..., None]
    loss_cls = ((alpha_w * (1 - pt) ** 2 * ce) * valid_w).sum() / num_pos

    # sin-difference on rotation channel
    bt = targets['bbox_targets']
    rs = jnp.sin(reg[..., 6]) * jnp.cos(bt[..., 6])
    rt = jnp.cos(reg[..., 6]) * jnp.sin(bt[..., 6])
    diff = jnp.concatenate(
        [reg[..., :6] - bt[..., :6], (rs - rt)[..., None]], -1)
    beta = 1.0 / 9.0
    sl1 = jnp.where(jnp.abs(diff) < beta, 0.5 * diff ** 2 / beta,
                    jnp.abs(diff) - 0.5 * beta)
    loss_bbox = (sl1 * pos[..., None]).sum() / num_pos \
        * cfg.loss_bbox_weight

    dir_ce = -jnp.take_along_axis(
        jax.nn.log_softmax(dirp, -1),
        targets['dir_targets'][..., None], -1)[..., 0]
    loss_dir = (dir_ce * pos).sum() / num_pos * cfg.loss_dir_weight

    logs = dict(loss_cls=loss_cls, loss_bbox=loss_bbox, loss_dir=loss_dir)
    total = loss_cls + loss_bbox + loss_dir
    logs['loss'] = total
    logs['num_pos'] = pos.sum()
    return total, logs


def decode(cfg: Anchor3DConfig, preds, anchors):
    """Inference decode + per-class rotated NMS (static shapes).

    Returns dict: boxes [B, K, 7], scores, labels, valid.
    """
    from ...core.nms import nms_bev

    B = preds['cls'].shape[0]
    C = cfg.num_classes
    R = len(cfg.rotations)
    H, W = preds['cls'].shape[1:3]

    def flat(m, ch):
        m = m.reshape(B, H * W, C, R, ch)
        return m.transpose(0, 2, 1, 3, 4).reshape(B, C, H * W * R, ch)

    cls = jax.nn.sigmoid(flat(preds['cls'], C))
    reg = flat(preds['reg'], 7)
    dirp = flat(preds['dir'], 2)

    outs = []
    for ci in range(C):
        score = cls[:, ci, :, ci]                     # [B, A]
        boxes = delta_decode(reg[:, ci], anchors[ci][None])
        dir_score = jnp.argmax(dirp[:, ci], -1)
        # dir correction (anchor3d_head get_bboxes):
        rot = limit_period(boxes[..., 6] - cfg.dir_offset, 1.0, np.pi)
        boxes = boxes.at[..., 6].set(
            rot + cfg.dir_offset + np.pi * dir_score)

        k = min(cfg.nms_pre, score.shape[-1])
        top_s, top_i = jax.lax.top_k(score, k)
        bx = jnp.take_along_axis(boxes, top_i[..., None], 1)

        def one(b, s):
            bev = b[:, [0, 1, 3, 4, 6]]
            idx, keep = nms_bev(bev, s, cfg.nms_thr,
                                post_max_size=cfg.max_num,
                                valid=s > cfg.score_thr)
            safe = jnp.maximum(idx, 0)
            return b[safe], jnp.where(idx >= 0, s[safe], 0.0), idx >= 0

        b, s, v = jax.vmap(one)(bx, top_s)
        outs.append((b, s, jnp.full(s.shape, ci, jnp.int32), v))
    return dict(
        boxes=jnp.concatenate([o[0] for o in outs], 1),
        scores=jnp.concatenate([o[1] for o in outs], 1),
        labels=jnp.concatenate([o[2] for o in outs], 1),
        valid=jnp.concatenate([o[3] for o in outs], 1))
