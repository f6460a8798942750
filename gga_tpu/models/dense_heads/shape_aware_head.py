"""Shape-aware grouping head (SSN).

Rebuild of ShapeAwareHead + BaseShapeHead
(/root/reference/mmdet3d/models/dense_heads/shape_aware_head.py:17,168):
classes are grouped by object shape; each group gets its own conv stack
(deeper + strided for large objects) over the shared BEV features, and
per-class anchors live at that group's output resolution
(AlignedAnchor3DRangeGeneratorPerCls). Assignment/losses are the
Anchor3DHead machinery generalized to per-class anchor counts (python
lists of static shapes — every class keeps its own [A_c] lane).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.anchors import aligned_anchors_single_range
from ...core.coders import delta_decode, delta_encode
from ...core.geometry import limit_period
from ...core.nms import nms_bev
from ..layers import ConvModule2d
from .anchor3d_head import _bev_iou, _nearest_bev


@dataclasses.dataclass(frozen=True)
class ShapeTask:
    num_class: int
    shared_conv_channels: Tuple[int, ...]
    shared_conv_strides: Tuple[int, ...]


@dataclasses.dataclass(frozen=True)
class ShapeAwareConfig:
    num_classes: int = 3
    # per-class anchor z + size (AlignedAnchor3DRangeGeneratorPerCls)
    anchor_z: Tuple[float, ...] = (-0.6, -0.6, -1.78)
    anchor_sizes: Tuple[Tuple[float, float, float], ...] = (
        (0.8, 0.6, 1.73), (1.76, 0.6, 1.73), (3.9, 1.6, 1.56))
    # which task group each class belongs to, and group conv specs
    class_to_task: Tuple[int, ...] = (0, 0, 1)
    tasks: Tuple[ShapeTask, ...] = (
        ShapeTask(2, (64, 64), (1, 1)),        # small objects
        ShapeTask(1, (64, 64, 64), (2, 1, 1)))  # large objects
    bev_range: Tuple[float, ...] = (0, -40, 70.4, 40)
    rotations: Tuple[float, ...] = (0.0, 1.5707963)
    pos_iou_thr: Tuple[float, ...] = (0.5, 0.5, 0.6)
    neg_iou_thr: Tuple[float, ...] = (0.35, 0.35, 0.45)
    min_pos_iou: Tuple[float, ...] = (0.35, 0.35, 0.45)
    dir_offset: float = 0.0
    loss_bbox_weight: float = 2.0
    loss_dir_weight: float = 0.2
    # test cfg
    nms_pre: int = 256
    nms_thr: float = 0.2
    score_thr: float = 0.1
    max_num: int = 128


class ShapeAwareHead(nn.Module):
    cfg: ShapeAwareConfig

    @nn.compact
    def __call__(self, x, train: bool = True):
        """x [B, H, W, C] -> list per TASK GROUP of dicts(cls, reg, dir)
        at the group's resolution; cls channels = R * group classes."""
        c = self.cfg
        R = len(c.rotations)
        outs = []
        for ti, task in enumerate(c.tasks):
            h = x
            for j, (ch, s) in enumerate(zip(task.shared_conv_channels,
                                            task.shared_conv_strides)):
                h = ConvModule2d(ch, 3, stride=s,
                                 name=f'task{ti}_conv{j}')(h, train)
            outs.append(dict(
                cls=nn.Conv(R * task.num_class, (1, 1),
                            name=f'task{ti}_cls')(h),
                reg=nn.Conv(R * task.num_class * 7, (1, 1),
                            name=f'task{ti}_reg')(h),
                dir=nn.Conv(R * task.num_class * 2, (1, 1),
                            name=f'task{ti}_dir')(h)))
        return outs


def shape_aware_anchors(cfg: ShapeAwareConfig, feat_sizes):
    """Per-class anchor tensors [A_c, 7]; feat_sizes per TASK group."""
    anchors = []
    for ci in range(cfg.num_classes):
        H, W = feat_sizes[cfg.class_to_task[ci]]
        anchors.append(aligned_anchors_single_range(
            (H, W),
            (cfg.bev_range[0], cfg.bev_range[1], cfg.anchor_z[ci],
             cfg.bev_range[2], cfg.bev_range[3], cfg.anchor_z[ci]),
            cfg.anchor_sizes[ci], cfg.rotations).reshape(-1, 7))
    return anchors


def _flatten_group(cfg, out, task):
    """Group maps -> per-class [B, H*W*R, ch] lists (class-major)."""
    R = len(cfg.rotations)
    B, H, W = out['cls'].shape[:3]

    def split(m, ch):
        m = m.reshape(B, H * W, task.num_class, R, ch)
        return [m[:, :, k].reshape(B, H * W * R, ch)
                for k in range(task.num_class)]

    return (split(out['cls'], 1), split(out['reg'], 7),
            split(out['dir'], 2))


def flatten_shape_preds(cfg: ShapeAwareConfig, outs):
    """-> per-CLASS lists (cls [B, A_c, 1], reg, dir), ordered by class
    id (classes are contiguous within groups per class_to_task)."""
    cls_l, reg_l, dir_l = [], [], []
    for ti, task in enumerate(cfg.tasks):
        cl, rl, dl = _flatten_group(cfg, outs[ti], task)
        cls_l += cl
        reg_l += rl
        dir_l += dl
    return cls_l, reg_l, dir_l


def shape_aware_loss(cfg: ShapeAwareConfig, outs, anchors, gt_boxes,
                     gt_labels, gt_valid):
    """Per-class assignment + focal/smooth-L1/dir losses, summed over
    classes (loss_single per feature level in the reference)."""
    cls_l, reg_l, dir_l = flatten_shape_preds(cfg, outs)
    total_cls = total_bbox = total_dir = 0.0
    num_pos_all = 0.0
    per_class = []
    for ci in range(cfg.num_classes):
        anc = anchors[ci]

        def one(cls_s, reg_s, dir_s, gb, gl, gv, ci=ci, anc=anc):
            iou = _bev_iou(_nearest_bev(anc), _nearest_bev(gb))
            ok = (gl == ci) & gv
            iou = jnp.where(ok[None, :], iou, -1.0)
            max_iou = iou.max(-1)
            argm = iou.argmax(-1)
            pos = max_iou >= cfg.pos_iou_thr[ci]
            neg = (max_iou < cfg.neg_iou_thr[ci]) & (max_iou >= -0.5)
            # MaxIoUAssigner force-match (step 4): each GT's best anchor
            gt_best = iou.max(0)
            ok_force = ok & (gt_best >= cfg.min_pos_iou[ci])
            force = jnp.zeros(anc.shape[0], jnp.int32).at[
                iou.argmax(0)].max(ok_force.astype(jnp.int32)).astype(
                bool)
            pos = pos | force
            neg = neg & ~pos
            tgt = delta_encode(gb[argm], anc)
            rot = limit_period(gb[argm][:, 6] - cfg.dir_offset, 0,
                               2 * np.pi)
            dir_t = jnp.clip((rot / np.pi).astype(jnp.int32), 0, 1)

            p = jax.nn.sigmoid(cls_s[:, 0])
            t = pos.astype(jnp.float32)
            pt = p * t + (1 - p) * (1 - t)
            al = 0.25 * t + 0.75 * (1 - t)
            ce = -(t * jax.nn.log_sigmoid(cls_s[:, 0])
                   + (1 - t) * jax.nn.log_sigmoid(-cls_s[:, 0]))
            l_cls = (al * (1 - pt) ** 2 * ce
                     * (pos | neg).astype(jnp.float32)).sum()

            rs = jnp.sin(reg_s[:, 6]) * jnp.cos(tgt[:, 6])
            rt = jnp.cos(reg_s[:, 6]) * jnp.sin(tgt[:, 6])
            diff = jnp.concatenate(
                [reg_s[:, :6] - tgt[:, :6], (rs - rt)[:, None]], -1)
            beta = 1.0 / 9.0
            sl1 = jnp.where(jnp.abs(diff) < beta,
                            0.5 * diff ** 2 / beta,
                            jnp.abs(diff) - 0.5 * beta)
            l_bbox = (sl1 * t[:, None]).sum()
            d_ce = -jnp.take_along_axis(
                jax.nn.log_softmax(dir_s, -1), dir_t[:, None],
                -1)[:, 0]
            l_dir = (d_ce * t).sum()
            return l_cls, l_bbox, l_dir, t.sum()

        lc, lb, ld, npos = jax.vmap(one)(
            cls_l[ci], reg_l[ci], dir_l[ci], gt_boxes, gt_labels,
            gt_valid)
        total_cls = total_cls + lc.sum()
        total_bbox = total_bbox + lb.sum()
        total_dir = total_dir + ld.sum()
        num_pos_all = num_pos_all + npos.sum()
        per_class.append(npos.sum())

    n = jnp.maximum(num_pos_all, 1.0)
    loss_cls = total_cls / n
    loss_bbox = total_bbox / n * cfg.loss_bbox_weight
    loss_dir = total_dir / n * cfg.loss_dir_weight
    total = loss_cls + loss_bbox + loss_dir
    return total, dict(loss_cls=loss_cls, loss_bbox=loss_bbox,
                       loss_dir=loss_dir, loss=total)


def decode_shape_aware(cfg: ShapeAwareConfig, outs, anchors):
    """Per-class decode + joint rotated NMS; static output budget."""
    cls_l, reg_l, dir_l = flatten_shape_preds(cfg, outs)
    boxes_all, scores_all, labels_all = [], [], []
    for ci in range(cfg.num_classes):
        score = jax.nn.sigmoid(cls_l[ci][..., 0])       # [B, A]
        k = min(cfg.nms_pre, score.shape[-1])
        top_s, top_i = jax.lax.top_k(score, k)
        boxes = delta_decode(
            jnp.take_along_axis(reg_l[ci], top_i[..., None], 1),
            anchors[ci][top_i])
        dirp = jnp.take_along_axis(dir_l[ci], top_i[..., None], 1)
        dcls = jnp.argmax(dirp, -1)
        rot = limit_period(boxes[..., 6] - cfg.dir_offset, 1.0, np.pi)
        boxes = boxes.at[..., 6].set(
            rot + cfg.dir_offset + np.pi * dcls)
        boxes_all.append(boxes)
        scores_all.append(top_s)
        labels_all.append(jnp.full(top_s.shape, ci, jnp.int32))
    boxes = jnp.concatenate(boxes_all, 1)
    scores = jnp.concatenate(scores_all, 1)
    labels = jnp.concatenate(labels_all, 1)

    def one(b, s, lab):
        bev = b[:, [0, 1, 3, 4, 6]]
        idx, _ = nms_bev(bev, s, cfg.nms_thr,
                         post_max_size=cfg.max_num,
                         valid=s > cfg.score_thr)
        safe = jnp.maximum(idx, 0)
        return (b[safe], jnp.where(idx >= 0, s[safe], 0.0), lab[safe],
                idx >= 0)

    b, s, l, v = jax.vmap(one)(boxes, scores, labels)
    return dict(boxes=b, scores=s, labels=l, valid=v)
