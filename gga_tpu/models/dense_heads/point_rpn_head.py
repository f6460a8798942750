"""Point-wise RPN head for PointRCNN.

Rebuild of PointRPNHead
(/root/reference/mmdet3d/models/dense_heads/point_rpn_head.py:15):
per-point class logits + PointXYZWHLR box residuals, targets assigned by
point-in-box membership (negatives = outside every 0.1m-enlarged GT),
focal cls loss normalized by positive count, smooth-L1 (beta 1/9) box
loss weighted 1/num_pos, and class-agnostic rotated-BEV NMS proposals.

TPU deltas vs the reference: all per-sample python loops are vmapped
masked math on static [B, N] shapes; ``nms_pre``/``num_proposals`` are
static budgets (reference: 9000/512 dynamic).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core import geometry as geo
from ...core.coders import point_xyzwhlr_decode, point_xyzwhlr_encode
from ...core.nms import nms_bev
from ..layers import MaskedBatchNorm
from ..losses import focal_loss, smooth_l1_loss


@dataclasses.dataclass(frozen=True)
class PointRPNConfig:
    num_classes: int = 3
    cls_channels: Tuple[int, ...] = (256, 256)
    reg_channels: Tuple[int, ...] = (256, 256)
    enlarge_width: float = 0.1
    # PointXYZWHLRBBoxCoder(code_size=8, use_mean_size=True)
    mean_sizes: Tuple[Tuple[float, float, float], ...] = (
        (3.9, 1.6, 1.56), (0.8, 0.6, 1.73), (1.76, 0.6, 1.73))
    loss_bbox_weight: float = 1.0
    loss_cls_weight: float = 1.0
    # proposal cfg (train_cfg/test_cfg rpn.nms_cfg)
    nms_pre: int = 1024
    num_proposals: int = 512
    train_nms_thr: float = 0.8
    test_nms_thr: float = 0.85


class PointRPNHead(nn.Module):
    cfg: PointRPNConfig

    @nn.compact
    def __call__(self, fp_features, fp_valid, train: bool = True):
        """fp_features [B, N, C] -> (bbox_preds [B, N, 8],
        cls_preds [B, N, K])."""
        c = self.cfg

        def branch(x, chans, out_ch, name):
            for i, ch in enumerate(chans):
                x = nn.Dense(ch, use_bias=False,
                             name=f'{name}_fc{i}')(x)
                x = MaskedBatchNorm(name=f'{name}_bn{i}')(
                    x, fp_valid, train)
                x = nn.relu(x)
            return nn.Dense(out_ch, name=f'{name}_out')(x)

        cls_preds = branch(fp_features, c.cls_channels, c.num_classes,
                           'cls')
        bbox_preds = branch(fp_features, c.reg_channels, 8, 'reg')
        return bbox_preds, cls_preds


def rpn_targets_single(cfg: PointRPNConfig, points_xyz, points_valid,
                       gt_boxes, gt_labels, gt_valid):
    """get_targets_single (point_rpn_head.py:206): per-point box targets
    by in-box membership. gt_boxes are lidar bottom-center [G, 7]."""
    inbox = geo.points_in_rbbox(points_xyz, gt_boxes)        # [N, G]
    inbox = inbox & gt_valid[None, :]
    assignment = jnp.argmax(inbox, axis=1)                   # first box
    positive = inbox.any(1) & points_valid

    # enlarged_box semantics (base_box3d.py): dims grow by 2*w AND the
    # bottom z drops by w, keeping the margin symmetric around the box
    enlarged = gt_boxes.at[:, 3:6].add(2 * cfg.enlarge_width)
    enlarged = enlarged.at[:, 2].add(-cfg.enlarge_width)
    near = geo.points_in_rbbox(points_xyz, enlarged) & gt_valid[None, :]
    negative = ~near.any(1) & points_valid

    gt = gt_boxes[assignment]
    # encode against gravity centers (reference shifts z by +h/2)
    gt_grav = gt.at[:, 2].add(gt[:, 5] / 2)
    mask_targets = gt_labels[assignment]
    bbox_targets = point_xyzwhlr_encode(
        gt_grav, points_xyz, mask_targets, cfg.mean_sizes)
    return dict(bbox_targets=bbox_targets, mask_targets=mask_targets,
                positive=positive, negative=negative)


def rpn_loss(cfg: PointRPNConfig, bbox_preds, cls_preds, points_xyz,
             points_valid, gt_boxes, gt_labels, gt_valid):
    """Batched loss (point_rpn_head.py:127-171)."""
    t = jax.vmap(lambda p, v, gb, gl, gv: rpn_targets_single(
        cfg, p, v, gb, gl, gv))(points_xyz, points_valid, gt_boxes,
                                gt_labels, gt_valid)
    pos = t['positive'].astype(jnp.float32)
    num_pos = pos.sum()
    box_w = pos / (num_pos + 1e-6)
    loss_bbox = (smooth_l1_loss(bbox_preds, t['bbox_targets'],
                                beta=1.0 / 9.0)
                 * box_w[..., None]).sum() * cfg.loss_bbox_weight

    labels = jnp.where(t['negative'], cfg.num_classes, t['mask_targets'])
    w = pos + t['negative'].astype(jnp.float32)
    fl = focal_loss(cls_preds, labels, cfg.num_classes)
    loss_cls = (fl * w).sum() / jnp.maximum(num_pos, 1.0) \
        * cfg.loss_cls_weight
    return loss_bbox, loss_cls


def rpn_proposals(cfg: PointRPNConfig, bbox_preds, cls_preds, points_xyz,
                  points_valid, train: bool):
    """get_bboxes + class_agnostic_nms (point_rpn_head.py:246-356):
    decode every point's box, rank by max sigmoid score, rotated NMS.

    Returns dict boxes [B, P, 7] (bottom-center), scores, labels, valid,
    P = cfg.num_proposals.
    """
    sem = jax.nn.sigmoid(cls_preds)
    obj = jnp.where(points_valid, sem.max(-1), -1.0)
    label = sem.argmax(-1)
    boxes = point_xyzwhlr_decode(bbox_preds, points_xyz, label,
                                 cfg.mean_sizes)
    # gravity center -> bottom center
    boxes = boxes.at[..., 2].add(-boxes[..., 5] / 2)
    nms_thr = cfg.train_nms_thr if train else cfg.test_nms_thr

    k = min(cfg.nms_pre, obj.shape[-1])
    top_s, top_i = jax.lax.top_k(obj, k)
    top_b = jnp.take_along_axis(boxes, top_i[..., None], 1)
    top_l = jnp.take_along_axis(label, top_i, 1)

    def one(b, s, lab):
        bev = b[:, [0, 1, 3, 4, 6]]
        idx, _ = nms_bev(bev, s, nms_thr,
                         post_max_size=cfg.num_proposals,
                         valid=s > 0)
        safe = jnp.maximum(idx, 0)
        return (b[safe], jnp.where(idx >= 0, s[safe], 0.0), lab[safe],
                idx >= 0)

    pb, ps, pl, pv = jax.vmap(one)(top_b, top_s, top_l)
    return dict(boxes=pb, scores=ps, labels=pl, valid=pv)
