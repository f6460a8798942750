"""PointRCNN two-stage point-based detector.

Rebuild of /root/reference/mmdet3d/models/detectors/point_rcnn.py:9 and
configs/_base_/models/point_rcnn.py: PointNet2SAMSG (4 SA levels, no
aggregation convs) -> PointNetFPNeck back to full resolution ->
PointRPNHead (per-point proposals, class-agnostic NMS) -> RoI stage
(IoU-piecewise sampling, RoIPointPool3d of [canonical xyz, rpn score,
normalized depth, backbone features], PointNet SA refinement with
canonical delta targets + corner loss).

The whole two-stage train forward runs in ONE jit on static shapes:
proposals, sampled RoIs, and per-RoI point budgets are fixed-size
(reference: dynamic 9000/512/128/512).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.roipoint_pool import roipoint_pool3d
from ..backbones.pointnet2 import PointNet2SAMSG
from ..dense_heads.point_rpn_head import (PointRPNConfig, PointRPNHead,
                                          rpn_loss, rpn_proposals)
from ..necks.pointnet_fp_neck import PointNetFPNeck
from ..roi_heads import (RoIHeadConfig, assign_and_sample,
                         bbox_head_loss, build_rcnn_targets,
                         decode_refined)
from ..roi_heads.point_rcnn_bbox_head import (PointRCNNBboxConfig,
                                              PointRCNNBboxHead)


@dataclasses.dataclass(frozen=True)
class PointRCNNConfig:
    in_channels: int = 4
    num_points: Tuple[int, ...] = (4096, 1024, 256, 64)
    radii: Sequence[Tuple[float, ...]] = (
        (0.1, 0.5), (0.5, 1.0), (1.0, 2.0), (2.0, 4.0))
    num_samples: Sequence[Tuple[int, ...]] = (
        (16, 32), (16, 32), (16, 32), (16, 32))
    sa_channels: Sequence = (
        ((16, 16, 32), (32, 32, 64)),
        ((64, 64, 128), (64, 96, 128)),
        ((128, 196, 256), (128, 196, 256)),
        ((256, 256, 512), (256, 384, 512)))
    fp_channels: Sequence[Tuple[int, ...]] = (
        (512, 512), (512, 512), (256, 256), (128, 128))
    depth_normalizer: float = 70.0
    rpn: PointRPNConfig = dataclasses.field(default_factory=PointRPNConfig)
    roi: RoIHeadConfig = dataclasses.field(
        default_factory=lambda: RoIHeadConfig(
            num_rois=128, pos_fraction=0.5, pos_iou_thr=0.55,
            hard_neg_iou_thr=0.1, hard_neg_fraction=0.8,
            roi_pts_budget=512))
    bbox: PointRCNNBboxConfig = dataclasses.field(
        default_factory=PointRCNNBboxConfig)

    @classmethod
    def tiny(cls):
        return cls(
            num_points=(128, 64, 32, 16),
            sa_channels=(((8, 8), (8, 8)), ((8, 8), (8, 8)),
                         ((8, 8), (8, 8)), ((8, 8), (8, 8))),
            fp_channels=((16, 16), (16, 16), (16, 16), (16, 16)),
            rpn=PointRPNConfig(cls_channels=(16,), reg_channels=(16,),
                               nms_pre=64, num_proposals=16),
            roi=RoIHeadConfig(num_rois=8, pos_fraction=0.5,
                              pos_iou_thr=0.55, hard_neg_iou_thr=0.1,
                              hard_neg_fraction=0.8, roi_pts_budget=32),
            bbox=PointRCNNBboxConfig(
                mlp_channels=(16, 16), num_points=(16, 8, -1),
                num_samples=(8, 8, 8),
                sa_channels=((16,), (16,), (16,)),
                cls_channels=(16,), reg_channels=(16,)))


class PointRCNNDetector(nn.Module):
    cfg: PointRCNNConfig

    @nn.compact
    def __call__(self, points, points_valid, rng=None, gt_boxes=None,
                 gt_labels=None, gt_valid=None, train: bool = True):
        """points [B, N, 4]; full two-stage forward in one jit."""
        c = self.cfg
        feat = PointNet2SAMSG(
            in_channels=c.in_channels,
            num_points=tuple(c.num_points),
            radii=tuple(tuple(r) for r in c.radii),
            num_samples=tuple(tuple(s) for s in c.num_samples),
            sa_channels=tuple(tuple(tuple(m) for m in s)
                              for s in c.sa_channels),
            aggregation_channels=(0,) * len(c.num_points))(
                points, points_valid, train)
        neck = PointNetFPNeck(tuple(tuple(f) for f in c.fp_channels))(
            feat, train)
        fp_feats = neck['fp_features']
        fp_xyz = neck['fp_xyz']
        fp_valid = neck['fp_valid']

        bbox_preds, cls_preds = PointRPNHead(c.rpn)(fp_feats, fp_valid,
                                                    train)
        props = rpn_proposals(
            c.rpn, jax.lax.stop_gradient(bbox_preds),
            jax.lax.stop_gradient(cls_preds), fp_xyz, fp_valid, train)

        if train:
            B = points.shape[0]
            keys = jax.random.split(rng, B)
            samples = jax.vmap(
                lambda k, pb, pv, gb, gl, gv: assign_and_sample(
                    c.roi, k, pb, pv, gb, gl, gv))(
                keys, props['boxes'], props['valid'], gt_boxes,
                gt_labels, gt_valid)
        else:
            samples = dict(rois=props['boxes'],
                           roi_valid=props['valid'],
                           roi_scores=props['scores'],
                           roi_labels=props['labels'])
        rois = samples['rois']

        # rcnn per-point features: [score, depth, backbone]
        sem = jax.nn.sigmoid(cls_preds)
        score = sem.max(-1, keepdims=True)
        depth = (jnp.linalg.norm(fp_xyz, axis=-1, keepdims=True)
                 / c.depth_normalizer - 0.5)
        feats_cat = jnp.concatenate([score, depth, fp_feats], -1)

        pooled, empty = jax.vmap(
            lambda x, f, v, r: roipoint_pool3d(
                x, f, v, r, num_sampled=c.roi.roi_pts_budget))(
            fp_xyz, feats_cat, fp_valid, rois)

        B, R = rois.shape[:2]
        S = c.roi.roi_pts_budget
        rcnn_valid = samples['roi_valid'] & ~empty
        cls_score, bbox_pred = PointRCNNBboxHead(c.bbox)(
            pooled.reshape(B * R, S, -1), rcnn_valid.reshape(B * R),
            train)
        rcnn = dict(cls=cls_score.reshape(B, R, 1),
                    reg=bbox_pred.reshape(B, R, 7))
        return dict(rpn=dict(bbox=bbox_preds, cls=cls_preds),
                    fp_xyz=fp_xyz, fp_valid=fp_valid,
                    samples=samples, rcnn=rcnn, props=props)


def point_rcnn_loss(cfg: PointRCNNConfig, out, gt_boxes, gt_labels,
                    gt_valid):
    """RPN + RCNN losses (point_rcnn.py:59-108)."""
    loss_bbox, loss_cls = rpn_loss(
        cfg.rpn, out['rpn']['bbox'], out['rpn']['cls'], out['fp_xyz'],
        out['fp_valid'], gt_boxes, gt_labels, gt_valid)

    rcnn_t = build_rcnn_targets(cfg.bbox, out['samples'])
    loss_rcnn, rcnn_logs = bbox_head_loss(
        cfg.bbox, out['rcnn']['cls'], out['rcnn']['reg'],
        out['samples']['rois'], rcnn_t)
    total = loss_bbox + loss_cls + loss_rcnn
    logs = dict(rpn_bbox_loss=loss_bbox, rpn_semantic_loss=loss_cls,
                **rcnn_logs)
    logs['loss'] = total
    return total, logs


def decode_point_rcnn(cfg: PointRCNNConfig, out):
    """Refined boxes + rotated NMS (point_rcnn_bbox_head.get_bboxes).
    Returns dict boxes/scores/labels/valid [B, R, ...]."""
    from ...core.nms import nms_bev

    samples = out['samples']
    rois = samples['rois']
    boxes = decode_refined(rois, out['rcnn']['reg'])
    scores = jax.nn.sigmoid(out['rcnn']['cls'][..., 0])
    valid = samples['roi_valid']
    labels = samples['roi_labels']

    def one(b, s, lab, v):
        bev = b[:, [0, 1, 3, 4, 6]]
        idx, _ = nms_bev(bev, s, cfg.bbox.test_nms_thr,
                         post_max_size=b.shape[0],
                         valid=v & (s >= cfg.bbox.test_score_thr))
        safe = jnp.maximum(idx, 0)
        return (b[safe], jnp.where(idx >= 0, s[safe], 0.0), lab[safe],
                idx >= 0)

    b, s, l, v = jax.vmap(one)(boxes, scores, labels, valid)
    return dict(boxes=b, scores=s, labels=l, valid=v)
