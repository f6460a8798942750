"""PartA2: two-stage LiDAR detector (SparseUNet + RPN + part-aggregation
RoI refinement).

Rebuild of /root/reference/mmdet3d/models/detectors/parta2.py:1 +
configs/_base_/models/parta2.py as one flax module whose full two-stage
train forward — voxelize, UNet, RPN, proposal NMS, assign/sample, RoI-aware
pooling, bbox refinement — traces into a single XLA program.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.voxelize import hard_voxelize
from ..backbones.second import SECOND
from ..dense_heads.anchor3d_head import (Anchor3DConfig, Anchor3DHead,
                                         assign_targets, make_anchors)
from ..dense_heads.anchor3d_head import loss as rpn_loss
from ..dense_heads.parta2_rpn_head import rpn_proposals
from ..middle_encoders import SparseUNet
from ..necks.second_fpn import SECONDFPN
from ..roi_heads import (PartA2BboxConfig, PartA2BboxHead, RoIHeadConfig,
                         PointwiseSemanticHead, assign_and_sample,
                         bbox_head_loss, build_rcnn_targets,
                         pool_roi_features, semantic_loss,
                         semantic_targets)
from ..voxel_encoders import HardSimpleVFE


@dataclasses.dataclass(frozen=True)
class PartA2Config:
    voxel_size: Tuple[float, float, float] = (0.05, 0.05, 0.1)
    point_cloud_range: Tuple[float, ...] = (0, -40, -3, 70.4, 40, 1)
    max_points_per_voxel: int = 5
    max_voxels: int = 16000
    sparse_shape: Tuple[int, int, int] = (41, 1600, 1408)
    unet_channels: Sequence[Sequence[int]] = (
        (16,), (32, 32, 32), (64, 64, 64), (64, 64, 64))
    unet_decoder_channels: Sequence[Sequence[int]] = (
        (64, 64, 64), (64, 64, 32), (32, 32, 16), (16, 16, 16))
    unet_budgets: Tuple[int, ...] = (16000, 14000, 12000)
    unet_out_budget: int = 12000
    unet_out_channels: int = 128
    backbone_channels: Tuple[int, ...] = (128, 256)
    backbone_layers: Tuple[int, ...] = (5, 5)
    backbone_strides: Tuple[int, ...] = (1, 2)
    neck_channels: Tuple[int, ...] = (256, 256)
    neck_strides: Tuple[int, ...] = (1, 2)
    rpn: Anchor3DConfig = dataclasses.field(
        default_factory=lambda: Anchor3DConfig(
            feat_channels=512,
            anchor_ranges=((0, -40, -0.6, 70.4, 40, -0.6),
                           (0, -40, -0.6, 70.4, 40, -0.6),
                           (0, -40, -1.78, 70.4, 40, -1.78))))
    roi: RoIHeadConfig = dataclasses.field(default_factory=RoIHeadConfig)
    bbox: PartA2BboxConfig = dataclasses.field(
        default_factory=PartA2BboxConfig)
    # proposal cfg (train_cfg.rpn_proposal / test_cfg.rpn,
    # configs/_base_/models/parta2.py:144-150,190-196; nms_pre reduced
    # from 9000 to a static 1024 — scores beyond the top-1k never survive
    # NMS-512 in practice)
    train_nms_pre: int = 1024
    train_nms_thr: float = 0.8
    train_proposals: int = 512
    test_nms_pre: int = 1024
    test_nms_thr: float = 0.7
    test_proposals: int = 100

    @classmethod
    def tiny(cls):
        rpn = Anchor3DConfig(
            feat_channels=32, nms_pre=64, max_num=16,
            anchor_ranges=((0, -40, -0.6, 70.4, 40, -0.6),
                           (0, -40, -0.6, 70.4, 40, -0.6),
                           (0, -40, -1.78, 70.4, 40, -1.78)))
        return cls(
            voxel_size=(0.4, 0.5, 0.1), max_voxels=1024,
            sparse_shape=(41, 160, 176),
            unet_channels=((4,), (8, 8), (8, 8), (8, 8)),
            unet_decoder_channels=((8, 8, 8), (8, 8, 8), (8, 8, 4),
                                   (4, 4, 4)),
            unet_budgets=(1024, 1024, 1024), unet_out_budget=1024,
            unet_out_channels=8,
            backbone_channels=(16, 32), backbone_layers=(1, 1),
            neck_channels=(16, 16),
            rpn=rpn,
            roi=RoIHeadConfig(num_rois=16, roi_out_size=6,
                              roi_pts_budget=64),
            bbox=PartA2BboxConfig(
                seg_in_channels=4, seg_conv_channels=(8,),
                part_conv_channels=(8,), merge_conv_channels=(8,),
                down_conv_channels=(8,), shared_fc_channels=(8, 16),
                cls_channels=(8,), reg_channels=(8,), dropout_ratio=0.0),
            train_nms_pre=128, train_proposals=32,
            test_nms_pre=64, test_proposals=16)


class PartA2Detector(nn.Module):
    cfg: PartA2Config

    @nn.compact
    def __call__(self, points, points_valid, rng=None, gt_boxes=None,
                 gt_labels=None, gt_valid=None, train: bool = True):
        """Full two-stage forward.

        Train mode (gt given): returns dict with rpn preds, semantic preds
        and targets, sampled rois + rcnn preds/targets — feed to
        ``parta2_loss``.
        Test mode: returns proposals + refined (rois, cls, reg) for
        ``decode_parta2``.
        """
        c = self.cfg

        def vox(p, v):
            out = hard_voxelize(
                p, v, voxel_size=tuple(c.voxel_size),
                pc_range=tuple(c.point_cloud_range),
                max_points=c.max_points_per_voxel,
                max_voxels=c.max_voxels)
            return (out['voxels'], out['coords'], out['num_points'],
                    out['num_voxels'])

        voxels, coords, num_points, num_voxels = jax.vmap(vox)(
            points, points_valid)
        feats = HardSimpleVFE()(voxels, num_points)
        vvalid = jnp.arange(c.max_voxels)[None] < num_voxels[:, None]

        bev, seg_feats = SparseUNet(
            in_channels=feats.shape[-1],
            sparse_shape=tuple(c.sparse_shape),
            base_channels=c.unet_channels[0][0],
            output_channels=c.unet_out_channels,
            encoder_channels=tuple(c.unet_channels),
            decoder_channels=tuple(c.unet_decoder_channels),
            stage_budgets=tuple(c.unet_budgets),
            out_budget=c.unet_out_budget)(feats, coords, vvalid, train)

        xs = SECOND(in_channels=bev.shape[-1],
                    out_channels=tuple(c.backbone_channels),
                    layer_nums=tuple(c.backbone_layers),
                    layer_strides=tuple(c.backbone_strides))(bev, train)
        fused = SECONDFPN(in_channels=tuple(c.backbone_channels),
                          out_channels=tuple(c.neck_channels),
                          upsample_strides=tuple(c.neck_strides))(xs, train)
        rpn_preds = Anchor3DHead(c.rpn)(fused, train)

        sem = PointwiseSemanticHead(num_classes=c.rpn.num_classes)(
            seg_feats)

        # voxel centers (lidar xyz) from (z, y, x) grid coords
        vs = jnp.asarray(c.voxel_size)
        lo = jnp.asarray(c.point_cloud_range[:3])
        centers = jnp.stack(
            [(coords[..., 2] + 0.5) * vs[0] + lo[0],
             (coords[..., 1] + 0.5) * vs[1] + lo[1],
             (coords[..., 0] + 0.5) * vs[2] + lo[2]], -1)

        H, W = fused.shape[1:3]
        anchors = make_anchors(c.rpn, (H, W))
        if train:
            props = rpn_proposals(c.rpn, rpn_preds, anchors,
                                  nms_pre=c.train_nms_pre,
                                  nms_thr=c.train_nms_thr,
                                  num_proposals=c.train_proposals)
            pboxes = jax.lax.stop_gradient(props['boxes'])
            B = pboxes.shape[0]
            keys = jax.random.split(rng, B)
            samples = jax.vmap(
                lambda k, pb, pv, gb, gl, gv: assign_and_sample(
                    c.roi, k, pb, pv, gb, gl, gv))(
                keys, pboxes, props['valid'], gt_boxes, gt_labels,
                gt_valid)
            rois = samples['rois']
        else:
            props = rpn_proposals(c.rpn, rpn_preds, anchors,
                                  nms_pre=c.test_nms_pre,
                                  nms_thr=c.test_nms_thr,
                                  num_proposals=c.test_proposals)
            rois = props['boxes']
            samples = dict(rois=rois, roi_valid=props['valid'],
                           roi_scores=props['scores'],
                           roi_labels=props['labels'])

        seg_grids, part_grids, occ = jax.vmap(
            lambda sf, pf, ce, vv, ro: pool_roi_features(
                c.roi, sf, pf, ce, vv, ro))(
            seg_feats, sem['part_feats'], centers, vvalid, rois)

        B, R = rois.shape[:2]
        S = c.roi.roi_out_size
        cls_score, bbox_pred = PartA2BboxHead(c.bbox)(
            seg_grids.reshape(B * R, S, S, S, -1),
            part_grids.reshape(B * R, S, S, S, -1),
            occ.reshape(B * R, S, S, S), train)
        rcnn = dict(cls=cls_score.reshape(B, R, 1),
                    reg=bbox_pred.reshape(B, R, 7))
        return dict(rpn=rpn_preds, sem=sem, samples=samples, rcnn=rcnn,
                    centers=centers, vvalid=vvalid,
                    feature_map_size=(H, W))


def parta2_loss(cfg: PartA2Config, out, gt_boxes, gt_labels, gt_valid):
    """Total two-stage loss: RPN + semantic + RCNN."""
    c = cfg
    H, W = out['feature_map_size']
    anchors = make_anchors(c.rpn, (H, W))
    rpn_targets = jax.vmap(
        lambda gb, gl, gv: assign_targets(c.rpn, anchors, gb, gl, gv))(
        gt_boxes, gt_labels, gt_valid)
    loss_rpn, rpn_logs = rpn_loss(c.rpn, out['rpn'], anchors, rpn_targets)

    seg_t, part_t = jax.vmap(
        lambda ce, vv, gb, gl, gv: semantic_targets(
            c.rpn.num_classes, 0.2, ce, vv, gb, gl, gv))(
        out['centers'], out['vvalid'], gt_boxes, gt_labels, gt_valid)
    loss_seg, loss_part = semantic_loss(
        c.rpn.num_classes, out['sem']['seg_preds'],
        out['sem']['part_preds'], seg_t, part_t)

    rcnn_t = build_rcnn_targets(c.bbox, out['samples'])
    loss_rcnn, rcnn_logs = bbox_head_loss(
        c.bbox, out['rcnn']['cls'], out['rcnn']['reg'],
        out['samples']['rois'], rcnn_t)

    total = loss_rpn + loss_seg + loss_part + loss_rcnn
    rpn_logs = {f'rpn_{k}': v for k, v in rpn_logs.items()}
    logs = dict(loss_seg=loss_seg, loss_part=loss_part,
                **rpn_logs, **rcnn_logs)
    logs['loss_rpn'] = loss_rpn
    logs['loss'] = total
    return total, logs


def decode_parta2(cfg: PartA2Config, out):
    """Refined boxes + class-agnostic rotated NMS (test_cfg.rcnn,
    parta2_bbox_head.get_bboxes). Returns boxes/scores/labels/valid."""
    from ...core.nms import nms_bev
    from ..roi_heads import decode_refined

    samples = out['samples']
    rois = samples['rois']
    boxes = decode_refined(rois, out['rcnn']['reg'])
    scores = jax.nn.sigmoid(out['rcnn']['cls'][..., 0])
    valid = samples['roi_valid']
    labels = samples['roi_labels']

    def one(b, s, l, v):
        bev = b[:, [0, 1, 3, 4, 6]]
        idx, _ = nms_bev(bev, s, cfg.roi.test_nms_thr,
                         post_max_size=b.shape[0],
                         valid=v & (s > cfg.roi.test_score_thr))
        safe = jnp.maximum(idx, 0)
        return (b[safe], jnp.where(idx >= 0, s[safe], 0.0), l[safe],
                idx >= 0)

    b, s, l, v = jax.vmap(one)(boxes, scores, labels, valid)
    return dict(boxes=b, scores=s, labels=l, valid=v)
