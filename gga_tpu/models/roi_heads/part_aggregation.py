"""PartAggregationROIHead: assign/sample proposals, RoI-aware pooling of
seg+part features, PartA2BboxHead refinement.

Static-shape rebuild of
/root/reference/mmdet3d/models/roi_heads/part_aggregation_roi_head.py:14.

Documented deltas vs the reference's IoUNegPiecewiseSampler
(core/bbox/samplers/iou_neg_piecewise_sampler.py): sampling keeps fixed
[num_rois] slots with validity masks, positives capped at
round(num * pos_fraction), and the 0.8/0.2 hard/easy negative quota is
enforced by interleaved ranking (hard negatives admitted 4x as densely as
easy ones) instead of exact per-piece counts — same expected composition,
fully static shapes.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ...core.rotated_iou import rotated_iou_3d
from ...ops.roiaware_pool import roiaware_pool3d
from .parta2_bbox_head import canonical_targets


@dataclasses.dataclass(frozen=True)
class RoIHeadConfig:
    num_rois: int = 128
    pos_fraction: float = 0.55
    pos_iou_thr: float = 0.55          # rcnn assigner (all classes 0.55)
    hard_neg_iou_thr: float = 0.1      # neg_iou_piece_thrs[1]
    hard_neg_fraction: float = 0.8     # neg_piece_fractions[0]
    roi_out_size: int = 14
    roi_pts_budget: int = 512
    # test cfg
    test_nms_thr: float = 0.01
    test_score_thr: float = 0.1


def assign_and_sample(cfg: RoIHeadConfig, rng, proposals, prop_valid,
                      gt_boxes, gt_labels, gt_valid):
    """Per-sample assignment + static sampling.

    Args:
        proposals: [P, 7]; prop_valid: [P];
        gt_boxes: [G, 7]; gt_labels: [G]; gt_valid: [G].

    Returns dict with [num_rois] slots:
        rois [R, 7], roi_valid, ious, pos_mask, gt_of_roi [R, 7],
        gt_label_of_roi [R].
    """
    P = proposals.shape[0]
    iou = rotated_iou_3d(proposals, gt_boxes)            # [P, G]
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    max_iou = jnp.where(prop_valid, iou.max(-1), -1.0)
    argmax = iou.argmax(-1)

    pos = (max_iou >= cfg.pos_iou_thr) & prop_valid
    hard_neg = (~pos & prop_valid & (max_iou >= cfg.hard_neg_iou_thr)
                & (max_iou < cfg.pos_iou_thr))
    easy_neg = ~pos & ~hard_neg & prop_valid

    num_pos_max = int(round(cfg.num_rois * cfg.pos_fraction))
    r = jax.random.uniform(rng, (P,))
    # rank within each group (random order)
    def group_rank(mask):
        key = jnp.where(mask, r, 2.0)
        order = jnp.argsort(key)
        rank = jnp.zeros((P,), jnp.float32).at[order].set(
            jnp.arange(P, dtype=jnp.float32))
        return jnp.where(mask, rank, jnp.inf)

    pos_rank = group_rank(pos)
    hard_rank = group_rank(hard_neg)
    easy_rank = group_rank(easy_neg)
    # priority: positives (capped) first, then interleaved negatives
    BIG = 1e6
    key = jnp.where(pos & (pos_rank < num_pos_max), pos_rank,
                    jnp.where(hard_neg, BIG + hard_rank
                              / cfg.hard_neg_fraction,
                              jnp.where(easy_neg, BIG + easy_rank
                                        / (1 - cfg.hard_neg_fraction),
                                        jnp.inf)))
    # overflow positives become lowest-priority (the reference drops them)
    key = jnp.where(pos & (pos_rank >= num_pos_max), 2 * BIG + pos_rank,
                    key)
    order = jnp.argsort(key)[:cfg.num_rois]
    sel_valid = jnp.isfinite(key[order])
    rois = proposals[order]
    return dict(
        rois=rois,
        roi_valid=sel_valid,
        ious=jnp.where(sel_valid, max_iou[order], 0.0),
        pos_mask=pos[order] & sel_valid & (pos_rank[order] < num_pos_max),
        gt_of_roi=gt_boxes[argmax[order]],
        gt_label_of_roi=gt_labels[argmax[order]])


def pool_roi_features(cfg: RoIHeadConfig, seg_feats, part_feats,
                      voxel_centers, voxel_valid, rois):
    """RoI-aware pooling for one sample (seg: max, part: avg —
    configs/_base_/models/parta2.py:76-89). Returns
    (seg_grids, part_grids, occ)."""
    seg_grids, occ = roiaware_pool3d(
        seg_feats, voxel_centers, voxel_valid, rois,
        out_size=cfg.roi_out_size, mode='max',
        pts_budget=cfg.roi_pts_budget)
    part_grids, _ = roiaware_pool3d(
        part_feats, voxel_centers, voxel_valid, rois,
        out_size=cfg.roi_out_size, mode='avg',
        pts_budget=cfg.roi_pts_budget)
    return seg_grids, part_grids, occ


def build_rcnn_targets(bbox_cfg, samples):
    """Vmapped canonical targets over the batch; adds gt_of_roi for the
    corner loss."""
    t = jax.vmap(lambda ro, gt, io, pm, rv: canonical_targets(
        bbox_cfg, ro, gt, io, pm, rv))(
            samples['rois'], samples['gt_of_roi'], samples['ious'],
            samples['pos_mask'], samples['roi_valid'])
    t['gt_of_roi'] = samples['gt_of_roi']
    return t
