"""Point-wise semantic + part-location head for PartA2.

Batched, static-shape rebuild of PointwiseSemanticHead
(/root/reference/mmdet3d/models/roi_heads/mask_heads/pointwise_semantic_head.py:13):
two linear layers on per-voxel features predicting foreground score and
intra-object part offsets; targets from (enlarged) GT boxes; sigmoid focal
seg loss (sum, normalized by positives) + BCE part loss.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core import geometry as geo


class PointwiseSemanticHead(nn.Module):
    num_classes: int = 3
    extra_width: float = 0.2
    seg_score_thr: float = 0.3

    @nn.compact
    def __call__(self, x):
        """x: [B, N, C] voxel-wise features.

        Returns dict(seg_preds [B, N, 1], part_preds [B, N, 3],
        part_feats [B, N, 4]) — part_feats detached, offsets zeroed below
        the score threshold (pointwise_semantic_head.py:66-76).
        """
        seg_preds = nn.Dense(1)(x)
        part_preds = nn.Dense(3)(x)
        seg_scores = jax.lax.stop_gradient(jax.nn.sigmoid(seg_preds))
        seg_mask = seg_scores > self.seg_score_thr
        part_offsets = jax.lax.stop_gradient(jax.nn.sigmoid(part_preds))
        part_offsets = jnp.where(seg_mask, part_offsets, 0.0)
        part_feats = jnp.concatenate([part_offsets, seg_scores], axis=-1)
        return dict(seg_preds=seg_preds, part_preds=part_preds,
                    part_feats=part_feats)


def _first_box_idx(mask):
    """[P, G] bool -> index of the first containing box (-1 if none),
    reproducing points_in_boxes_part's single-assignment."""
    any_hit = mask.any(-1)
    return jnp.where(any_hit, jnp.argmax(mask, axis=-1), -1)


def semantic_targets(num_classes, extra_width, voxel_centers, voxel_valid,
                     gt_boxes, gt_labels, gt_valid):
    """Per-sample seg/part targets (get_targets_single:80-127).

    Args:
        voxel_centers: [N, 3]; voxel_valid: [N].
        gt_boxes: [G, 7] lidar bottom-center; gt_labels: [G] int32;
        gt_valid: [G].

    Returns:
        seg_targets [N] int32 in {-1 (ignore), 0..C-1 (fg), C (bg)},
        part_targets [N, 3] float32.
    """
    big = jnp.where(gt_valid[None, :],
                    geo.points_in_rbbox(voxel_centers, gt_boxes), False)
    enl = gt_boxes.at[:, 3:6].add(extra_width * 2).at[:, 2].add(
        -extra_width)
    big_enl = jnp.where(gt_valid[None, :],
                        geo.points_in_rbbox(voxel_centers, enl), False)
    box_idx = _first_box_idx(big)
    enl_idx = _first_box_idx(big_enl)

    fg = box_idx > -1
    labels_pad = jnp.concatenate(
        [jnp.full((1,), num_classes, gt_labels.dtype), gt_labels])
    seg_targets = labels_pad[box_idx + 1]
    ignore = fg ^ (enl_idx > -1)
    seg_targets = jnp.where(ignore, -1, seg_targets)
    seg_targets = jnp.where(voxel_valid, seg_targets, -1)

    # part offsets in the containing box's canonical frame
    b = gt_boxes[jnp.maximum(box_idx, 0)]                      # [N, 7]
    rel = voxel_centers - b[:, :3]
    c, s = jnp.cos(-b[:, 6]), jnp.sin(-b[:, 6])
    lx = rel[:, 0] * c - rel[:, 1] * s
    ly = rel[:, 0] * s + rel[:, 1] * c
    part = jnp.stack([lx / jnp.maximum(b[:, 3], 1e-6) + 0.5,
                      ly / jnp.maximum(b[:, 4], 1e-6) + 0.5,
                      rel[:, 2] / jnp.maximum(b[:, 5], 1e-6)], -1)
    part = jnp.clip(part, 0.0, None)
    part = jnp.where((fg & voxel_valid)[:, None], part, 0.0)
    return seg_targets.astype(jnp.int32), part


def semantic_loss(num_classes, seg_preds, part_preds, seg_targets,
                  part_targets, gamma=2.0, alpha=0.25):
    """Focal seg loss + BCE part loss (pointwise_semantic_head.py:162-205).

    Args: batched [B, N, ...] predictions/targets.
    """
    binary_target = ((seg_targets > -1)
                     & (seg_targets < num_classes)).astype(jnp.float32)
    pos = binary_target
    neg = (seg_targets == num_classes).astype(jnp.float32)
    weights = pos + neg
    pos_normalizer = jnp.maximum(pos.sum(), 1.0)
    weights = weights / pos_normalizer

    p = jax.nn.sigmoid(seg_preds[..., 0])
    pt = jnp.where(binary_target > 0, 1 - p, p)
    alpha_t = jnp.where(binary_target > 0, alpha, 1 - alpha)
    ce = -jnp.log(jnp.clip(jnp.where(binary_target > 0, p, 1 - p),
                           1e-12, 1.0))
    loss_seg = (alpha_t * (pt ** gamma) * ce * weights).sum()

    logits = part_preds
    bce = (jnp.maximum(logits, 0) - logits * part_targets
           + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    pos_mask = binary_target > 0
    loss_part = jnp.where(pos_mask[..., None], bce, 0.0).sum() / (
        3.0 * jnp.maximum(pos_mask.sum(), 1.0))
    return loss_seg, loss_part
