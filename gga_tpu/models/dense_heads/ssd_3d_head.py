"""3DSSD anchor-free head.

Rebuild of SSD3DHead
(/root/reference/mmdet3d/models/dense_heads/ssd_3d_head.py:16) +
AnchorFreeBBoxCoder (core/bbox/coders/anchor_free_bbox_coder.py:10):
candidates = the F-FPS half of the last SA level; a vote module (no
residual features, offsets clamped to ``vote_xyz_range``) shifts them;
a 'spec' MSG aggregation groups ALL seeds around the votes; shared
convs predict per-class centerness logits and (center offset, half-dim
sizes, dir bins) regression. Losses: BCE centerness on soft
min/max-face-ratio targets, smooth-L1 center/size/dir-res/corner/vote,
CE dir class — every reference python per-sample loop is vmapped masked
math on static shapes.

Test-time delta (documented): ``per_class_proposal`` duplication of
every box under all class labels is skipped — labels come from the
semantic argmax (static output shapes; the duplication only inflates
indoor mAP bookkeeping).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core import geometry as geo
from ...core.nms import aligned_3d_nms
from ..backbones.pointnet2 import PointSAModuleMSG, SharedMLP
from ..layers import conv_init
from ..losses import smooth_l1_loss


@dataclasses.dataclass(frozen=True)
class SSD3DConfig:
    num_classes: int = 1
    num_dir_bins: int = 12
    in_channels: int = 256
    num_candidates: int = 256       # vote_module_cfg.num_points
    vote_conv_channels: Tuple[int, ...] = (128,)
    vote_xyz_range: Tuple[float, float, float] = (3.0, 3.0, 2.0)
    agg_radii: Tuple[float, ...] = (4.8, 6.4)
    agg_samples: Tuple[int, ...] = (16, 32)
    agg_mlps: Sequence[Tuple[int, ...]] = (
        (256, 256, 256, 512), (256, 256, 512, 1024))
    shared_conv_channels: Tuple[int, ...] = (512, 128)
    cls_conv_channels: Tuple[int, ...] = (128,)
    reg_conv_channels: Tuple[int, ...] = (128,)
    # train cfg (configs/_base_/models/3dssd.py:71-72)
    pos_distance_thr: float = 10.0
    expand_dims_length: float = 0.05
    # loss weights (all 1.0 in the reference's 'sum' losses)
    # test cfg
    nms_thr: float = 0.1
    score_thr: float = 0.0
    max_out: int = 100


class SSD3DHead(nn.Module):
    cfg: SSD3DConfig

    @nn.compact
    def __call__(self, feat_dict, train: bool = True):
        """feat_dict from PointNet2SAMSG (sa_xyz/sa_features/sa_valid).

        Candidates are the first ``num_candidates`` seeds — the F-FPS
        half of the final FS/F-FPS+D-FPS level (sample order guaranteed
        by ``sample_points_multi_mode``)."""
        c = self.cfg
        seed_xyz = feat_dict['sa_xyz'][-1]
        seed_feat = feat_dict['sa_features'][-1]
        seed_valid = feat_dict['sa_valid'][-1]
        cand_xyz = seed_xyz[:, :c.num_candidates]
        cand_feat = seed_feat[:, :c.num_candidates]
        cand_valid = seed_valid[:, :c.num_candidates]

        # vote module: offsets only (with_res_feat=False), clamped
        x = SharedMLP(tuple(c.vote_conv_channels), name='vote_mlp')(
            cand_feat, cand_valid, train)
        offset = nn.Dense(3, kernel_init=conv_init, name='vote_out')(x)
        rng3 = jnp.asarray(c.vote_xyz_range, jnp.float32)
        offset = jnp.clip(offset, -rng3, rng3)
        vote_xyz = cand_xyz + offset

        # 'spec' aggregation around votes over ALL seeds
        agg_xyz, agg_feat, agg_valid = PointSAModuleMSG(
            (c.num_candidates,), tuple(c.agg_radii),
            tuple(c.agg_samples),
            tuple(tuple(m) for m in c.agg_mlps),
            name='vote_aggregation')(
                seed_xyz, seed_feat, seed_valid, train,
                target_xyz=vote_xyz, target_valid=cand_valid)

        y = SharedMLP(tuple(c.shared_conv_channels), name='pred_shared')(
            agg_feat, agg_valid, train)
        h_cls = SharedMLP(tuple(c.cls_conv_channels), name='cls_convs')(
            y, agg_valid, train)
        obj = nn.Dense(c.num_classes, kernel_init=conv_init,
                       name='conv_cls')(h_cls)
        h_reg = SharedMLP(tuple(c.reg_conv_channels), name='reg_convs')(
            y, agg_valid, train)
        reg = nn.Dense(3 + 3 + 2 * c.num_dir_bins, kernel_init=conv_init,
                       name='conv_reg')(h_reg)

        center_offset = reg[..., :3]
        size = reg[..., 3:6]
        dir_cls = reg[..., 6:6 + c.num_dir_bins]
        dir_res_norm = reg[..., 6 + c.num_dir_bins:]
        return dict(seed_xyz=cand_xyz, seed_valid=cand_valid,
                    vote_offset=offset, vote_xyz=vote_xyz,
                    agg_xyz=agg_xyz, agg_valid=agg_valid,
                    obj=obj, center_offset=center_offset,
                    center=jax.lax.stop_gradient(agg_xyz) + center_offset,
                    size=size, dir_cls=dir_cls,
                    dir_res_norm=dir_res_norm)


def _angle2class(yaw, num_bins):
    """PartialBinBasedBBoxCoder.angle2class (bin centers at k*2pi/N)."""
    bin_w = 2 * np.pi / num_bins
    shifted = (yaw % (2 * np.pi) + bin_w / 2) % (2 * np.pi)
    cls = jnp.clip((shifted // bin_w).astype(jnp.int32), 0, num_bins - 1)
    res = shifted - (cls.astype(jnp.float32) * bin_w + bin_w / 2)
    return cls, res


def ssd3d_targets_single(cfg: SSD3DConfig, gt_boxes, gt_labels, gt_valid,
                         agg_xyz, seed_xyz):
    """get_targets_single (ssd_3d_head.py:309): per-proposal targets.
    gt_boxes lidar bottom-center [G, 7]."""
    grav = gt_boxes[:, :3].at[:, 2].add(gt_boxes[:, 5] / 2)
    size_res = gt_boxes[:, 3:6] / 2
    dir_cls_t, dir_res_t = _angle2class(gt_boxes[:, 6], cfg.num_dir_bins)
    dir_res_t = dir_res_t / (2 * np.pi / cfg.num_dir_bins)

    inbox = geo.points_in_rbbox(agg_xyz, gt_boxes) & gt_valid[None, :]
    assign = jnp.argmax(inbox, 1)

    center_t = grav[assign]
    size_t = size_res[assign]
    mask_t = jnp.clip(gt_labels[assign], 0, cfg.num_classes - 1)
    dc_t = dir_cls_t[assign]
    dr_t = dir_res_t[assign]
    corners = geo.boxes7_to_corners(gt_boxes)[assign]      # [S, 8, 3]

    top_center = center_t.at[:, 2].add(size_t[:, 2])
    dist = jnp.linalg.norm(agg_xyz - top_center, axis=-1)
    positive = inbox.any(1) & (dist < cfg.pos_distance_thr)
    negative = ~inbox.any(1)

    # centerness: min/max face-distance ratios in the canonical frame
    rel = agg_xyz - center_t
    yaw = gt_boxes[assign, 6]
    cs, sn = jnp.cos(-yaw), jnp.sin(-yaw)
    cx = rel[:, 0] * cs - rel[:, 1] * sn
    cy = rel[:, 0] * sn + rel[:, 1] * cs
    canon = jnp.stack([cx, cy, rel[:, 2]], -1)
    near = jnp.maximum(size_t - canon, 0.0)
    far = jnp.maximum(size_t + canon, 0.0)
    ratio = jnp.minimum(near, far) / jnp.maximum(
        jnp.maximum(near, far), 1e-8)
    ctr = jnp.clip(jnp.prod(ratio, -1), 0.0, None) ** (1.0 / 3)
    ctr = jnp.clip(ctr, 0.0, 1.0)
    ctr_t = ctr[:, None] * jax.nn.one_hot(mask_t, cfg.num_classes)

    # vote targets from seeds inside slightly-enlarged boxes
    e = cfg.expand_dims_length
    enlarged = gt_boxes.at[:, 3:6].add(2 * e).at[:, 2].add(-e)
    vin = geo.points_in_rbbox(seed_xyz, enlarged) & gt_valid[None, :]
    vassign = jnp.argmax(vin, 1)
    vote_t = grav[vassign] - seed_xyz
    vote_mask = vin.any(1)

    return dict(center_targets=center_t, size_res_targets=size_t,
                dir_class_targets=dc_t, dir_res_targets=dr_t,
                mask_targets=mask_t, centerness_targets=ctr_t,
                corner_targets=corners, vote_targets=vote_t,
                vote_mask=vote_mask, positive=positive,
                negative=negative)


def ssd3d_loss(cfg: SSD3DConfig, preds, gt_boxes, gt_labels, gt_valid):
    """Batched loss (ssd_3d_head.py:115-220)."""
    t = jax.vmap(lambda gb, gl, gv, ax, sx: ssd3d_targets_single(
        cfg, gb, gl, gv, ax, sx))(
        gt_boxes, gt_labels, gt_valid,
        jax.lax.stop_gradient(preds['agg_xyz']),
        jax.lax.stop_gradient(preds['seed_xyz']))

    pos = t['positive'].astype(jnp.float32)
    neg = t['negative'].astype(jnp.float32)
    ctr_w = jnp.broadcast_to((pos + neg)[..., None],
                             t['centerness_targets'].shape)
    ctr_w = ctr_w / (ctr_w.sum() + 1e-6)
    logits = preds['obj']
    bce = (jnp.maximum(logits, 0) - logits * t['centerness_targets']
           + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    centerness_loss = (bce * ctr_w).sum()

    blw = pos / (pos.sum() + 1e-6)
    center_off_t = t['center_targets'] - jax.lax.stop_gradient(
        preds['agg_xyz'])
    center_loss = (smooth_l1_loss(preds['center_offset'], center_off_t)
                   * blw[..., None]).sum()

    logp = jax.nn.log_softmax(preds['dir_cls'], -1)
    dir_class_loss = (-jnp.take_along_axis(
        logp, t['dir_class_targets'][..., None], -1)[..., 0]
        * blw).sum()

    onehot = jax.nn.one_hot(t['dir_class_targets'], cfg.num_dir_bins)
    dir_res_loss = (smooth_l1_loss(
        preds['dir_res_norm'],
        jnp.broadcast_to(t['dir_res_targets'][..., None],
                         preds['dir_res_norm'].shape))
        * onehot * blw[..., None]).sum()

    size_loss = (smooth_l1_loss(preds['size'], t['size_res_targets'])
                 * blw[..., None]).sum()

    # corner loss on boxes decoded with TARGET dir class (ssd head :185)
    boxes = decode_ssd3d_boxes(cfg, preds, dir_onehot=onehot)
    pred_corners = geo.boxes7_to_corners(boxes)
    corner_loss = (smooth_l1_loss(pred_corners, t['corner_targets'])
                   * blw[..., None, None]).sum()

    vmask = t['vote_mask'].astype(jnp.float32)
    vmask = vmask / (vmask.sum() + 1e-6)
    vote_loss = (smooth_l1_loss(preds['vote_offset'], t['vote_targets'])
                 * vmask[..., None]).sum()

    total = (centerness_loss + center_loss + dir_class_loss
             + dir_res_loss + size_loss + corner_loss + vote_loss)
    logs = dict(centerness_loss=centerness_loss, center_loss=center_loss,
                dir_class_loss=dir_class_loss, dir_res_loss=dir_res_loss,
                size_res_loss=size_loss, corner_loss=corner_loss,
                vote_loss=vote_loss, loss=total)
    return total, logs


def decode_ssd3d_boxes(cfg: SSD3DConfig, preds, dir_onehot=None):
    """AnchorFreeBBoxCoder.decode: center + clamp(size*2, 0.1) + binned
    yaw. Returns lidar BOTTOM-center boxes [B, S, 7]."""
    bin_w = 2 * np.pi / cfg.num_dir_bins
    if dir_onehot is None:
        dir_onehot = jax.nn.one_hot(
            jnp.argmax(preds['dir_cls'], -1), cfg.num_dir_bins)
    dir_res = (preds['dir_res_norm'] * bin_w * dir_onehot).sum(-1)
    cls_angle = (jnp.argmax(dir_onehot, -1).astype(jnp.float32) * bin_w)
    yaw = cls_angle + dir_res
    yaw = jnp.where(yaw > np.pi, yaw - 2 * np.pi, yaw)
    dims = jnp.clip(preds['size'] * 2, 0.1, None)
    center = preds['center']
    bottom_z = center[..., 2] - dims[..., 2] / 2
    return jnp.concatenate(
        [center[..., :2], bottom_z[..., None], dims, yaw[..., None]], -1)


def decode_ssd3d(cfg: SSD3DConfig, preds):
    """get_bboxes + multiclass_nms_single (ssd_3d_head.py:442-540):
    class-aware aligned-BEV NMS over corner min/max boxes."""
    sem = jax.nn.sigmoid(preds['obj'])
    obj = sem.max(-1)
    labels = sem.argmax(-1)
    boxes = decode_ssd3d_boxes(cfg, preds)

    def one(b, s, lab, v):
        corners = geo.boxes7_to_corners(b)
        lo = corners.min(1)
        hi = corners.max(1)
        # reference NMS is 2D (x, y): neutralize z overlap
        aligned = jnp.concatenate(
            [lo[:, :2], jnp.zeros_like(lo[:, :1]),
             hi[:, :2], jnp.ones_like(hi[:, :1])], -1)
        keep = aligned_3d_nms(aligned, s, lab, cfg.nms_thr,
                              valid=v & (s >= cfg.score_thr))
        order = jnp.argsort(jnp.where(keep, -s, jnp.inf))[:cfg.max_out]
        kept = keep[order]
        return b[order], jnp.where(kept, s[order], 0.0), lab[order], kept

    b, s, l, v = jax.vmap(one)(boxes, obj, labels, preds['agg_valid'])
    return dict(boxes=b, scores=s, labels=l, valid=v)
