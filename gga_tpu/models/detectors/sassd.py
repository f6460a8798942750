"""SASSD: structure-aware single-stage detector.

TPU rebuild of the reference's SASSD
(/root/reference/mmdet3d/models/detectors/sassd.py:14 and the auxiliary
branch in mmdet3d/models/middle_encoders/sparse_encoder.py:218-520):
SECOND's voxel stack plus a train-time point-wise auxiliary network that
interpolates the first three sparse-encoder stages back to the voxel-mean
points (three_nn + inverse-distance weights, sparse_encoder.py:484-520),
predicts per-point foreground + center offsets, and adds focal/smooth-L1
auxiliary losses. The aux branch is dropped at test time.

TPU-first notes: batch handled by vmap over fixed-budget sparse tensors;
point/box membership via the canonical-frame ``points_in_rbbox``; all aux
math is masked static-shape. Deliberate deviation: the reference's offset
target for z is ``z_bottom * 1.5`` (sparse_encoder.py:404 — an apparent
bug; SA-SSD upstream uses the box gravity center); we regress to the
gravity center ``z_bottom + h / 2``.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.geometry import points_in_rbbox
from ...ops.points import three_interpolate, three_nn
from ...ops.voxelize import hard_voxelize
from ..backbones.second import SECOND
from ..dense_heads.anchor3d_head import Anchor3DConfig, Anchor3DHead
from ..losses import smooth_l1_loss
from ..middle_encoders import SparseEncoder
from ..necks.second_fpn import SECONDFPN
from ..voxel_encoders import HardSimpleVFE
from .voxelnet import SECONDNetConfig


@dataclasses.dataclass(frozen=True)
class SASSDConfig(SECONDNetConfig):
    """SECOND stack + aux branch (configs/sassd/sassd_6x8_80e_kitti-3d-3class
    in the reference uses the conv_module SparseEncoderSASSD)."""
    aux_channels: int = 64

    @classmethod
    def tiny(cls):
        head = Anchor3DConfig(
            feat_channels=32, nms_pre=32, max_num=16,
            anchor_ranges=((0, -40, -0.6, 71.68, 40, -0.6),
                           (0, -40, -0.6, 71.68, 40, -0.6),
                           (0, -40, -1.78, 71.68, 40, -1.78)))
        return cls(voxel_size=(0.32, 0.3125, 0.1), max_voxels=1024,
                   point_cloud_range=(0, -40, -3, 71.68, 40, 1),
                   sparse_shape=(41, 256, 224),
                   encoder_channels=((8,), (8, 8), (8, 8), (8, 8)),
                   encoder_paddings=((1,), (1, 1), (1, 1), ((0, 1, 1), 1)),
                   encoder_budgets=(1024, 1024, 1024),
                   encoder_out_budget=1024,
                   backbone_channels=(16, 32), backbone_layers=(1, 1),
                   backbone_strides=(1, 2), neck_channels=(16, 16),
                   neck_strides=(1, 2), aux_channels=16, head=head)


class SASSD(nn.Module):
    cfg: SASSDConfig

    @nn.compact
    def __call__(self, points, points_valid, train: bool = True):
        """Returns head predictions; in train mode also the aux tuple
        (pts_xyz [B,V,3], pts_valid [B,V], point_cls [B,V,1],
        point_reg [B,V,3]) — the reference's ``point_misc``."""
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
        bev, stages = SparseEncoder(
            in_channels=feats.shape[-1], base_channels=16,
            sparse_shape=tuple(c.sparse_shape),
            encoder_channels=tuple(c.encoder_channels),
            encoder_paddings=tuple(c.encoder_paddings),
            stage_budgets=tuple(c.encoder_budgets),
            out_budget=c.encoder_out_budget,
            block_type='conv_module', return_stages=True)(
                feats, coords, vvalid, train)

        aux = None
        if train:
            # voxel-mean xyz = first 3 feature channels of HardSimpleVFE
            # (sparse_encoder.py:308-310 uses voxel_features[:, :3])
            pts_xyz = feats[..., :3]
            interp = []
            for si in range(3):
                sf, sc, sv, sg = stages[si]
                scale = 2 ** si
                vs = jnp.asarray(
                    [c.voxel_size[0] * scale, c.voxel_size[1] * scale,
                     c.voxel_size[2] * scale], jnp.float32)
                off = jnp.asarray(c.point_cloud_range[:3], jnp.float32)

                def one(q, f, cc, vv, vs=vs, off=off):
                    # coords are (z, y, x); source centers in xyz
                    src = (cc[:, ::-1].astype(jnp.float32) + 0.5) * vs + off
                    d2, idx = three_nn(q, src, s_valid=vv)
                    return three_interpolate(f, idx, d2)

                interp.append(jax.vmap(one)(pts_xyz, sf, sc, sv))
            pw = jnp.concatenate(interp, axis=-1)
            pw = nn.Dense(c.aux_channels, use_bias=False,
                          name='point_fc')(pw)
            point_cls = nn.Dense(1, use_bias=False, name='point_cls')(pw)
            point_reg = nn.Dense(3, use_bias=False, name='point_reg')(pw)
            aux = (pts_xyz, vvalid, point_cls, point_reg)

        xs = SECOND(in_channels=bev.shape[-1],
                    out_channels=tuple(c.backbone_channels),
                    layer_nums=tuple(c.backbone_layers),
                    layer_strides=tuple(c.backbone_strides))(bev, train)
        fused = SECONDFPN(in_channels=tuple(c.backbone_channels),
                          out_channels=tuple(c.neck_channels),
                          upsample_strides=tuple(c.neck_strides))(xs, train)
        preds = Anchor3DHead(c.head)(fused, train)
        if train:
            return preds, aux
        return preds


def sassd_aux_loss(aux, gt_boxes, gt_valid, enlarge=1.0,
                   gamma=2.0, alpha=0.25):
    """Auxiliary point losses (sparse_encoder.py:412-454).

    Args:
        aux: (pts_xyz [B,V,3], pts_valid [B,V], point_cls [B,V,1],
              point_reg [B,V,3]) from the detector in train mode.
        gt_boxes: [B, M, 7] LiDAR boxes (bottom-center).
        gt_valid: [B, M] bool.

    Returns:
        dict(aux_loss_cls=..., aux_loss_reg=...), both scalars divided by
        batch size like the reference's ``/ num_boxes``.
    """
    pts_xyz, pts_valid, point_cls, point_reg = aux
    B = pts_xyz.shape[0]

    def targets(q, boxes, bvalid):
        big = boxes.at[:, 3:6].multiply(enlarge)
        inside = points_in_rbbox(q, big)            # [V, M]
        inside = inside & bvalid[None, :]
        label = inside.any(-1)
        first = jnp.argmax(inside, axis=-1)
        center = boxes[:, :3].at[:, 2].add(boxes[:, 5] / 2.0)
        off = q - center[first]
        return label, jnp.where(label[:, None], off, 0.0)

    labels, offsets = jax.vmap(targets)(pts_xyz, gt_boxes, gt_valid)
    labels = labels & pts_valid
    pos = labels.astype(jnp.float32)
    pos_norm = jnp.maximum(pos.sum(), 1.0)

    logit = point_cls[..., 0]
    p = jax.nn.sigmoid(logit)
    t = pos
    # sigmoid focal loss, alpha-balanced (mmdet sigmoid_focal_loss)
    ce = -(t * jax.nn.log_sigmoid(logit)
           + (1 - t) * jax.nn.log_sigmoid(-logit))
    pt = t * p + (1 - t) * (1 - p)
    w = (alpha * t + (1 - alpha) * (1 - t)) * (1 - pt) ** gamma
    cls_loss = jnp.sum(jnp.where(pts_valid, ce * w, 0.0)) / pos_norm / B

    reg = smooth_l1_loss(point_reg, offsets, beta=1 / 9.)
    reg_loss = jnp.sum(reg * pos[..., None]) / pos_norm / B
    return dict(aux_loss_cls=cls_loss, aux_loss_reg=reg_loss)
