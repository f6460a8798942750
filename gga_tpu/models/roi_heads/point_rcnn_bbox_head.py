"""PointRCNN RoI bbox head.

Rebuild of PointRCNNBboxHead
(/root/reference/mmdet3d/models/roi_heads/bbox_heads/point_rcnn_bbox_head.py:18):
pooled in-RoI points carry (canonical xyz, rpn objectness score,
normalized depth, backbone features); a small MLP lifts the 5 "xyz"
channels, merges with the backbone part, and a 3-stage PointNet SA stack
(last stage = group-all) produces one feature per RoI for IoU-regression
cls (BCE on soft IoU labels) and canonical-frame delta regression with
corner loss — the exact loss/target machinery PartA2 uses, so those
functions are shared (``canonical_targets``/``bbox_head_loss`` in
parta2_bbox_head.py with PointRCNN's 0.7/0.25 cls thresholds).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..backbones.pointnet2 import PointSAModule, SharedMLP


@dataclasses.dataclass(frozen=True)
class PointRCNNBboxConfig:
    num_classes: int = 1
    in_channels: int = 5          # canonical xyz + score + depth
    mlp_channels: Tuple[int, ...] = (128, 128)
    num_points: Tuple[int, ...] = (128, 32, -1)   # -1 = group all
    radii: Tuple[float, ...] = (0.2, 0.4, 100.0)
    num_samples: Tuple[int, ...] = (16, 16, 16)
    sa_channels: Sequence[Tuple[int, ...]] = (
        (128, 128, 128), (128, 128, 256), (256, 256, 512))
    cls_channels: Tuple[int, ...] = (256, 256)
    reg_channels: Tuple[int, ...] = (256, 256)
    with_corner_loss: bool = True
    # rcnn train cfg (configs/_base_/models/point_rcnn.py:124-125)
    cls_pos_thr: float = 0.7
    cls_neg_thr: float = 0.25
    loss_bbox_weight: float = 1.0
    loss_cls_weight: float = 1.0
    # test cfg
    test_nms_thr: float = 0.1
    test_score_thr: float = 0.1


class PointRCNNBboxHead(nn.Module):
    cfg: PointRCNNBboxConfig

    @nn.compact
    def __call__(self, pooled, roi_valid, train: bool = True):
        """pooled: [R, S, in_channels + C_rpn] per-RoI point features
        (canonical xyz first); roi_valid: [R] (non-empty RoIs).

        Returns (cls_score [R, 1], bbox_pred [R, 7])."""
        c = self.cfg
        R, S = pooled.shape[:2]
        pt_valid = jnp.broadcast_to(roi_valid[:, None], (R, S))

        xyz_in = pooled[..., :c.in_channels]
        rpn_in = pooled[..., c.in_channels:]
        xyz_feat = SharedMLP(tuple(c.mlp_channels),
                             name='xyz_up')(xyz_in, pt_valid, train)
        merged = jnp.concatenate([xyz_feat, rpn_in], -1)
        feats = SharedMLP((c.mlp_channels[-1],),
                          name='merge_down')(merged, pt_valid, train)

        xyz = pooled[..., :3]
        valid = pt_valid
        for i in range(len(c.sa_channels)):
            if c.num_points[i] > 0:
                xyz, feats, valid = PointSAModule(
                    c.num_points[i], c.radii[i], c.num_samples[i],
                    tuple(c.sa_channels[i]), name=f'sa{i}')(
                        xyz, feats, valid, train)
            else:
                # group-all: one output "point" per RoI
                g = SharedMLP(tuple(c.sa_channels[i]), name=f'sa{i}')(
                    jnp.concatenate([xyz, feats], -1), valid, train)
                neg = jnp.finfo(g.dtype).min
                feats = jnp.where(valid[..., None], g, neg).max(
                    axis=1, keepdims=True)
                feats = jnp.where(valid.any(-1)[:, None, None], feats,
                                  0.0)
                valid = valid.any(-1)[:, None]
                xyz = xyz[:, :1]

        x = feats[:, 0]                                   # [R, C]
        rv = valid[:, 0]

        def branch(x, chans, out_ch, name):
            h = SharedMLP(tuple(chans), name=name)(x, rv, train)
            return nn.Dense(out_ch, name=f'{name}_out')(h)

        cls_score = branch(x, c.cls_channels, c.num_classes, 'cls')
        bbox_pred = branch(x, c.reg_channels, 7 * c.num_classes, 'reg')
        return cls_score, bbox_pred
