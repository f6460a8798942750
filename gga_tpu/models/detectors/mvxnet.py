"""MVXNet: point-level LiDAR-camera fusion detector.

TPU rebuild of the reference's DynamicMVXFasterRCNN
(/root/reference/mmdet3d/models/detectors/mvx_faster_rcnn.py:23, config
configs/mvxnet/dv_mvx-fpn_second_secfpn_adamw_2x8_80e_kitti-3d-3class.py):
image ResNet+FPN -> DynamicVFE whose last layer fuses per-point image
features via PointFusion (voxel_encoder.py:119 DynamicVFE,
fusion at i == len(vfe_layers) - 1) -> dynamic scatter-max to voxels ->
SparseEncoder -> SECOND -> SECONDFPN -> Anchor3DHead.

TPU-first: points/voxels are fixed-budget with validity masks; the dynamic
VFE is segment means/maxes over point->voxel ids (sorted-voxel invariant
preserved for the sparse engine); image sampling is four static gathers.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.scatter import assign_point_voxel_ids
from ...ops.voxelize import dynamic_voxelize, hard_voxelize
from ..backbones.resnet import ResNet
from ..backbones.second import SECOND
from ..dense_heads.anchor3d_head import Anchor3DConfig, Anchor3DHead
from ..fusion_layers import PointFusion
from ..voxel_encoders import DynamicVFE
from ..middle_encoders import SparseEncoder
from ..necks.fpn import FPN
from ..necks.second_fpn import SECONDFPN


@dataclasses.dataclass(frozen=True)
class MVXNetConfig:
    voxel_size: Tuple[float, float, float] = (0.05, 0.05, 0.1)
    point_cloud_range: Tuple[float, ...] = (0, -40, -3, 70.4, 40, 1)
    max_voxels: int = 16000
    max_points: int = 24000
    sparse_shape: Tuple[int, int, int] = (41, 1600, 1408)
    # image branch
    img_depth: int = 50
    img_base_planes: int = 64
    img_fpn_channels: int = 256
    img_levels: Tuple[int, ...] = (0, 1, 2, 3)
    # dynamic VFE (dv_mvx config: feat_channels=[64, 64])
    vfe_channels: Tuple[int, ...] = (64, 64)
    fusion_mid_channels: int = 128
    fusion_out_channels: int = 128
    # sparse encoder + 2D stack (SECOND-class)
    encoder_channels: Sequence = ((16,), (32, 32, 32), (64, 64, 64),
                                  (64, 64, 64))
    encoder_paddings: Sequence = ((1,), (1, 1, 1), (1, 1, 1),
                                  ((0, 1, 1), 1, 1))
    encoder_budgets: Tuple[int, ...] = (16000, 14000, 12000)
    encoder_out_budget: int = 12000
    backbone_channels: Tuple[int, ...] = (128, 256)
    backbone_layers: Tuple[int, ...] = (5, 5)
    backbone_strides: Tuple[int, ...] = (1, 2)
    neck_channels: Tuple[int, ...] = (256, 256)
    neck_strides: Tuple[int, ...] = (1, 2)
    head: Anchor3DConfig = dataclasses.field(
        default_factory=lambda: Anchor3DConfig(
            anchor_ranges=((0, -40, -0.6, 70.4, 40, -0.6),
                           (0, -40, -0.6, 70.4, 40, -0.6),
                           (0, -40, -1.78, 70.4, 40, -1.78))))

    @classmethod
    def tiny(cls):
        head = Anchor3DConfig(
            feat_channels=32, nms_pre=32, max_num=16,
            anchor_ranges=((0, -40, -0.6, 71.68, 40, -0.6),
                           (0, -40, -0.6, 71.68, 40, -0.6),
                           (0, -40, -1.78, 71.68, 40, -1.78)))
        return cls(voxel_size=(0.32, 0.3125, 0.1), max_voxels=1024,
                   max_points=2048,
                   point_cloud_range=(0, -40, -3, 71.68, 40, 1),
                   sparse_shape=(41, 256, 224),
                   img_depth=18, img_base_planes=8, img_fpn_channels=16,
                   img_levels=(0, 1, 2),
                   vfe_channels=(16, 16), fusion_mid_channels=16,
                   fusion_out_channels=16,
                   encoder_channels=((8,), (8, 8), (8, 8), (8, 8)),
                   encoder_paddings=((1,), (1, 1), (1, 1), ((0, 1, 1), 1)),
                   encoder_budgets=(1024, 1024, 1024),
                   encoder_out_budget=1024,
                   backbone_channels=(16, 32), backbone_layers=(1, 1),
                   backbone_strides=(1, 2), neck_channels=(16, 16),
                   neck_strides=(1, 2), head=head)


class MVXNet(nn.Module):
    cfg: MVXNetConfig

    @nn.compact
    def __call__(self, points, points_valid, img, lidar2img,
                 train: bool = True):
        """points [B, P, 4]; points_valid [B, P]; img [B, H, W, 3] NHWC;
        lidar2img [B, 4, 4]. Returns Anchor3DHead predictions."""
        c = self.cfg
        vs = tuple(c.voxel_size)
        rng = tuple(c.point_cloud_range)
        grid_zyx = tuple(c.sparse_shape)
        img_shape = img.shape[1:3]

        # ---- image branch ----
        img_stages = ResNet(depth=c.img_depth,
                            base_planes=c.img_base_planes)(img, train)
        img_feats = FPN(out_channels=c.img_fpn_channels,
                        num_outs=len(c.img_levels))(img_stages, train)

        # ---- dynamic voxelization (voxel list + per-point ids) ----
        def vox(p, v):
            out = hard_voxelize(p, v, voxel_size=vs, pc_range=rng,
                                max_points=1, max_voxels=c.max_voxels)
            pc, ok = dynamic_voxelize(p, v, voxel_size=vs, pc_range=rng)
            ids = assign_point_voxel_ids(pc, out['coords'], ok,
                                         out['coords'][:, 0] >= 0, grid_zyx)
            vvalid = jnp.arange(c.max_voxels) < out['num_voxels']
            return out['coords'], ids, ok, vvalid

        coords, ids, pok, vvalid = jax.vmap(vox)(points, points_valid)

        # ---- dynamic VFE; image features fused before the last scatter ----
        pts_xyz = points[..., :3]
        fusion_mod = PointFusion(
            img_channels=(c.img_fpn_channels,) * len(c.img_levels),
            pts_channels=c.vfe_channels[-1],
            mid_channels=c.fusion_mid_channels,
            out_channels=c.fusion_out_channels,
            img_levels=tuple(range(len(c.img_levels))),
            name='fusion')

        def fusion(point_feats, ok):
            return fusion_mod(img_feats, pts_xyz, point_feats, ok,
                              lidar2img, img_shape, train)

        vfeat = DynamicVFE(
            feat_channels=tuple(c.vfe_channels), voxel_size=vs,
            point_cloud_range=rng, max_voxels=c.max_voxels,
            name='vfe')(points, ids, pok, coords, vvalid, train,
                        fusion=fusion)

        # ---- sparse 3D encoder + BEV stack ----
        bev = SparseEncoder(
            in_channels=vfeat.shape[-1], base_channels=16,
            sparse_shape=grid_zyx,
            encoder_channels=tuple(c.encoder_channels),
            encoder_paddings=tuple(c.encoder_paddings),
            stage_budgets=tuple(c.encoder_budgets),
            out_budget=c.encoder_out_budget,
            block_type='conv_module')(vfeat, coords, vvalid, train)
        xs = SECOND(in_channels=bev.shape[-1],
                    out_channels=tuple(c.backbone_channels),
                    layer_nums=tuple(c.backbone_layers),
                    layer_strides=tuple(c.backbone_strides))(bev, train)
        fused = SECONDFPN(in_channels=tuple(c.backbone_channels),
                          out_channels=tuple(c.neck_channels),
                          upsample_strides=tuple(c.neck_strides))(xs, train)
        return Anchor3DHead(c.head)(fused, train)
