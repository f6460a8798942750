"""SSN: shape-signature pillars detector (configs/ssn family).

Rebuild of the reference's SSN configs
(/root/reference/configs/ssn/hv_ssn_secfpn_sbn-all_2x16_2x_nus-3d.py):
the detector shell is the pillars VoxelNet (PillarFeatureNet -> scatter
-> SECOND or NoStemRegNet -> SECONDFPN) with the shape-aware grouping
head (ShapeAwareHead, per-group conv stacks + per-class anchors) instead
of Anchor3DHead. The head/loss live in
``dense_heads/shape_aware_head.py``; this module is the config-typed
shell the MODELS registry builds.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.voxelize import hard_voxelize
from ..backbones.second import SECOND
from ..dense_heads.shape_aware_head import ShapeAwareConfig, ShapeAwareHead
from ..middle_encoders import PointPillarsScatter
from ..necks.second_fpn import SECONDFPN
from ..voxel_encoders import PillarFeatureNet


@dataclasses.dataclass(frozen=True)
class SSNConfig:
    voxel_size: Tuple[float, float, float] = (0.25, 0.25, 8.0)
    point_cloud_range: Tuple[float, ...] = (-50, -50, -5, 50, 50, 3)
    max_points_per_voxel: int = 20
    max_voxels: int = 32000
    pfn_channels: Tuple[int, ...] = (64,)
    scatter_shape: Tuple[int, int] = (400, 400)     # (ny, nx)
    backbone: str = 'second'
    backbone_channels: Tuple[int, ...] = (64, 128, 256)
    backbone_layers: Tuple[int, ...] = (3, 5, 5)
    backbone_strides: Tuple[int, ...] = (2, 2, 2)
    neck_channels: Tuple[int, ...] = (128, 128, 128)
    neck_strides: Tuple[int, ...] = (1, 2, 4)
    head: ShapeAwareConfig = dataclasses.field(
        default_factory=ShapeAwareConfig)


class SSNDetector(nn.Module):
    cfg: SSNConfig

    @nn.compact
    def __call__(self, points, points_valid, train: bool = True):
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
        feats = PillarFeatureNet(
            feat_channels=tuple(c.pfn_channels),
            voxel_size=tuple(c.voxel_size),
            point_cloud_range=tuple(c.point_cloud_range))(
                voxels, num_points, coords, train)
        vvalid = jnp.arange(c.max_voxels)[None] < num_voxels[:, None]
        feats = jnp.where(vvalid[..., None], feats, 0.0)
        canvas = PointPillarsScatter(tuple(c.scatter_shape))(
            feats, coords, vvalid)
        if c.backbone == 'second':
            xs = SECOND(in_channels=canvas.shape[-1],
                        out_channels=tuple(c.backbone_channels),
                        layer_nums=tuple(c.backbone_layers),
                        layer_strides=tuple(c.backbone_strides))(canvas,
                                                                 train)
        else:
            from ..backbones.regnet import NoStemRegNet
            xs = NoStemRegNet(arch=c.backbone)(canvas, train)
        fused = SECONDFPN(in_channels=tuple(x.shape[-1] for x in xs),
                          out_channels=tuple(c.neck_channels),
                          upsample_strides=tuple(c.neck_strides))(xs,
                                                                  train)
        return ShapeAwareHead(c.head)(fused, train)
