"""VoxelNet-family detectors: SECOND (sparse conv) and PointPillars.

Rebuilds of the reference's VoxelNet detector shell
(/root/reference/mmdet3d/models/detectors/voxelnet.py) in two configs:
- PointPillars (configs/_base_/models/hv_pointpillars_secfpn_kitti.py):
  PillarFeatureNet -> PointPillarsScatter -> SECOND -> SECONDFPN ->
  Anchor3DHead.
- SECOND (configs/_base_/models/hv_second_secfpn_kitti.py): HardSimpleVFE
  -> SparseEncoder -> SECOND -> SECONDFPN -> Anchor3DHead.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.voxelize import hard_voxelize
from ..backbones.second import SECOND
from ..dense_heads.anchor3d_head import Anchor3DConfig, Anchor3DHead
from ..dense_heads.free_anchor3d_head import FreeAnchor3DConfig
from ..middle_encoders import PointPillarsScatter, SparseEncoder
from ..necks.second_fpn import SECONDFPN
from ..voxel_encoders import HardSimpleVFE, PillarFeatureNet


@dataclasses.dataclass(frozen=True)
class PointPillarsConfig:
    voxel_size: Tuple[float, float, float] = (0.16, 0.16, 4.0)
    point_cloud_range: Tuple[float, ...] = (0, -39.68, -3, 69.12, 39.68, 1)
    max_points_per_voxel: int = 32
    max_voxels: int = 16000
    pfn_channels: Tuple[int, ...] = (64,)
    scatter_shape: Tuple[int, int] = (496, 432)     # (ny, nx)
    backbone_channels: Tuple[int, ...] = (64, 128, 256)
    backbone_layers: Tuple[int, ...] = (3, 5, 5)
    backbone_strides: Tuple[int, ...] = (2, 2, 2)
    neck_channels: Tuple[int, ...] = (128, 128, 128)
    neck_strides: Tuple[int, ...] = (1, 2, 4)
    # 'second' or a regnet arch name ('regnetx_400mf', 'regnetx_1.6gf',
    # 'regnetx_3.2gf') -> NoStemRegNet (configs/regnet family); regnet
    # stage channels come from the arch, backbone_channels/layers/strides
    # are ignored then
    backbone: str = 'second'
    # 'secfpn' (deconv-fuse, the default) or 'fpn' (top-down FPN whose
    # levels are upsampled to the finest map and concatenated — the
    # single-level-anchor equivalent of the reference's per-level FPN
    # heads, a documented delta of this static-shape rebuild)
    neck: str = 'secfpn'
    # 'bfloat16' runs the dense stack in bf16 (params/losses stay f32) —
    # the TPU equivalent of the reference's fp16 configs
    # (hv_pointpillars_*_fp16_*.py)
    compute_dtype: str = 'float32'
    head: Anchor3DConfig = dataclasses.field(default_factory=Anchor3DConfig)

    @classmethod
    def tiny(cls):
        # scatter dims divisible by 8 so SECONDFPN's x4 deconv lines up
        rng = (0, -40.96, -3, 71.68, 40.96, 1)
        head = Anchor3DConfig(
            feat_channels=48, nms_pre=32, max_num=16,
            anchor_ranges=((0, -40.96, -0.6, 71.68, 40.96, -0.6),
                           (0, -40.96, -0.6, 71.68, 40.96, -0.6),
                           (0, -40.96, -1.78, 71.68, 40.96, -1.78)))
        return cls(voxel_size=(0.64, 0.64, 4.0), max_voxels=2048,
                   point_cloud_range=rng,
                   scatter_shape=(128, 112), pfn_channels=(16,),
                   backbone_channels=(16, 32, 32),
                   backbone_layers=(1, 1, 1),
                   neck_channels=(16, 16, 16), head=head)


@dataclasses.dataclass(frozen=True)
class FreeAnchorPointPillarsConfig(PointPillarsConfig):
    """configs/free_anchor family: same pillars shell, FreeAnchor3D
    learning-to-match loss (dense_heads/free_anchor3d_head.py) over the
    Anchor3DHead maps."""
    head: FreeAnchor3DConfig = dataclasses.field(
        default_factory=FreeAnchor3DConfig)


class PointPillars(nn.Module):
    cfg: PointPillarsConfig

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
            feats, coords, vvalid).astype(jnp.dtype(c.compute_dtype))
        if c.backbone == 'second':
            xs = SECOND(in_channels=canvas.shape[-1],
                        out_channels=tuple(c.backbone_channels),
                        layer_nums=tuple(c.backbone_layers),
                        layer_strides=tuple(c.backbone_strides))(canvas,
                                                                 train)
        else:
            from ..backbones.regnet import NoStemRegNet
            xs = NoStemRegNet(arch=c.backbone)(canvas, train)
        if c.neck == 'secfpn':
            fused = SECONDFPN(
                in_channels=tuple(x.shape[-1] for x in xs),
                out_channels=tuple(c.neck_channels),
                upsample_strides=tuple(c.neck_strides))(xs, train)
        else:
            from ..necks.fpn import FPN
            levels = FPN(out_channels=c.neck_channels[0],
                         num_outs=len(xs))(xs, train)
            top = levels[0]
            fused = jnp.concatenate(
                [top] + [jax.image.resize(l, top.shape[:3] + l.shape[-1:],
                                          method='nearest')
                         for l in levels[1:]], axis=-1)
        return Anchor3DHead(c.head)(fused, train)


@dataclasses.dataclass(frozen=True)
class SECONDNetConfig:
    """hv_second_secfpn_kitti: voxel (0.05, 0.05, 0.1), SparseEncoder."""
    voxel_size: Tuple[float, float, float] = (0.05, 0.05, 0.1)
    point_cloud_range: Tuple[float, ...] = (0, -40, -3, 70.4, 40, 1)
    max_points_per_voxel: int = 5
    max_voxels: int = 16000
    sparse_shape: Tuple[int, int, int] = (41, 1600, 1408)
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
    # 'bfloat16' = the reference's fp16 configs (hv_second_secfpn_fp16_*)
    compute_dtype: str = 'float32'
    head: Anchor3DConfig = dataclasses.field(
        default_factory=lambda: Anchor3DConfig(
            anchor_ranges=((0, -40, -0.6, 70.4, 40, -0.6),
                           (0, -40, -0.6, 70.4, 40, -0.6),
                           (0, -40, -1.78, 70.4, 40, -1.78))))


class SECONDDetector(nn.Module):
    cfg: SECONDNetConfig

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
        feats = HardSimpleVFE()(voxels, num_points)
        feats = feats.astype(jnp.dtype(c.compute_dtype))
        vvalid = jnp.arange(c.max_voxels)[None] < num_voxels[:, None]
        bev = SparseEncoder(
            in_channels=feats.shape[-1],
            base_channels=16,
            sparse_shape=tuple(c.sparse_shape),
            encoder_channels=tuple(c.encoder_channels),
            encoder_paddings=tuple(c.encoder_paddings),
            stage_budgets=tuple(c.encoder_budgets),
            out_budget=c.encoder_out_budget,
            block_type='conv_module')(feats, coords, vvalid, train)
        xs = SECOND(in_channels=bev.shape[-1],
                    out_channels=tuple(c.backbone_channels),
                    layer_nums=tuple(c.backbone_layers),
                    layer_strides=tuple(c.backbone_strides))(bev, train)
        fused = SECONDFPN(in_channels=tuple(c.backbone_channels),
                          out_channels=tuple(c.neck_channels),
                          upsample_strides=tuple(c.neck_strides))(xs, train)
        return Anchor3DHead(c.head)(fused, train)
