"""DynamicVoxelNet: dynamic (uncapped-points) voxelization variant.

Rebuild of /root/reference/mmdet3d/models/detectors/dynamic_voxelnet.py +
DynamicSimpleVFE (voxel_encoder.py:49): per-point voxel ids + segment-mean
feature reduction replace the hard [V, P, C] buffers; the rest of the
PointPillars-style stack is shared.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.scatter import assign_point_voxel_ids, dynamic_scatter_mean
from ...ops.voxelize import dynamic_voxelize, hard_voxelize
from ..backbones.second import SECOND
from ..dense_heads.anchor3d_head import Anchor3DHead
from ..middle_encoders import PointPillarsScatter
from ..necks.second_fpn import SECONDFPN
from .voxelnet import PointPillarsConfig, SECONDNetConfig


@dataclasses.dataclass(frozen=True)
class DynamicVoxelNetConfig(PointPillarsConfig):
    """Same layout knobs as PointPillars; voxel features are dynamic
    per-voxel means of raw points (DynamicSimpleVFE)."""

    @classmethod
    def tiny(cls):
        base = PointPillarsConfig.tiny()
        # shallow field copy (asdict would recurse into the head config)
        return cls(**{f.name: getattr(base, f.name)
                      for f in dataclasses.fields(base)})


class DynamicVoxelNet(nn.Module):
    cfg: DynamicVoxelNetConfig

    @nn.compact
    def __call__(self, points, points_valid, train: bool = True):
        c = self.cfg
        vs = tuple(c.voxel_size)
        rng = tuple(c.point_cloud_range)
        ny, nx = c.scatter_shape
        nz = 1
        grid_zyx = (nz, ny, nx)

        def vox(p, v):
            # voxel list via the (max_points=1) hard voxelizer, features
            # via dynamic segment-mean over ALL points in each voxel
            out = hard_voxelize(p, v, voxel_size=vs, pc_range=rng,
                                max_points=1, max_voxels=c.max_voxels)
            pc, ok = dynamic_voxelize(p, v, voxel_size=vs, pc_range=rng)
            ids = assign_point_voxel_ids(pc, out['coords'], ok,
                                         out['coords'][:, 0] >= 0,
                                         grid_zyx)
            mean, cnt = dynamic_scatter_mean(p, ids, ok, c.max_voxels)
            vvalid = jnp.arange(c.max_voxels) < out['num_voxels']
            return mean, out['coords'], vvalid

        feats, coords, vvalid = jax.vmap(vox)(points, points_valid)
        canvas = PointPillarsScatter(tuple(c.scatter_shape))(
            feats, coords, vvalid)
        xs = SECOND(in_channels=canvas.shape[-1],
                    out_channels=tuple(c.backbone_channels),
                    layer_nums=tuple(c.backbone_layers),
                    layer_strides=tuple(c.backbone_strides))(canvas, train)
        fused = SECONDFPN(in_channels=tuple(c.backbone_channels),
                          out_channels=tuple(c.neck_channels),
                          upsample_strides=tuple(c.neck_strides))(xs, train)
        return Anchor3DHead(c.head)(fused, train)


@dataclasses.dataclass(frozen=True)
class DVSECONDConfig(SECONDNetConfig):
    """SECOND with dynamic voxelization (dv_second_secfpn configs):
    voxel features are segment-means over ALL points of each voxel
    (no per-voxel point cap) feeding the same SparseEncoder stack."""

    @classmethod
    def tiny(cls):
        base = SECONDNetConfig(
            voxel_size=(0.32, 0.3125, 0.1),
            point_cloud_range=(0, -40, -3, 71.68, 40, 1),
            max_voxels=512, sparse_shape=(41, 256, 224),
            encoder_channels=((8,), (8, 8), (8, 8), (8, 8)),
            encoder_paddings=((1,), (1, 1), (1, 1), ((0, 1, 1), 1)),
            encoder_budgets=(512, 512, 512), encoder_out_budget=512,
            backbone_channels=(16, 32), backbone_layers=(1, 1),
            neck_channels=(16, 16))
        return cls(**{f.name: getattr(base, f.name)
                      for f in dataclasses.fields(base)})


class DVSECONDDetector(nn.Module):
    """dv_second_secfpn: dynamic-mean VFE over the FULL 3D voxel grid
    -> SparseEncoder -> SECOND -> SECONDFPN -> Anchor3DHead
    (/root/reference/configs/dynamic_voxelization/dv_second_secfpn_*.py,
    detectors/dynamic_voxelnet.py with a sparse middle encoder)."""
    cfg: DVSECONDConfig

    @nn.compact
    def __call__(self, points, points_valid, train: bool = True):
        from ..backbones.second import SECOND as SECOND2D
        from ..middle_encoders import SparseEncoder
        c = self.cfg
        vs = tuple(c.voxel_size)
        rng = tuple(c.point_cloud_range)
        grid_zyx = tuple(c.sparse_shape)

        def vox(p, v):
            out = hard_voxelize(p, v, voxel_size=vs, pc_range=rng,
                                max_points=1, max_voxels=c.max_voxels)
            pc, ok = dynamic_voxelize(p, v, voxel_size=vs, pc_range=rng)
            ids = assign_point_voxel_ids(pc, out['coords'], ok,
                                         out['coords'][:, 0] >= 0,
                                         grid_zyx)
            mean, cnt = dynamic_scatter_mean(p, ids, ok, c.max_voxels)
            vvalid = jnp.arange(c.max_voxels) < out['num_voxels']
            return mean, out['coords'], vvalid

        feats, coords, vvalid = jax.vmap(vox)(points, points_valid)
        feats = feats.astype(jnp.dtype(c.compute_dtype))
        bev = SparseEncoder(
            in_channels=feats.shape[-1],
            base_channels=16,
            sparse_shape=tuple(c.sparse_shape),
            encoder_channels=tuple(c.encoder_channels),
            encoder_paddings=tuple(c.encoder_paddings),
            stage_budgets=tuple(c.encoder_budgets),
            out_budget=c.encoder_out_budget,
            block_type='conv_module')(feats, coords, vvalid, train)
        xs = SECOND2D(in_channels=bev.shape[-1],
                      out_channels=tuple(c.backbone_channels),
                      layer_nums=tuple(c.backbone_layers),
                      layer_strides=tuple(c.backbone_strides))(bev, train)
        fused = SECONDFPN(in_channels=tuple(c.backbone_channels),
                          out_channels=tuple(c.neck_channels),
                          upsample_strides=tuple(c.neck_strides))(xs,
                                                                  train)
        return Anchor3DHead(c.head)(fused, train)
