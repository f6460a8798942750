"""FCAF3D indoor detector: voxelize -> MinkResNet -> FCAF3DHead.

Rebuild of MinkSingleStage3DDetector
(/root/reference/mmdet3d/models/detectors/mink_single_stage.py:15) with the
SUN RGB-D FCAF3D config (/root/reference/configs/fcaf3d/
fcaf3d_8x2_sunrgbd-3d-10class.py): voxel 0.01 m, MinkResNet34 on colors,
rotated boxes (n_reg_outs 8).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.scatter import (assign_point_voxel_ids, dynamic_scatter_mean)
from ...ops.voxelize import hard_voxelize
from ..backbones.mink_resnet import MinkResNet
from ..dense_heads.fcaf3d_head import FCAF3DConfig, FCAF3DHead


@dataclasses.dataclass(frozen=True)
class FCAF3DModelConfig:
    voxel_size: float = 0.01
    # static grid: (x0, y0, z0, x1, y1, z1); dims must keep
    # nz*ny*nx < 2^31 for int32 linearization
    pc_range: Tuple[float, ...] = (-6.4, -6.4, -2.56, 6.4, 6.4, 2.56)
    max_voxels: int = 65536
    in_channels: int = 3   # colors
    depth: int = 34
    base_planes: int = 64
    backbone_budgets: Tuple[int, ...] = (65536, 32768, 16384, 8192, 4096,
                                         2048)
    head: FCAF3DConfig = dataclasses.field(default_factory=FCAF3DConfig)

    @classmethod
    def tiny(cls):
        # NOTE budgets must cover the expected active counts: overflow
        # truncates in coordinate order (spatially biased) by design.
        # budgets sized ABOVE measured actives for a ~512-point cloud
        # (conv1 dilation inflates sites ~3-5x before pooling shrinks them)
        head = FCAF3DConfig(
            n_classes=4, in_channels=(8, 16, 32, 64), out_channels=16,
            voxel_size=0.08,  # MUST match the model voxel size
            level_budgets=(1024, 256, 64, 8), max_objs=8, nms_pre=32,
            max_out=8, pts_assign_threshold=4, pts_center_threshold=3)
        return cls(voxel_size=0.08,
                   pc_range=(-5.12, -5.12, -2.56, 5.12, 5.12, 2.56),
                   max_voxels=1024, base_planes=8, depth=18,
                   backbone_budgets=(4096, 2048, 1024, 256, 64, 8),
                   head=head)


class FCAF3DDetector(nn.Module):
    cfg: FCAF3DModelConfig

    @nn.compact
    def __call__(self, points, colors, points_valid, train: bool = True):
        """points [B, P, 3] depth-frame xyz; colors [B, P, C];
        points_valid [B, P]."""
        c = self.cfg
        assert abs(c.voxel_size - c.head.voxel_size) < 1e-9, (
            'model and head voxel sizes must match (head point positions '
            'are derived from the head config)')
        vs = (c.voxel_size,) * 3
        nx = int(round((c.pc_range[3] - c.pc_range[0]) / c.voxel_size))
        ny = int(round((c.pc_range[4] - c.pc_range[1]) / c.voxel_size))
        nz = int(round((c.pc_range[5] - c.pc_range[2]) / c.voxel_size))
        grid_zyx = (nz, ny, nx)

        def vox(p, col, v):
            out = hard_voxelize(p, v, voxel_size=vs,
                                pc_range=tuple(c.pc_range), max_points=1,
                                max_voxels=c.max_voxels)
            # mean colors per voxel via dynamic scatter (ME TensorField
            # average semantics — one feature per voxel)
            from ...ops.voxelize import dynamic_voxelize
            pc, ok = dynamic_voxelize(p, v, voxel_size=vs,
                                      pc_range=tuple(c.pc_range))
            ids = assign_point_voxel_ids(pc, out['coords'], ok,
                                         out['coords'][:, 0] >= 0,
                                         grid_zyx)
            mean_col, _ = dynamic_scatter_mean(col, ids, ok, c.max_voxels)
            vvalid = (jnp.arange(c.max_voxels) < out['num_voxels'])
            return mean_col, out['coords'], vvalid

        feats, coords, valid = jax.vmap(vox)(points, colors, points_valid)
        backbone_outs = MinkResNet(
            depth=c.depth, in_channels=c.in_channels,
            base_planes=c.base_planes,
            budgets=tuple(c.backbone_budgets))(
                feats, coords, valid, grid_zyx, train)
        head_outs = FCAF3DHead(c.head)(backbone_outs, train)
        # shift head point coords into metric space (grid origin offset)
        origin = jnp.asarray(c.pc_range[:3], jnp.float32)
        for o in head_outs:
            o['points'] = o['points'] + origin
        return head_outs
