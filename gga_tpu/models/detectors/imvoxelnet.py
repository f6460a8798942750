"""ImVoxelNet: monocular image -> 3D voxel volume -> BEV detection.

TPU rebuild of /root/reference/mmdet3d/models/detectors/imvoxelnet.py:12
(config configs/imvoxelnet/imvoxelnet_4x8_kitti-3d-car.py): ResNet+FPN,
bilinear-sample the level-0 feature map at every projected voxel center
(the reference's point_sample with aligned=False; we use the
align_corners=True sampler shared with PointFusion — sub-pixel
difference), reshape to an [Nx, Ny, Nz] volume, OutdoorImVoxelNeck
compresses z to a BEV map, Anchor3DHead detects.

TPU-first: the lift is one static gather over the n_voxels grid — no
dynamic shapes; vmapped over the batch.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..backbones.resnet import ResNet
from ..dense_heads.anchor3d_head import Anchor3DConfig, Anchor3DHead
from ..fusion_layers import point_sample
from ..necks.fpn import FPN
from ..necks.imvoxel_neck import OutdoorImVoxelNeck


@dataclasses.dataclass(frozen=True)
class ImVoxelNetConfig:
    n_voxels: Tuple[int, int, int] = (216, 248, 12)      # (x, y, z)
    point_cloud_range: Tuple[float, ...] = (0, -39.68, -3.08, 69.12,
                                            39.68, 0.76)
    img_depth: int = 50
    img_base_planes: int = 64
    fpn_channels: int = 64
    neck3d_out: int = 256
    head: Anchor3DConfig = dataclasses.field(
        default_factory=lambda: Anchor3DConfig(
            num_classes=1,
            anchor_sizes=((3.9, 1.6, 1.56),),
            anchor_ranges=((0, -39.68, -1.78, 69.12, 39.68, -1.78),),
            pos_iou_thr=(0.6,), neg_iou_thr=(0.45,),
            min_pos_iou=(0.45,)))

    @classmethod
    def tiny(cls):
        head = Anchor3DConfig(
            num_classes=1, feat_channels=16, nms_pre=32, max_num=16,
            anchor_sizes=((3.9, 1.6, 1.56),),
            anchor_ranges=((0, -39.68, -1.78, 69.12, 39.68, -1.78),),
            pos_iou_thr=(0.6,), neg_iou_thr=(0.45,), min_pos_iou=(0.45,))
        return cls(n_voxels=(36, 40, 12), img_depth=18, img_base_planes=8,
                   fpn_channels=8, neck3d_out=16, head=head)


class ImVoxelNet(nn.Module):
    cfg: ImVoxelNetConfig

    @nn.compact
    def __call__(self, img, lidar2img, train: bool = True):
        """img [B, H, W, 3] NHWC; lidar2img [B, 4, 4].

        Returns Anchor3DHead predictions on the [Ny, Nx] BEV grid.
        """
        c = self.cfg
        nx, ny, nz = c.n_voxels
        r = c.point_cloud_range
        img_shape = img.shape[1:3]

        stages = ResNet(depth=c.img_depth,
                        base_planes=c.img_base_planes)(img, train)
        feats = FPN(out_channels=c.fpn_channels, num_outs=4)(stages, train)
        feat0 = feats[0]  # stride-4 level (imvoxelnet.py:73 uses x[0])

        # voxel-center grid in LiDAR coords (prior_generator.grid_anchors)
        xs = r[0] + (jnp.arange(nx) + 0.5) * (r[3] - r[0]) / nx
        ys = r[1] + (jnp.arange(ny) + 0.5) * (r[4] - r[1]) / ny
        zs = r[2] + (jnp.arange(nz) + 0.5) * (r[5] - r[2]) / nz
        gx, gy, gz = jnp.meshgrid(xs, ys, zs, indexing='ij')
        centers = jnp.stack([gx, gy, gz], -1).reshape(-1, 3)  # [Nx*Ny*Nz, 3]

        def lift(f, l2i):
            v = point_sample(f, centers, l2i, img_shape,
                             jnp.ones(centers.shape[0], bool))
            return v.reshape(nx, ny, nz, -1)

        volume = jax.vmap(lift)(feat0, lidar2img)  # [B, Nx, Ny, Nz, C]
        bev = OutdoorImVoxelNeck(out_channels=c.neck3d_out)(volume, train)
        return Anchor3DHead(c.head)(bev, train)
