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


@dataclasses.dataclass(frozen=True)
class ImVoxelNetIndoorConfig:
    """Indoor (SUN-RGBD) ImVoxelNet
    (configs/imvoxelnet/imvoxelnet_4x2_sunrgbd-3d-10class.py):
    40x40x16 voxels over a [-3.2, 6.2] m frustum, IndoorImVoxelNeck,
    per-voxel ImVoxelHead instead of the BEV anchor head."""
    n_voxels: Tuple[int, int, int] = (40, 40, 16)        # (x, y, z)
    prior_range: Tuple[float, ...] = (-3.2, -0.2, -2.28, 3.2, 6.2, 0.28)
    img_depth: int = 50
    img_base_planes: int = 64
    fpn_channels: int = 256
    neck3d_channels: int = 128
    neck3d_blocks: Tuple[int, ...] = (1, 1, 1)
    head: 'ImVoxelHeadConfig' = None

    def __post_init__(self):
        if self.head is None:
            from ..dense_heads.imvoxel_head import ImVoxelHeadConfig
            object.__setattr__(
                self, 'head',
                ImVoxelHeadConfig(prior_range=tuple(self.prior_range)))

    @classmethod
    def tiny(cls):
        from ..dense_heads.imvoxel_head import ImVoxelHeadConfig
        return cls(n_voxels=(16, 16, 8), img_depth=18,
                   img_base_planes=8, fpn_channels=16,
                   neck3d_channels=16,
                   head=ImVoxelHeadConfig(
                       n_classes=4, n_channels=16, nms_pre=32,
                       max_out=8,
                       prior_range=(-3.2, -0.2, -2.28, 3.2, 6.2, 0.28)))


class ImVoxelNetIndoor(nn.Module):
    """Indoor ImVoxelNet: lift level-0 FPN features into the voxel
    volume, IndoorImVoxelNeck 3-level pyramid, ImVoxelHead.

    Returns (head_outs, valids): valids are per-level projection
    validity masks (the reference's valid_preds, trilinear-upsampled in
    imvoxel_head._upsample_valid_preds — here computed exactly per
    level from the voxel centers)."""
    cfg: ImVoxelNetIndoorConfig

    @nn.compact
    def __call__(self, img, lidar2img, train: bool = True):
        from ..dense_heads.imvoxel_head import ImVoxelHead, level_points
        from ..fusion_layers.point_fusion import project_to_image
        from ..necks.imvoxel_neck import IndoorImVoxelNeck
        c = self.cfg
        nx, ny, nz = c.n_voxels
        img_shape = img.shape[1:3]

        stages = ResNet(depth=c.img_depth,
                        base_planes=c.img_base_planes)(img, train)
        feats = FPN(out_channels=c.fpn_channels, num_outs=4)(stages,
                                                             train)
        feat0 = feats[0]

        centers = level_points(c.head, [(nx, ny, nz)])[0]  # [N, 3]

        def lift(f, l2i):
            v = point_sample(f, centers, l2i, img_shape,
                             jnp.ones(centers.shape[0], bool))
            return v.reshape(nx, ny, nz, -1)

        volume = jax.vmap(lift)(feat0, lidar2img)

        neck = IndoorImVoxelNeck(out_channels=c.neck3d_channels,
                                 n_blocks=tuple(c.neck3d_blocks))
        volumes = neck(volume, train)
        preds = ImVoxelHead(c.head)(volumes, train)

        # per-level projection validity from each level's own centers
        H, W = img_shape
        valids = []
        for lvl, vol in enumerate(volumes):
            lx, ly, lz = vol.shape[1:4]
            pts = level_points(c.head, [(lx, ly, lz)])[0]

            def vmask(l2i):
                uv, depth = project_to_image(pts, l2i)
                ok = (depth > 1e-3) & (uv[:, 0] >= 0) & (uv[:, 0] < W) \
                    & (uv[:, 1] >= 0) & (uv[:, 1] < H)
                return ok.reshape(lx, ly, lz)

            valids.append(jax.vmap(vmask)(lidar2img))
        return preds, valids
