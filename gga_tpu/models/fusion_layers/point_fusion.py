"""Point-wise LiDAR-camera fusion.

TPU rebuild of the reference's PointFusion
(/root/reference/mmdet3d/models/fusion_layers/point_fusion.py:95): project
points into the image, bilinearly sample multi-scale image features
(grid_sample align_corners=True semantics, zeros padding), lateral 3x3
convs per level, then per-point Linear+BN transforms of the image and
point streams summed and ReLU'd.

TPU-first: fixed-budget point sets with validity masks; the bilinear
sample is four static gathers + a weighted sum (no dynamic shapes), which
XLA fuses into the surrounding elementwise work.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...core.geometry import project_to_image
from ..layers import ConvModule2d, MaskedBatchNorm


def bilinear_sample(feat, uv, valid):
    """Sample [H, W, C] features at float pixel coords (align_corners=True).

    Args:
        feat: [H, W, C].
        uv: [P, 2] (x, y) in pixel units of this feature map.
        valid: [P] bool; invalid or out-of-bounds points sample zeros
            (grid_sample padding_mode='zeros').

    Returns:
        [P, C].
    """
    H, W, _ = feat.shape
    x, y = uv[:, 0], uv[:, 1]
    inb = valid & (x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)
    x = jnp.clip(x, 0.0, W - 1)
    y = jnp.clip(y, 0.0, H - 1)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    wx = (x - x0)[:, None]
    wy = (y - y0)[:, None]
    v00 = feat[y0, x0]
    v01 = feat[y0, x1]
    v10 = feat[y1, x0]
    v11 = feat[y1, x1]
    out = (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
           + v10 * (1 - wx) * wy + v11 * wx * wy)
    return jnp.where(inb[:, None], out, 0.0)


def point_sample(img_feat, pts_xyz, lidar2img, img_shape, pts_valid):
    """Per-point image features (point_fusion.py:14 point_sample).

    Args:
        img_feat: [Hf, Wf, C] one feature level.
        pts_xyz: [P, 3] LiDAR points.
        lidar2img: [4, 4].
        img_shape: (H, W) of the ORIGINAL image the projection maps to.
        pts_valid: [P] bool.

    Returns:
        [P, C]; zero for points behind the camera / outside the image.
    """
    uv, depth = project_to_image(pts_xyz, lidar2img)
    ok = pts_valid & (depth > 1e-3)
    H, W = img_shape
    Hf, Wf = img_feat.shape[:2]
    scale = jnp.asarray([Wf / W, Hf / H], jnp.float32)
    return bilinear_sample(img_feat, uv * scale, ok)


class PointFusion(nn.Module):
    """Fuse multi-scale image features into point features
    (point_fusion.py:95)."""
    img_channels: Sequence[int] = (256,) * 5
    pts_channels: int = 64
    mid_channels: int = 128
    out_channels: int = 128
    img_levels: Tuple[int, ...] = (0, 1, 2, 3, 4)
    activate_out: bool = True
    fuse_out: bool = False

    @nn.compact
    def __call__(self, img_feats, pts_xyz, pts_feats, pts_valid,
                 lidar2img, img_shape, train: bool = True):
        """img_feats: list of [B, Hl, Wl, Cl]; pts_xyz [B, P, 3];
        pts_feats [B, P, Cp]; pts_valid [B, P]; lidar2img [B, 4, 4].

        Returns fused [B, P, out_channels].
        """
        import jax

        mlvl = []
        for li, lvl in enumerate(self.img_levels):
            lat = ConvModule2d(self.mid_channels, kernel_size=3,
                               name=f'lateral{li}')(img_feats[lvl], train)
            samp = jax.vmap(point_sample,
                            in_axes=(0, 0, 0, None, 0))(
                lat, pts_xyz, lidar2img, tuple(img_shape), pts_valid)
            mlvl.append(samp)
        img_pts = jnp.concatenate(mlvl, axis=-1)
        img_pre = nn.Dense(self.out_channels, name='img_transform')(img_pts)
        img_pre = MaskedBatchNorm(name='img_bn')(img_pre, pts_valid, train)
        pts_pre = nn.Dense(self.out_channels, name='pts_transform')(
            pts_feats)
        pts_pre = MaskedBatchNorm(name='pts_bn')(pts_pre, pts_valid, train)
        fused = img_pre + pts_pre
        if self.activate_out:
            fused = nn.relu(fused)
        if self.fuse_out:
            fused = nn.Dense(self.out_channels, name='fuse_conv')(fused)
            fused = MaskedBatchNorm(name='fuse_bn')(fused, pts_valid, train)
            fused = nn.relu(fused)
        return jnp.where(pts_valid[..., None], fused, 0.0)
