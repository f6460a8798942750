"""SMOKE monocular 3D detector.

TPU rebuild of /root/reference/mmdet3d/models/detectors/smoke_mono3d.py:7
(config configs/smoke/smoke_dla34_pytorch_dlaneck_gn-all_8x4_6x_kitti-
mono3d.py): DLA-34 (gn-all) + DLANeck producing the stride-4 map, SMOKE
head/coder/losses. ``backbone='resnet'`` keeps the lighter shared-ResNet
+ up-fuse substitute from round 1 for cheap smoke tests.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax

from ..backbones.dla import DLANet
from ..backbones.resnet import ResNet
from ..necks.dla_neck import DLANeck
from ..dense_heads.smoke_head import (SMOKEConfig, SMOKEHead, smoke_decode,
                                      smoke_loss)
from ..layers import BatchNorm2d, conv_init


@dataclasses.dataclass(frozen=True)
class SMOKEModelConfig:
    backbone: str = 'dla'        # 'dla' (reference parity) | 'resnet'
    img_depth: int = 34
    img_base_planes: int = 64
    neck_channels: int = 64
    dla_channels: tuple = ()     # override DLA34 channels (tiny)
    head: SMOKEConfig = dataclasses.field(default_factory=SMOKEConfig)

    @classmethod
    def tiny(cls):
        return cls(backbone='resnet', img_depth=18, img_base_planes=8,
                   neck_channels=16,
                   head=SMOKEConfig(feat_channels=16, max_objs=8, topk=16))

    @classmethod
    def tiny_dla(cls):
        return cls(backbone='dla', dla_channels=(4, 8, 8, 16, 16, 16),
                   head=SMOKEConfig(feat_channels=16, max_objs=8, topk=16))


class _UpFuse(nn.Module):
    """Upsample deep stage 2x and fuse with the shallower one."""
    channels: int

    @nn.compact
    def __call__(self, deep, shallow, train):
        import jax.numpy as jnp  # noqa: F401

        up = jax.image.resize(
            deep, (deep.shape[0], shallow.shape[1], shallow.shape[2],
                   deep.shape[3]), method='bilinear')
        up = nn.Conv(self.channels, (3, 3), padding='SAME', use_bias=False,
                     kernel_init=conv_init)(up)
        lat = nn.Conv(self.channels, (1, 1), use_bias=False,
                      kernel_init=conv_init)(shallow)
        x = nn.relu(BatchNorm2d()(up + lat, train))
        return x


class SMOKEDetector(nn.Module):
    cfg: SMOKEModelConfig

    @nn.compact
    def __call__(self, img, train: bool = True):
        """img [B, H, W, 3] -> head predictions on the stride-4 map."""
        c = self.cfg
        if c.backbone == 'dla':
            levels = DLANet(depth=c.img_depth,
                            base_channels=tuple(c.dla_channels))(img,
                                                                 train)
            x = DLANeck(in_channels=tuple(
                l.shape[-1] for l in levels))(levels, train)
        else:
            stages = ResNet(depth=c.img_depth,
                            base_planes=c.img_base_planes)(img, train)
            # strides 4/8/16/32 -> fuse down to stride 4
            x = stages[-1]
            for s in (stages[2], stages[1], stages[0]):
                x = _UpFuse(c.neck_channels)(x, s, train)
        return SMOKEHead(c.head)(x, train)

    def loss(self, preds, gt_boxes_cam, labels, centers2d, obj_valid,
             cam2img, trans_mat):
        return smoke_loss(self.cfg.head, preds, gt_boxes_cam, labels,
                          centers2d, obj_valid, cam2img, trans_mat)

    def decode(self, preds, cam2img, trans_mat):
        return smoke_decode(self.cfg.head, preds, cam2img, trans_mat)
