"""GroupFree3DNet detector.

Rebuild of /root/reference/mmdet3d/models/detectors/groupfree3dnet.py:8
+ configs/_base_/models/groupfree3d.py: PointNet2SASSG (fp to 1024
seeds, 288 channels) -> GroupFree3DHead (KPS sampling + 6 transformer
decoder stages).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn

from ..backbones.pointnet2 import PointNet2SASSG
from ..dense_heads.groupfree3d_head import (GroupFree3DConfig,
                                            GroupFree3DHead)


@dataclasses.dataclass(frozen=True)
class GroupFree3DNetConfig:
    in_channels: int = 3
    num_points: Tuple[int, ...] = (2048, 1024, 512, 256)
    radii: Tuple[float, ...] = (0.2, 0.4, 0.8, 1.2)
    num_samples: Tuple[int, ...] = (64, 32, 16, 16)
    sa_channels: Tuple = ((64, 64, 128), (128, 128, 256),
                          (128, 128, 256), (128, 128, 256))
    fp_channels: Tuple = ((256, 256), (256, 288))
    head: GroupFree3DConfig = dataclasses.field(
        default_factory=GroupFree3DConfig)

    @classmethod
    def tiny(cls):
        head = GroupFree3DConfig(
            num_classes=4, in_channels=16, num_proposal=16,
            num_decoder_layers=2, num_heads=2, ffn_dim=32,
            mean_sizes=((1.0, 1.0, 1.0),) * 4, max_out=16)
        return cls(num_points=(128, 64, 32, 16),
                   sa_channels=((16, 16),) * 4,
                   fp_channels=((16,), (16,)), head=head)


class GroupFree3DNet(nn.Module):
    cfg: GroupFree3DNetConfig

    @nn.compact
    def __call__(self, points, points_valid, train: bool = True):
        c = self.cfg
        feat = PointNet2SASSG(
            in_channels=c.in_channels,
            num_points=tuple(c.num_points), radii=tuple(c.radii),
            num_samples=tuple(c.num_samples),
            sa_channels=tuple(tuple(x) for x in c.sa_channels),
            fp_channels=tuple(tuple(x) for x in c.fp_channels))(
                points, points_valid, train)
        return GroupFree3DHead(c.head)(feat, train)
