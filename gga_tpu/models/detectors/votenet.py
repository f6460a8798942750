"""VoteNet detector: PointNet2SASSG -> VoteHead.

Rebuild of /root/reference/mmdet3d/models/detectors/votenet.py with the
SUN RGB-D config (configs/_base_/models/votenet.py).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn

from ..backbones.pointnet2 import PointNet2SASSG
from ..dense_heads.vote_head import VoteHead, VoteHeadConfig


@dataclasses.dataclass(frozen=True)
class VoteNetConfig:
    in_channels: int = 4    # xyz used as coords; extra = height feature
    num_points: Tuple[int, ...] = (2048, 1024, 512, 256)
    radii: Tuple[float, ...] = (0.2, 0.4, 0.8, 1.2)
    num_samples: Tuple[int, ...] = (64, 32, 16, 16)
    sa_channels: Sequence = ((64, 64, 128), (128, 128, 256),
                             (128, 128, 256), (128, 128, 256))
    fp_channels: Sequence = ((256, 256), (256, 256))
    head: VoteHeadConfig = dataclasses.field(default_factory=VoteHeadConfig)

    @classmethod
    def tiny(cls):
        head = VoteHeadConfig(
            num_classes=4,
            mean_sizes=((1.0, 1.0, 1.0),) * 4,
            in_channels=32, vote_conv_channels=(32,),
            agg_num_point=32, agg_mlp=(32, 32),
            pred_conv_channels=(32,), max_objs=8, max_out=16,
            # loose assignment radii so random-init proposals on tiny
            # scenes still produce positives in smoke tests
            pos_distance_thr=0.8, neg_distance_thr=1.2)
        return cls(num_points=(256, 128, 64, 32),
                   sa_channels=((16, 32),) * 4,
                   fp_channels=((32,), (32,)), head=head)


class VoteNet(nn.Module):
    cfg: VoteNetConfig

    @nn.compact
    def __call__(self, points, valid, train: bool = True):
        """points [B, P, C>=3]; valid [B, P] -> VoteHead proposal dict."""
        c = self.cfg
        feat = PointNet2SASSG(
            in_channels=c.in_channels,
            num_points=tuple(c.num_points), radii=tuple(c.radii),
            num_samples=tuple(c.num_samples),
            sa_channels=tuple(tuple(x) for x in c.sa_channels),
            fp_channels=tuple(tuple(x) for x in c.fp_channels))(
                points, valid, train)
        return VoteHead(c.head)(feat, train)
