"""3DSSD single-stage point-based detector.

Rebuild of SSD3DNet (/root/reference/mmdet3d/models/detectors/ssd3dnet.py
via configs/_base_/models/3dssd.py): PointNet2SAMSG with F-FPS/FS
sampling (level 1 'FS' doubles its 512 to 1024 seeds; level 2 runs F-FPS
over the first 512 = the F-FPS half, D-FPS over the rest) -> SSD3DHead.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn

from ..backbones.pointnet2 import PointNet2SAMSG
from ..dense_heads.ssd_3d_head import SSD3DConfig, SSD3DHead


@dataclasses.dataclass(frozen=True)
class SSD3DNetConfig:
    in_channels: int = 4
    num_points: Sequence = (4096, 512, (256, 256))
    radii: Sequence[Tuple[float, ...]] = (
        (0.2, 0.4, 0.8), (0.4, 0.8, 1.6), (1.6, 3.2, 4.8))
    num_samples: Sequence[Tuple[int, ...]] = (
        (32, 32, 64), (32, 32, 64), (32, 32, 32))
    sa_channels: Sequence = (
        ((16, 16, 32), (16, 16, 32), (32, 32, 64)),
        ((64, 64, 128), (64, 64, 128), (64, 96, 128)),
        ((128, 128, 256), (128, 192, 256), (128, 256, 256)))
    aggregation_channels: Tuple[int, ...] = (64, 128, 256)
    fps_mods: Sequence = (('D-FPS',), ('FS',), ('F-FPS', 'D-FPS'))
    fps_sample_range_lists: Sequence = ((-1,), (-1,), (512, -1))
    head: SSD3DConfig = dataclasses.field(default_factory=SSD3DConfig)

    @classmethod
    def tiny(cls):
        head = SSD3DConfig(
            num_candidates=16, vote_conv_channels=(16,),
            agg_radii=(4.8, 6.4), agg_samples=(8, 8),
            agg_mlps=((16, 16), (16, 16)),
            shared_conv_channels=(16, 16), cls_conv_channels=(16,),
            reg_conv_channels=(16,), max_out=16)
        return cls(
            num_points=(128, 32, (16, 16)),
            sa_channels=(((8, 8),) * 3, ((8, 8),) * 3, ((8, 8),) * 3),
            aggregation_channels=(16, 16, 16),
            fps_sample_range_lists=((-1,), (-1,), (32, -1)),
            head=head)


class SSD3DNet(nn.Module):
    cfg: SSD3DNetConfig

    @nn.compact
    def __call__(self, points, points_valid, train: bool = True):
        c = self.cfg
        feat = PointNet2SAMSG(
            in_channels=c.in_channels,
            num_points=tuple(
                n if isinstance(n, int) else tuple(n)
                for n in c.num_points),
            radii=tuple(tuple(r) for r in c.radii),
            num_samples=tuple(tuple(s) for s in c.num_samples),
            sa_channels=tuple(tuple(tuple(m) for m in s)
                              for s in c.sa_channels),
            aggregation_channels=tuple(c.aggregation_channels),
            fps_mods=tuple(tuple(m) if not isinstance(m, str) else (m,)
                           for m in c.fps_mods),
            fps_sample_range_lists=tuple(
                tuple(r) if isinstance(r, (tuple, list)) else (r,)
                for r in c.fps_sample_range_lists))(
                points, points_valid, train)
        return SSD3DHead(c.head)(feat, train)
