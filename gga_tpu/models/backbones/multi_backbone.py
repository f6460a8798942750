"""MultiBackbone: several parallel PointNet2 towers with fused output.

Rebuild of /root/reference/mmdet3d/models/backbones/multi_backbone.py:13
(H3DNet): N identical PointNet2SASSG towers run on the same cloud; FPS
is deterministic, so every tower lands on the same seed set and the
per-tower fp features concatenate channel-wise into the fused
``hd_feature`` (conv + BN + ReLU aggregation).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from .pointnet2 import PointNet2SASSG, SharedMLP


@dataclasses.dataclass(frozen=True)
class MultiBackboneConfig:
    num_streams: int = 4
    in_channels: int = 4
    num_points: Tuple[int, ...] = (2048, 1024, 512, 256)
    radii: Tuple[float, ...] = (0.2, 0.4, 0.8, 1.2)
    num_samples: Tuple[int, ...] = (64, 32, 16, 16)
    sa_channels: Tuple = ((64, 64, 128), (128, 128, 256),
                          (128, 128, 256), (128, 128, 256))
    fp_channels: Tuple = ((256, 256), (256, 256))
    agg_channels: int = 256


class MultiBackbone(nn.Module):
    cfg: MultiBackboneConfig

    @nn.compact
    def __call__(self, points, valid, train: bool = True):
        c = self.cfg
        feats = []
        last = None
        for i in range(c.num_streams):
            out = PointNet2SASSG(
                in_channels=c.in_channels,
                num_points=tuple(c.num_points), radii=tuple(c.radii),
                num_samples=tuple(c.num_samples),
                sa_channels=tuple(tuple(x) for x in c.sa_channels),
                fp_channels=tuple(tuple(x) for x in c.fp_channels),
                name=f'backbone{i}')(points, valid, train)
            feats.append(out['fp_features'])
            last = out
        hd = SharedMLP((c.agg_channels,), name='aggregation')(
            jnp.concatenate(feats, -1), last['fp_valid'], train)
        return dict(fp_xyz=last['fp_xyz'], fp_features=hd,
                    fp_valid=last['fp_valid'], hd_feature=hd)
