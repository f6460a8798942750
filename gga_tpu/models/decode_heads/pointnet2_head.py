"""PointNet++ semantic-segmentation decode head.

TPU rebuild of /root/reference/mmdet3d/models/decode_heads/
pointnet2_head.py:11 (+ decode_head.py Base3DDecodeHead): FP modules
consume the backbone's SA levels bottom-up back to the raw points
(sa_features[0] treated as None per pointnet2_sem_seg), then a 1x1
pre-seg conv, dropout, and the class logits layer.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..backbones.pointnet2 import PointFPModule, SharedMLP


class PointNet2SegHead(nn.Module):
    num_classes: int
    fp_channels: Sequence[Sequence[int]] = (
        (256, 256), (256, 256), (256, 128), (128, 128, 128))
    channels: int = 128
    dropout_ratio: float = 0.5

    @nn.compact
    def __call__(self, feat_dict, train: bool = True):
        """feat_dict from PointNet2SASSG (sa_xyz/sa_features/sa_valid).

        Returns per-point logits [B, P, num_classes].
        """
        sa_xyz = list(feat_dict['sa_xyz'])
        sa_feats = list(feat_dict['sa_features'])
        sa_valid = list(feat_dict['sa_valid'])
        # raw-point level carries no learned features
        # (pointnet2_head.py:74 sets sa_features[0] = None)
        sa_feats[0] = None
        assert len(self.fp_channels) == len(sa_xyz) - 1

        f = sa_feats[-1]
        for i, ch in enumerate(self.fp_channels):
            tgt = len(sa_xyz) - 2 - i
            src = tgt + 1
            f = PointFPModule(tuple(ch), name=f'fp{i}')(
                sa_xyz[tgt], sa_feats[tgt], sa_xyz[src], f,
                sa_valid[src], sa_valid[tgt], train)
        f = SharedMLP((self.channels,), name='pre_seg')(
            f, sa_valid[0], train)
        f = nn.Dropout(self.dropout_ratio, deterministic=not train)(f)
        logits = nn.Dense(self.num_classes, name='cls_seg')(f)
        return jnp.where(sa_valid[0][..., None], logits, 0.0)
