"""PointNet feature-propagation neck (PointRCNN).

Rebuild of PointNetFPNeck
(/root/reference/mmdet3d/models/necks/pointnet2_fp_neck.py:10): consume
the backbone's SA pyramid bottom-up through FP modules until features
live at the full input resolution. The reference's ``fp_channels``
tuples include the (inferable) input dim as their first element; here
``fp_channels`` holds only the mlp output dims.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn

from ..backbones.pointnet2 import PointFPModule


class PointNetFPNeck(nn.Module):
    fp_channels: Sequence[Tuple[int, ...]] = (
        (512, 512), (512, 512), (256, 256), (128, 128))

    @nn.compact
    def __call__(self, feat_dict, train: bool = True):
        sa_xyz = feat_dict['sa_xyz']
        sa_feats = feat_dict['sa_features']
        sa_valid = feat_dict['sa_valid']
        assert len(sa_xyz) == len(self.fp_channels) + 1

        fp_feature = sa_feats[-1]
        fp_xyz = sa_xyz[-1]
        fp_valid = sa_valid[-1]
        for i, mlp in enumerate(self.fp_channels):
            tgt_xyz = sa_xyz[-(i + 2)]
            tgt_valid = sa_valid[-(i + 2)]
            fp_feature = PointFPModule(tuple(mlp), name=f'fp{i}')(
                tgt_xyz, sa_feats[-(i + 2)], fp_xyz, fp_feature,
                fp_valid, tgt_valid, train)
            fp_xyz, fp_valid = tgt_xyz, tgt_valid
        return dict(fp_xyz=fp_xyz, fp_features=fp_feature,
                    fp_valid=fp_valid)
