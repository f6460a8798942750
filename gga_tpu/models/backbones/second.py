"""SECOND backbone (dense BEV convs).

Rebuild of /root/reference/mmdet3d/models/backbones/second.py:12 in NHWC
(TPU-preferred layout): per stage, one strided conv then ``layer_num``
3x3 convs, each Conv+BN+ReLU.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn

from ..layers import ConvModule2d


class SECOND(nn.Module):
    in_channels: int = 128
    out_channels: Sequence[int] = (128, 128, 256)
    layer_nums: Sequence[int] = (3, 5, 5)
    layer_strides: Sequence[int] = (2, 2, 2)

    @nn.compact
    def __call__(self, x, train: bool = True):
        """x: [B, H, W, C] -> tuple of per-stage NHWC maps."""
        outs = []
        for i, num in enumerate(self.layer_nums):
            x = ConvModule2d(self.out_channels[i], 3,
                             stride=self.layer_strides[i])(x, train)
            for _ in range(num):
                x = ConvModule2d(self.out_channels[i], 3)(x, train)
            outs.append(x)
        return tuple(outs)
