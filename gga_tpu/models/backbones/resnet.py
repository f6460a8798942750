"""ResNet backbone (NHWC) for the monocular path.

Rebuild of the mmdet ResNet consumed by the reference's FCOS3D/PGD configs
(/root/reference/configs/_base_/models/fcos3d.py: ResNet101, caffe style,
multi-stage outputs). Notes:
- caffe style: stride-2 on the first 1x1 conv of a bottleneck.
- No ImageNet checkpoint is available in this environment (zero egress),
  so training starts from random init; ``norm_eval``/frozen stages are
  therefore off by default (they only make sense with pretrained weights).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn

from ..layers import BatchNorm2d, conv_init

ARCH = {18: ((2, 2, 2, 2), 'basic'), 34: ((3, 4, 6, 3), 'basic'),
        50: ((3, 4, 6, 3), 'bottleneck'), 101: ((3, 4, 23, 3), 'bottleneck')}


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    style: str = 'caffe'

    @nn.compact
    def __call__(self, x, train: bool):
        s1 = self.stride if self.style == 'caffe' else 1
        s2 = 1 if self.style == 'caffe' else self.stride
        out = nn.Conv(self.planes, (1, 1), strides=(s1, s1),
                      use_bias=False, kernel_init=conv_init)(x)
        out = nn.relu(BatchNorm2d()(out, train))
        out = nn.Conv(self.planes, (3, 3), strides=(s2, s2),
                      padding='SAME', use_bias=False,
                      kernel_init=conv_init)(out)
        out = nn.relu(BatchNorm2d()(out, train))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      kernel_init=conv_init)(out)
        out = BatchNorm2d()(out, train)
        if x.shape[-1] != self.planes * 4 or self.stride != 1:
            x = nn.Conv(self.planes * 4, (1, 1),
                        strides=(self.stride, self.stride),
                        use_bias=False, kernel_init=conv_init)(x)
            x = BatchNorm2d()(x, train)
        return nn.relu(out + x)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    style: str = 'caffe'

    @nn.compact
    def __call__(self, x, train: bool):
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      padding='SAME', use_bias=False,
                      kernel_init=conv_init)(x)
        out = nn.relu(BatchNorm2d()(out, train))
        out = nn.Conv(self.planes, (3, 3), padding='SAME', use_bias=False,
                      kernel_init=conv_init)(out)
        out = BatchNorm2d()(out, train)
        if x.shape[-1] != self.planes or self.stride != 1:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, kernel_init=conv_init)(x)
            x = BatchNorm2d()(x, train)
        return nn.relu(out + x)


class ResNet(nn.Module):
    depth: int = 101
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    base_planes: int = 64
    style: str = 'caffe'

    @nn.compact
    def __call__(self, x, train: bool = True):
        """x: [B, H, W, 3] -> tuple of stage features (strides 4/8/16/32)."""
        stage_blocks, block_type = ARCH[self.depth]
        Block = Bottleneck if block_type == 'bottleneck' else BasicBlock

        x = nn.Conv(self.base_planes, (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)], use_bias=False,
                    kernel_init=conv_init)(x)
        x = nn.relu(BatchNorm2d()(x, train))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs = []
        planes = self.base_planes
        for i, n_blocks in enumerate(stage_blocks):
            stride = 1 if i == 0 else 2
            x = Block(planes, stride=stride, style=self.style)(x, train)
            for _ in range(n_blocks - 1):
                x = Block(planes, style=self.style)(x, train)
            if i in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)
