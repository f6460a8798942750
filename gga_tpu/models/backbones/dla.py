"""DLA (Deep Layer Aggregation) backbone.

Rebuild of DLANet (/root/reference/mmdet3d/models/backbones/dla.py:278,
arch 34: BasicBlock, levels (1,1,1,2,2,1), channels
(16,32,64,128,256,512)): a 7x7 stem, two plain conv levels, then
hierarchical Tree stages whose Root nodes fuse (tree2, tree1, children)
through a 1x1 conv. Norm is selectable BN/GN — the SMOKE/MonoFlex
configs run gn-all with num_groups=32 (halved when channels %% 32 != 0,
dla.py:27-34).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..layers import BatchNorm2d, conv_init

ARCH = {34: ((1, 1, 1, 2, 2, 1), (16, 32, 64, 128, 256, 512))}


class _Norm(nn.Module):
    norm: str = 'GN'

    @nn.compact
    def __call__(self, x, train):
        if self.norm == 'BN':
            return BatchNorm2d()(x, train)
        ch = x.shape[-1]
        groups = 32 if ch % 32 == 0 else 16
        return nn.GroupNorm(num_groups=min(groups, ch),
                            dtype=x.dtype)(x)


class _Conv(nn.Module):
    out_channels: int
    kernel: int = 3
    stride: int = 1
    norm: str = 'GN'
    act: bool = True

    @nn.compact
    def __call__(self, x, train):
        x = nn.Conv(self.out_channels, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(self.kernel // 2,) * 2] * 2,
                    use_bias=False, dtype=x.dtype,
                    kernel_init=conv_init)(x)
        x = _Norm(self.norm)(x, train)
        return nn.relu(x) if self.act else x


class DLABasicBlock(nn.Module):
    out_channels: int
    stride: int = 1
    norm: str = 'GN'

    @nn.compact
    def __call__(self, x, identity, train):
        out = _Conv(self.out_channels, 3, self.stride, self.norm)(x,
                                                                  train)
        out = _Conv(self.out_channels, 3, 1, self.norm, act=False)(
            out, train)
        return nn.relu(out + identity)


class _Root(nn.Module):
    """1x1 fusion over concatenated children (dla.py:103)."""
    out_channels: int
    add_identity: bool
    norm: str = 'GN'

    @nn.compact
    def __call__(self, feat_list, train):
        x = jnp.concatenate(feat_list, -1)
        x = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                    dtype=x.dtype, kernel_init=conv_init)(x)
        x = _Norm(self.norm)(x, train)
        if self.add_identity:
            x = x + feat_list[0]
        return nn.relu(x)


class Tree(nn.Module):
    """Recursive aggregation tree (dla.py:157)."""
    levels: int
    out_channels: int
    stride: int = 1
    level_root: bool = False
    root_dim_extra: int = 0      # extra channels entering the root
    add_identity: bool = False
    norm: str = 'GN'

    @nn.compact
    def __call__(self, x, train, children=None):
        children = [] if children is None else list(children)
        if self.stride > 1:
            bottom = nn.max_pool(x, (self.stride, self.stride),
                                 strides=(self.stride, self.stride))
        else:
            bottom = x
        if bottom.shape[-1] != self.out_channels:
            identity = _Conv(self.out_channels, 1, 1, self.norm,
                             act=False, name='project')(bottom, train)
        else:
            identity = bottom
        if self.level_root:
            children.append(bottom)

        if self.levels == 1:
            x1 = DLABasicBlock(self.out_channels, self.stride,
                               self.norm, name='tree1')(x, identity,
                                                        train)
            x2 = DLABasicBlock(self.out_channels, 1, self.norm,
                               name='tree2')(x1, x1, train)
            return _Root(self.out_channels, self.add_identity,
                         self.norm, name='root')([x2, x1] + children,
                                                 train)
        x1 = Tree(self.levels - 1, self.out_channels, self.stride,
                  add_identity=self.add_identity, norm=self.norm,
                  name='tree1')(x, train)
        children.append(x1)
        return Tree(self.levels - 1, self.out_channels, 1,
                    add_identity=self.add_identity, norm=self.norm,
                    name='tree2')(x1, train, children=children)


class DLANet(nn.Module):
    depth: int = 34
    norm: str = 'GN'
    base_channels: Tuple[int, ...] = ()   # override ARCH channels (tiny)
    level_with_root: Tuple[bool, ...] = (False, True, True, True)

    @nn.compact
    def __call__(self, x, train: bool = True):
        """x: [B, H, W, 3] -> 6 level features at strides 1..32."""
        levels, channels = ARCH[self.depth]
        if self.base_channels:
            channels = tuple(self.base_channels)
        x = _Conv(channels[0], 7, 1, self.norm, name='base_layer')(
            x, train)
        outs = []
        for i in range(2):
            for k in range(levels[i]):
                x = _Conv(channels[i], 3, (i + 1) if k == 0 else 1,
                          self.norm, name=f'level{i}_conv{k}')(x, train)
            outs.append(x)
        for i in range(2, len(levels)):
            x = Tree(levels[i], channels[i], stride=2,
                     level_root=self.level_with_root[i - 2],
                     norm=self.norm, name=f'level{i}')(x, train)
            outs.append(x)
        return tuple(outs)
