"""RegNetX backbone + the stem-free 3D variant.

Rebuild of NoStemRegNet
(/root/reference/mmdet3d/models/backbones/nostem_regnet.py:7, wrapping
mmdet's RegNet) in NHWC flax: widths/depths are generated from the
quantized-linear parameterization of `Designing Network Design Spaces
<https://arxiv.org/abs/2003.13678>`_ (w0, wa, wm, depth, group width),
stages are stacks of X-blocks (1x1 -> 3x3 group conv -> 1x1, BN+ReLU,
residual). The 3D detectors use the no-stem form: the voxel/pillar
encoder already acts as the stem, so stage 0 consumes the 64-channel
BEV map directly at stride 1 (reference config strides=(1, 2, 2, 2),
out_indices=(1, 2, 3)).

Group conv maps to `feature_group_count` — on TPU each group is its own
small MXU matmul; widths here are multiples of the group width by
construction so the split is even.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import numpy as np

from ..layers import BatchNorm2d, ConvModule2d, conv_init

# arch presets (mmcv regnet zoo; name -> w0, wa, wm, group_w, depth)
REGNET_ARCHS = {
    'regnetx_400mf': dict(w0=24, wa=24.48, wm=2.54, group_w=16, depth=22),
    'regnetx_800mf': dict(w0=56, wa=35.73, wm=2.28, group_w=16, depth=16),
    'regnetx_1.6gf': dict(w0=80, wa=34.01, wm=2.25, group_w=24, depth=18),
    'regnetx_3.2gf': dict(w0=88, wa=26.31, wm=2.25, group_w=48, depth=25),
}


def generate_regnet(w0, wa, wm, depth, group_w, *, divisor=8):
    """Per-stage (widths, depths, group widths) from the quantized
    linear rule: u_j = w0 + wa*j, quantized to powers of wm times w0,
    rounded to the divisor, grouped into stages of equal width; widths
    are then snapped to multiples of the per-stage group width."""
    cont = w0 + wa * np.arange(depth)
    ks = np.round(np.log(cont / w0) / np.log(wm))
    widths = (np.round(w0 * np.power(wm, ks) / divisor) *
              divisor).astype(int)
    stage_widths, stage_depths = np.unique(widths, return_counts=True)
    order = np.argsort(np.searchsorted(widths, stage_widths))
    # np.unique sorts ascending; RegNet widths are non-decreasing so the
    # sorted order IS the stage order
    del order
    gws = np.minimum(group_w, stage_widths)
    stage_widths = (np.round(stage_widths / gws) * gws).astype(int)
    return (tuple(int(w) for w in stage_widths),
            tuple(int(d) for d in stage_depths),
            tuple(int(g) for g in gws))


class RegNetXBlock(nn.Module):
    """X-block: 1x1 -> 3x3 grouped (stride here) -> 1x1 (no act), with
    a projection shortcut when shape changes (bottleneck ratio 1)."""
    width: int
    stride: int
    group_width: int

    @nn.compact
    def __call__(self, x, train: bool):
        shortcut = x
        w = self.width
        y = ConvModule2d(w, 1)(x, train)
        y = nn.Conv(w, (3, 3), strides=(self.stride, self.stride),
                    padding=[(1, 1)] * 2 if self.stride > 1 else 'SAME',
                    feature_group_count=w // self.group_width,
                    use_bias=False, dtype=x.dtype,
                    kernel_init=conv_init)(y)
        y = BatchNorm2d()(y, train)
        y = nn.relu(y)
        y = ConvModule2d(w, 1, use_act=False)(y, train)
        if self.stride != 1 or shortcut.shape[-1] != w:
            shortcut = ConvModule2d(w, 1, stride=self.stride,
                                    use_act=False)(shortcut, train)
        return nn.relu(y + shortcut)


class NoStemRegNet(nn.Module):
    """4-stage RegNetX without a stem (NHWC): stage strides default to
    (1, 2, 2, 2) so the 64-channel pillar BEV map enters at full
    resolution; returns the stages named by ``out_indices``."""
    arch: str = 'regnetx_400mf'
    strides: Sequence[int] = (1, 2, 2, 2)
    out_indices: Sequence[int] = (1, 2, 3)

    @nn.compact
    def __call__(self, x, train: bool = True):
        a = REGNET_ARCHS[self.arch]
        widths, depths, gws = generate_regnet(
            a['w0'], a['wa'], a['wm'], a['depth'], a['group_w'])
        outs = []
        for i, (w, d, g) in enumerate(zip(widths, depths, gws)):
            for j in range(d):
                x = RegNetXBlock(w, self.strides[i] if j == 0 else 1,
                                 g)(x, train)
            if i in self.out_indices:
                outs.append(x)
        return tuple(outs)

    @staticmethod
    def stage_widths(arch) -> Tuple[int, ...]:
        a = REGNET_ARCHS[arch]
        return generate_regnet(a['w0'], a['wa'], a['wm'], a['depth'],
                               a['group_w'])[0]
