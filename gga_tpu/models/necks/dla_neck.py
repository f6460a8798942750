"""DLA neck (iterative deep aggregation upsampling).

Rebuild of DLANeck (/root/reference/mmdet3d/models/necks/dla_neck.py:170):
DLAUpsample runs IDA groups over the level pyramid (each IDA projects a
deeper feature, upsamples it with a depthwise transpose conv initialized
to bilinear, and fuses it with the shallower one through a node conv),
then a final IDA collapses the aggregated levels into ONE map at the
start_level stride (stride 4 for dla34, 64 channels).

Documented delta: project/node convs are regular 3x3 convs — the
reference defaults to DCNv2 but ships a ``use_dcn=False`` switch
(dla_neck.py:41); deformable sampling is a poor fit for the MXU.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..layers import conv_init


def _bilinear_kernel(k, ch, dtype=np.float32):
    """fill_up_weights (dla_neck.py:12): simulated bilinear kernel for a
    depthwise transpose conv, shape [k, k, 1, ch] (HWIO, grouped)."""
    f = int(np.ceil(k / 2))
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    w = np.zeros((k, k), dtype)
    for i in range(k):
        for j in range(k):
            w[i, j] = (1 - abs(i / f - c)) * (1 - abs(j / f - c))
    return np.tile(w[:, :, None, None], (1, 1, 1, ch))


class _ConvGNReLU(nn.Module):
    out_channels: int
    norm: str = 'GN'

    @nn.compact
    def __call__(self, x, train):
        from ..backbones.dla import _Norm
        x = nn.Conv(self.out_channels, (3, 3), padding='SAME',
                    use_bias=True, dtype=x.dtype,
                    kernel_init=conv_init)(x)
        x = _Norm(self.norm)(x, train)
        return nn.relu(x)


class _DepthwiseUp(nn.Module):
    """Grouped transpose conv (k=2s, stride s) initialized bilinear."""
    scale: int

    @nn.compact
    def __call__(self, x):
        s = self.scale
        if s == 1:
            return x
        k = 2 * s
        ch = x.shape[-1]
        w = self.param('kernel',
                       lambda rng: jnp.asarray(_bilinear_kernel(k, ch)))
        # transpose conv (k=2s, stride s, pad s//2) as an input-dilated
        # grouped conv: pad = k - 1 - s//2 each side (kernel symmetric,
        # so the spatial flip is a no-op at init)
        pad = k - 1 - s // 2
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), w.astype(jnp.float32),
            window_strides=(1, 1), padding=[(pad, pad)] * 2,
            lhs_dilation=(s, s),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            feature_group_count=ch)
        return y.astype(x.dtype)



class IDAUpsample(nn.Module):
    """dla_neck.py:29 — operates on a feature list in place."""
    out_channels: int
    scales: Tuple[int, ...]       # per-level up factor (index 1..)
    norm: str = 'GN'

    @nn.compact
    def __call__(self, feats, start, end, train):
        feats = list(feats)
        for i in range(start, end - 1):
            k = i - start
            x = _ConvGNReLU(self.out_channels, self.norm,
                            name=f'proj{k}')(feats[i + 1], train)
            x = _DepthwiseUp(int(self.scales[k + 1]),
                             name=f'up{k}')(x)
            feats[i + 1] = _ConvGNReLU(self.out_channels, self.norm,
                                       name=f'node{k}')(x + feats[i],
                                                        train)
        return feats


class DLANeck(nn.Module):
    in_channels: Tuple[int, ...] = (16, 32, 64, 128, 256, 512)
    start_level: int = 2
    end_level: int = 5
    norm: str = 'GN'

    @nn.compact
    def __call__(self, x, train: bool = True):
        feats = list(x)
        n = len(feats)
        channels = list(self.in_channels[self.start_level:])
        in_ch = list(channels)
        scales = np.array(
            [2 ** i for i in range(n - self.start_level)], int)

        # DLAUpsample (dla_neck.py:109)
        outs = [feats[-1]]
        for i in range(n - self.start_level - 1):
            j = -i - 2
            ida = IDAUpsample(
                channels[j],
                tuple(int(s) for s in (scales[j:] // scales[j])),
                self.norm, name=f'dla_ida{i}')
            sub = ida(feats[self.start_level:][j:],
                      0, len(scales[j:]), train)
            feats[n + j:] = sub  # write the updated tail back
            scales[j + 1:] = scales[j]
            in_ch[j + 1:] = [channels[j]] * len(in_ch[j + 1:])
            outs.insert(0, feats[-1])

        # final IDA over the first (end-start) aggregated maps
        m = self.end_level - self.start_level
        final = IDAUpsample(
            self.in_channels[self.start_level],
            tuple(2 ** i for i in range(m)), self.norm,
            name='ida_up')(outs[:m], 0, m, train)
        return final[-1]
