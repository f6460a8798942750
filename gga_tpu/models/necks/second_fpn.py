"""SECONDFPN neck.

Rebuild of /root/reference/mmdet3d/models/necks/second_fpn.py:12 (NHWC):
per level a deconv (stride > 1) or 1x1 conv (stride == 1 with
use_conv_for_no_stride), then BN+ReLU; outputs concatenated on channels.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..layers import BatchNorm2d, conv_init


class SECONDFPN(nn.Module):
    in_channels: Sequence[int] = (128, 128, 256)
    out_channels: Sequence[int] = (256, 256, 256)
    upsample_strides: Sequence[int] = (1, 2, 4)
    use_conv_for_no_stride: bool = True

    @nn.compact
    def __call__(self, feats, train: bool = True):
        """feats: tuple of [B, Hi, Wi, Ci] -> [B, H0, W0, sum(out)]."""
        ups = []
        for i, x in enumerate(feats):
            stride = self.upsample_strides[i]
            if stride > 1 or (stride == 1 and not
                              self.use_conv_for_no_stride):
                x = nn.ConvTranspose(
                    self.out_channels[i], (stride, stride),
                    strides=(stride, stride), use_bias=False,
                    dtype=x.dtype, kernel_init=conv_init)(x)
            else:
                k = int(round(1 / stride))
                x = nn.Conv(self.out_channels[i], (k, k), strides=(k, k),
                            use_bias=False, dtype=x.dtype,
                            kernel_init=conv_init)(x)
            x = BatchNorm2d()(x, train)
            x = nn.relu(x)
            ups.append(x)
        return jnp.concatenate(ups, axis=-1) if len(ups) > 1 else ups[0]
