"""3D necks for ImVoxelNet.

TPU rebuild of OutdoorImVoxelNeck
(/root/reference/mmdet3d/models/necks/imvoxel_neck.py:10): ResModule +
stride-(1,1,2) Conv3d pairs compress the z axis, the last conv (padding
(1,1,0)) collapses it; output is a BEV map in Anchor3DHead's (y, x) axis
order. Volumes are NDHWC ([B, Nx, Ny, Nz, C]) so XLA tiles the 3D convs
onto the MXU directly.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..layers import BatchNorm2d, conv_init


class ConvModule3d(nn.Module):
    out_channels: int
    stride: tuple = (1, 1, 1)
    padding: tuple = (1, 1, 1)

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.out_channels, (3, 3, 3), strides=self.stride,
                    padding=[(p, p) for p in self.padding],
                    use_bias=False, dtype=x.dtype,
                    kernel_init=conv_init)(x)
        x = BatchNorm2d()(x, train)  # BN over all leading axes
        return nn.relu(x)


class ResModule3d(nn.Module):
    """Two 3x3x3 convs + BN with a residual add (imvoxel_neck.py ResModule)."""
    channels: int

    @nn.compact
    def __call__(self, x, train: bool):
        y = ConvModule3d(self.channels)(x, train)
        y = nn.Conv(self.channels, (3, 3, 3), padding=1, use_bias=False,
                    dtype=x.dtype, kernel_init=conv_init)(y)
        y = BatchNorm2d()(y, train)
        return nn.relu(x + y)


class OutdoorImVoxelNeck(nn.Module):
    out_channels: int = 256

    @nn.compact
    def __call__(self, x, train: bool = True):
        """x: [B, Nx, Ny, Nz, C] -> [B, Ny, Nx, out] BEV."""
        c = x.shape[-1]
        x = ResModule3d(c)(x, train)
        x = ConvModule3d(c * 2, stride=(1, 1, 2))(x, train)
        x = ResModule3d(c * 2)(x, train)
        x = ConvModule3d(c * 4, stride=(1, 1, 2))(x, train)
        x = ResModule3d(c * 4)(x, train)
        x = ConvModule3d(self.out_channels, padding=(1, 1, 0))(x, train)
        assert x.shape[3] == 1, f'z not collapsed: {x.shape}'
        # [B, Nx, Ny, C] -> (y, x) order for Anchor3DHead
        return jnp.swapaxes(x[:, :, :, 0, :], 1, 2)
