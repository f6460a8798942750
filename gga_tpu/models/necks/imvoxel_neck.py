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
    """Two 3x3x3 convs + BN with a residual add (imvoxel_neck.py
    ResModule); stride > 1 downsamples with a 1x1 projected shortcut."""
    channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        y = ConvModule3d(self.channels,
                         stride=(self.stride,) * 3)(x, train)
        y = nn.Conv(self.channels, (3, 3, 3), padding=1, use_bias=False,
                    dtype=x.dtype, kernel_init=conv_init)(y)
        y = BatchNorm2d()(y, train)
        if self.stride != 1 or x.shape[-1] != self.channels:
            x = nn.Conv(self.channels, (1, 1, 1),
                        strides=(self.stride,) * 3, use_bias=False,
                        dtype=x.dtype, kernel_init=conv_init)(x)
            x = BatchNorm2d()(x, train)
        return nn.relu(x + y)


class _UpBlock3d(nn.Module):
    """2x trilinear-deconv upsample + conv (imvoxel_neck _make_up_block)."""
    channels: int

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.ConvTranspose(self.channels, (2, 2, 2),
                             strides=(2, 2, 2), use_bias=False,
                             dtype=x.dtype, kernel_init=conv_init)(x)
        x = BatchNorm2d()(x, train)
        x = nn.relu(x)
        return ConvModule3d(self.channels)(x, train)


class IndoorImVoxelNeck(nn.Module):
    """Indoor 3D FPN over the lifted volume (imvoxel_neck.py:71
    IndoorImVoxelNeck): stride-2 residual down path, deconv up path with
    skip adds, one out block per level. Returns finest level first."""
    out_channels: int = 128
    n_blocks: tuple = (1, 1, 1)

    @nn.compact
    def __call__(self, x, train: bool = True):
        """x [B, Nx, Ny, Nz, C] -> list of [B, Nx/2^i, ..., out]."""
        downs = []
        ch = x.shape[-1]
        for i, nb in enumerate(self.n_blocks):
            for j in range(nb):
                if j == 0 and i > 0:
                    ch *= 2
                    x = ResModule3d(ch, stride=2)(x, train)
                else:
                    x = ResModule3d(ch)(x, train)
            downs.append(x)
        outs = []
        n = len(self.n_blocks)
        for i in range(n - 1, -1, -1):
            if i < n - 1:
                x = _UpBlock3d(x.shape[-1] // 2)(x, train)
                x = downs[i] + x
            outs.append(ConvModule3d(self.out_channels)(x, train))
        return outs[::-1]


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
