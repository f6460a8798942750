"""Shared flax building blocks: masked batch norm for sparse voxel features
and sparse conv modules wrapping ``gga_tpu.ops.sparse``.

Equivalents of mmcv's ConvModule / spconv SparseSequential layers used by
the reference (sparse_block.py, sparse_encoder.py). Rulebook/neighbor-map
CONSTRUCTION is vmapped per scene (sorts batch fine), but the conv
gather+GEMMs run batch-FLATTENED on [B*N, C] with row-offset maps:
vmapped (batched) gathers lower ~4x slower on TPU than flat gathers
(tools/microbench_vmap_gather.py — B=8 subm conv 29.9 ms vmapped vs
8.3 ms flattened at N=16000 C=16 bf16).
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sparse as sp

# torch Conv default: kaiming_uniform(a=sqrt(5)) == variance_scaling(1/3,
# fan_in, uniform). Used for all conv weights for reference-like scales.
conv_init = nn.initializers.variance_scaling(1 / 3, 'fan_in', 'uniform')


def flatten_nmap(nmap, hit, n_in=None):
    """Batched neighbor map [B, K, M] -> flat [K, B*M] with rows offset
    into the flattened [B*n_in, C] feature array (misses keep index 0 —
    ``hit`` masks them).

    ``n_in`` is the per-scene row count of the array the map indexes
    INTO; it defaults to the map's own last dim (the submanifold case
    where query and input sets coincide). Pass it explicitly whenever
    the output set size differs from the input set size (e.g. a 1x1
    stride-2 projection), or every scene b>0 gathers from the wrong
    scene's rows.
    """
    B, K, M = nmap.shape
    rows = M if n_in is None else n_in
    offs = (jnp.arange(B, dtype=nmap.dtype) * rows)[:, None, None]
    nmap_flat = (nmap + offs).transpose(1, 0, 2).reshape(K, B * M)
    return nmap_flat, hit.transpose(1, 0, 2).reshape(K, B * M)


def flatten_rulebook(fwd_map, bwd_map, n_in):
    """Batched rulebook ([B, K, M] input-row map, [B, K, N] output-row
    map) -> flat maps over [B*N] inputs / [B*M] outputs; -1 misses are
    preserved."""
    B, K, M = fwd_map.shape
    N = bwd_map.shape[-1]
    assert N == n_in
    offi = (jnp.arange(B, dtype=fwd_map.dtype) * N)[:, None, None]
    offo = (jnp.arange(B, dtype=bwd_map.dtype) * M)[:, None, None]
    fwd_flat = jnp.where(fwd_map >= 0, fwd_map + offi,
                         -1).transpose(1, 0, 2).reshape(K, B * M)
    bwd_flat = jnp.where(bwd_map >= 0, bwd_map + offo,
                         -1).transpose(1, 0, 2).reshape(K, B * N)
    return fwd_flat, bwd_flat


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over active voxels only.

    The reference normalizes sparse features with BN1d(eps=1e-3,
    momentum=0.01) across all active voxels of the batch
    (sparse_encoder.py:48); here padding rows are excluded via the mask
    and running stats live in the 'batch_stats' collection.
    """
    eps: float = 1e-3
    momentum: float = 0.01  # torch semantics: new = (1-m)*old + m*batch

    @nn.compact
    def __call__(self, x, valid, train: bool):
        """x: [..., C]; valid: [...] bool."""
        c = x.shape[-1]
        ra_mean = self.variable('batch_stats', 'mean',
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable('batch_stats', 'var',
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param('scale', nn.initializers.ones, (c,))
        bias = self.param('bias', nn.initializers.zeros, (c,))

        if train:
            m = valid[..., None].astype(jnp.float32)
            xf = x.astype(jnp.float32)
            cnt = jnp.maximum(m.sum(), 1.0)
            mean = (xf * m).sum(axis=tuple(range(x.ndim - 1))) / cnt
            var = (((xf - mean) ** 2) * m).sum(
                axis=tuple(range(x.ndim - 1))) / cnt
            if not self.is_initializing():
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                # unbiased running var, torch-style
                ub = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * ub)
        else:
            mean, var = ra_mean.value, ra_var.value

        y = ((x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
             * scale + bias)
        return jnp.where(valid[..., None], y, 0.0).astype(x.dtype)


class BatchNorm2d(nn.Module):
    """Dense BN for NHWC feature maps (reference BN eps=1e-3,
    momentum=0.01, e.g. SECOND backbone at gga_kitti_config.py:26)."""
    eps: float = 1e-3
    momentum: float = 0.01

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=1.0 - self.momentum,
            epsilon=self.eps,
            dtype=x.dtype,
        )(x)


class SubMConv3d(nn.Module):
    """Submanifold sparse conv over batched sparse tensors."""
    out_channels: int
    kernel_size: int = 3
    use_bias: bool = False

    @nn.compact
    def __call__(self, feats, coords, valid, grid):
        """feats [B, N, C]; coords [B, N, 3]; valid [B, N]."""
        k3 = self.kernel_size ** 3
        w = self.param('kernel', conv_init,
                       (k3, feats.shape[-1], self.out_channels))
        b = (self.param('bias', nn.initializers.zeros, (self.out_channels,))
             if self.use_bias else None)

        def one(f, c, v):
            st = sp.SparseTensor(features=f, coords=c, valid=v,
                                 grid=tuple(grid))
            return sp.subm_conv(st, w, b).features

        return jax.vmap(one)(feats, coords, valid)


class SparseConv3d(nn.Module):
    """Strided sparse conv (downsampling); returns new coords/valid/grid."""
    out_channels: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (2, 2, 2)
    padding: Tuple[int, int, int] = (1, 1, 1)
    out_budget: int = 16000
    use_bias: bool = False

    @nn.compact
    def __call__(self, feats, coords, valid, grid):
        K = int(np.prod(self.kernel_size))
        w = self.param('kernel', conv_init,
                       (K, feats.shape[-1], self.out_channels))
        b = (self.param('bias', nn.initializers.zeros, (self.out_channels,))
             if self.use_bias else None)

        B, N, C = feats.shape
        M = self.out_budget
        if sp.STRIDED_PAIRMAJOR:
            oc, ov, out_grid, bwd_d, parity = \
                sp.downsample_rulebook_pairmajor(
                    coords, valid, tuple(grid), self.kernel_size,
                    self.stride, self.padding, self.out_budget)
            of = sp.rulebook_conv_pairmajor(
                feats.reshape(B * N, C), w, bwd_d, parity,
                ov.reshape(B * M), self.kernel_size, self.stride)
        elif sp.RB_COMPACT_BWD:
            oc, ov, out_grid, fm_flat, bwd_d, parity = \
                sp.downsample_rulebook_compact(
                    coords, valid, tuple(grid), self.kernel_size,
                    self.stride, self.padding, self.out_budget)
            of = sp.rulebook_conv_compact(
                feats.reshape(B * N, C), w, fm_flat, bwd_d, parity,
                ov.reshape(B * M), self.kernel_size, self.stride)
        else:
            oc, ov, out_grid, fm_flat, bm_flat = \
                sp.downsample_rulebook_batched(
                    coords, valid, tuple(grid), self.kernel_size,
                    self.stride, self.padding, self.out_budget)
            of = sp.rulebook_conv(feats.reshape(B * N, C), w, fm_flat,
                                  bm_flat, ov.reshape(B * M))
        of = of.reshape(B, M, self.out_channels)
        if b is not None:
            of = of + b
        return of, oc, ov, out_grid


class SparseConvBlock(nn.Module):
    """conv (+ norm + relu) — sparse equivalent of make_sparse_convmodule
    with order ('conv', 'norm', 'act')."""
    out_channels: int
    conv_type: str = 'subm'  # 'subm' | 'spconv'
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (1, 1, 1)
    padding: Tuple[int, int, int] = (1, 1, 1)
    out_budget: int = 16000

    @nn.compact
    def __call__(self, feats, coords, valid, grid, train: bool):
        if self.conv_type == 'subm':
            x = SubMConv3d(self.out_channels,
                           kernel_size=self.kernel_size[0])(
                               feats, coords, valid, grid)
            out_coords, out_valid, out_grid = coords, valid, grid
        else:
            x, out_coords, out_valid, out_grid = SparseConv3d(
                self.out_channels, self.kernel_size, self.stride,
                self.padding, self.out_budget)(feats, coords, valid, grid)
        x = MaskedBatchNorm()(x, out_valid, train)
        x = nn.relu(x)
        return x, out_coords, out_valid, out_grid


class SubMConv3dMapped(nn.Module):
    """Submanifold conv on a precomputed neighbor map (the binary-search
    neighbor resolution is shared across every SubM conv of a stage —
    ops.sparse.build_neighbor_map).

    Tile form: when ``feats`` is a 5-D dense-tile array
    [Tf, tz, ty, tx, C] (ops.tile_conv), ``nmap``/``hit`` are the tile
    neighbor map [27, Tf] and ``valid`` is the [Tf, tz, ty, tx] active
    cell mask. Same 'kernel' param either way, so checkpoints are
    engine-independent."""
    out_channels: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, feats, valid, nmap, hit):
        k3 = self.kernel_size ** 3
        w = self.param('kernel', conv_init,
                       (k3, feats.shape[-1], self.out_channels))
        if feats.ndim == 5:
            from ..ops import tile_conv as tc
            return tc.tile_subm_conv(feats, nmap, hit, valid, w)
        B, N, C = feats.shape
        if hit.ndim == 5:
            # x-triple map (sp.build_subm_map with GGA_SUBM_TRIPLE=1):
            # nmap = anchor [B, 9, N], hit = sel [B, 9, N, 3, 3]
            anchor = (nmap + (jnp.arange(B, dtype=nmap.dtype)
                              * N)[:, None, None])
            anchor = anchor.transpose(1, 0, 2).reshape(9, B * N)
            sel = hit.transpose(1, 0, 2, 3, 4).reshape(9, B * N, 3, 3)
            out = sp.subm_conv_triple(
                feats.reshape(B * N, C), valid.reshape(B * N),
                anchor, sel, w)
            return out.reshape(B, N, self.out_channels)
        nmap_flat, hit_flat = flatten_nmap(nmap, hit)
        if (sp.WINDOW_CONV and sp._wc_ok(C)
                and sp._wc_ok(self.out_channels)):
            out = sp.subm_conv_window(
                feats.reshape(B * N, C), valid.reshape(B * N),
                nmap_flat, hit_flat, w)
        else:
            out = sp.subm_conv_with_map(
                feats.reshape(B * N, C), valid.reshape(B * N),
                nmap_flat, hit_flat, w)
        return out.reshape(B, N, self.out_channels)


class SparseBasicBlock(nn.Module):
    """ResNet BasicBlock on sparse tensors
    (/root/reference/mmdet3d/ops/sparse_block.py:23): two SubM convs with
    BN; residual add; ReLU after each (second after the add).

    Accepts either row form (feats [B, N, C], valid [B, N], nmap/hit a
    flat neighbor map) or tile form (feats [Tf, tz, ty, tx, C], valid
    the cell mask, nmap/hit the tile neighbor map) — SubMConv3dMapped
    and MaskedBatchNorm dispatch on rank, params are identical."""
    channels: int

    @nn.compact
    def __call__(self, feats, coords, valid, grid, train: bool,
                 nmap=None, hit=None):
        if nmap is None:
            def mk(c, v):
                st = sp.SparseTensor(jnp.zeros_like(c, jnp.float32)[:, :1],
                                     c, v, tuple(grid))
                return sp.build_subm_map(st)
            nmap, hit = jax.vmap(mk)(coords, valid)
        identity = feats
        x = SubMConv3dMapped(self.channels)(feats, valid, nmap, hit)
        x = MaskedBatchNorm()(x, valid, train)
        x = nn.relu(x)
        x = SubMConv3dMapped(self.channels)(x, valid, nmap, hit)
        x = MaskedBatchNorm()(x, valid, train)
        x = nn.relu(x + identity)
        return x


class ConvModule2d(nn.Module):
    """Conv2d + BN + ReLU on NHWC maps (mmcv ConvModule equivalent).
    Computes in the INPUT dtype (params stay f32): feed bf16 maps for the
    fast path."""
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = False
    use_norm: bool = True
    use_act: bool = True

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.out_channels,
                    (self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride),
                    padding='SAME' if self.stride == 1 else
                    [(self.kernel_size // 2,) * 2] * 2,
                    use_bias=self.use_bias,
                    dtype=x.dtype,
                    kernel_init=conv_init)(x)
        if self.use_norm:
            x = BatchNorm2d()(x, train)
        if self.use_act:
            x = nn.relu(x)
        return x
