"""Sparse 3D ResNet backbone for indoor detection (FCAF3D).

Rebuild of MinkResNet (/root/reference/mmdet3d/models/backbones/
mink_resnet.py:18, MinkowskiEngine) on the gather-GEMM-scatter sparse
engine: conv1 k3 s2 + InstanceNorm + ReLU + maxpool k2 s2, then 4 stages of
BasicBlocks whose first block carries the stride-2 (k3 s2 conv + 1x1 s2
identity projection, evaluated at the same output sites — mirroring ME's
shared coordinate manager).

Batch is handled by vmap over per-sample SparseTensors; norms run outside
the vmap on [B, N, C] so statistics match the reference's per-tensor norms.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import sparse as sp
from ..layers import MaskedBatchNorm, conv_init

ARCH = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3)}


class MaskedInstanceNorm(nn.Module):
    """Per-sample instance norm over active voxels
    (MinkowskiInstanceNorm after conv1, mink_resnet.py:53)."""
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, valid):
        """x: [B, N, C]; valid: [B, N]."""
        c = x.shape[-1]
        scale = self.param('scale', nn.initializers.ones, (c,))
        bias = self.param('bias', nn.initializers.zeros, (c,))
        m = valid[..., None].astype(jnp.float32)
        cnt = jnp.maximum(m.sum(axis=1, keepdims=True), 1.0)
        mean = (x * m).sum(axis=1, keepdims=True) / cnt
        var = (((x - mean) ** 2) * m).sum(axis=1, keepdims=True) / cnt
        y = (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias
        return jnp.where(valid[..., None], y, 0.0)


def _vmap_subm(weights, feats, coords, valid, grid):
    def one(f, c, v):
        st = sp.SparseTensor(features=f, coords=c, valid=v, grid=grid)
        return sp.subm_conv(st, weights).features
    return jax.vmap(one)(feats, coords, valid)


class MinkBasicBlock(nn.Module):
    """BasicBlock; stride=2 downsamples inside the block
    (ME resnet_block.BasicBlock via MinkResNet._make_layer)."""
    channels: int
    stride: int = 1
    out_budget: int = 4096

    @nn.compact
    def __call__(self, feats, coords, valid, grid, train: bool):
        cin = feats.shape[-1]
        w1 = self.param('w1', conv_init, (27, cin, self.channels))
        w2 = self.param('w2', conv_init, (27, self.channels, self.channels))

        if self.stride == 1:
            x = _vmap_subm(w1, feats, coords, valid, grid)
            oc, ov, og = coords, valid, grid
            identity = feats
        else:
            def down(f, c, v):
                st = sp.SparseTensor(f, c, v, tuple(grid))
                out = sp.sparse_conv_fast(st, w1, (3, 3, 3), (2, 2, 2),
                                     (1, 1, 1), self.out_budget)
                return out.features, out.coords, out.valid

            x, oc, ov = jax.vmap(down)(feats, coords, valid)
            st0 = sp.SparseTensor(feats[0], coords[0], valid[0],
                                  tuple(grid))
            _, _, og = sp.downsample_coords(st0, (3, 3, 3), (2, 2, 2),
                                            (1, 1, 1), 1)
            # identity: 1x1 stride-2 projection gathered at the SAME output
            # sites (ME shares the coordinate map across branches)
            wd = self.param('wd', conv_init, (1, cin, self.channels))

            def ident(f, c, v, qc, qv):
                st = sp.SparseTensor(f, c, v, tuple(grid))
                g = sp.gather_neighbors(st, qc, qv, (1, 1, 1), (2, 2, 2),
                                        (0, 0, 0))[0]
                return g

            idf = jax.vmap(ident)(feats, coords, valid, oc, ov)
            identity = jnp.einsum('bnc,cd->bnd', idf, wd[0],
                                  preferred_element_type=jnp.float32)
            identity = MaskedBatchNorm(name='bn_down')(identity, ov, train)

        x = nn.relu(MaskedBatchNorm(name='bn1')(x, ov, train))
        x = _vmap_subm(w2, x, oc, ov, og)
        x = MaskedBatchNorm(name='bn2')(x, ov, train)
        if self.stride == 1 and cin != self.channels:
            wd = self.param('wd', conv_init, (1, cin, self.channels))
            identity = jnp.einsum('bnc,cd->bnd', identity, wd[0],
                                  preferred_element_type=jnp.float32)
            identity = MaskedBatchNorm(name='bn_down')(identity, ov, train)
        out = nn.relu(x + identity)
        out = jnp.where(ov[..., None], out, 0.0)
        return out, oc, ov, og


class MinkResNet(nn.Module):
    depth: int = 34
    in_channels: int = 3
    base_planes: int = 64
    # budgets: after conv1(s2), after pool(s2), then per stage (s2 each)
    budgets: Tuple[int, ...] = (65536, 32768, 16384, 8192, 4096, 2048)

    @nn.compact
    def __call__(self, feats, coords, valid, grid, train: bool = True):
        """feats [B, N, C]; coords [B, N, 3] (z, y, x) sorted; valid [B, N].

        Returns list over 4 stages of (feats, coords, valid, grid).
        """
        stage_blocks = ARCH[self.depth]
        w0 = self.param('conv1', conv_init,
                        (27, self.in_channels, self.base_planes))

        def conv1(f, c, v):
            st = sp.SparseTensor(features=f, coords=c, valid=v,
                                 grid=tuple(grid))
            out = sp.sparse_conv_fast(st, w0, (3, 3, 3), (2, 2, 2), (1, 1, 1),
                                 self.budgets[0])
            return out.features, out.coords, out.valid

        f, c, v = jax.vmap(conv1)(feats, coords, valid)
        st0 = sp.SparseTensor(feats[0], coords[0], valid[0], tuple(grid))
        _, _, g = sp.downsample_coords(st0, (3, 3, 3), (2, 2, 2),
                                       (1, 1, 1), 1)
        f = nn.relu(MaskedInstanceNorm()(f, v))

        def pool(f_, c_, v_):
            st = sp.SparseTensor(f_, c_, v_, g)
            out = sp.sparse_max_pool(st, out_budget=self.budgets[1])
            return out.features, out.coords, out.valid

        f2, c2, v2 = jax.vmap(pool)(f, c, v)
        st0 = sp.SparseTensor(f[0], c[0], v[0], g)
        g = tuple(d // 2 for d in g)
        f, c, v = f2, c2, v2

        outs = []
        planes = self.base_planes
        for i, n_blocks in enumerate(stage_blocks):
            f, c, v, g = MinkBasicBlock(
                planes, stride=2, out_budget=self.budgets[i + 2],
                name=f'layer{i}_0')(f, c, v, g, train)
            for b in range(1, n_blocks):
                f, c, v, g = MinkBasicBlock(
                    planes, name=f'layer{i}_{b}')(f, c, v, g, train)
            outs.append((f, c, v, g))
            planes *= 2
        return outs
