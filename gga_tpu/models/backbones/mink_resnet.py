"""Sparse 3D ResNet backbone for indoor detection (FCAF3D).

Rebuild of MinkResNet (/root/reference/mmdet3d/models/backbones/
mink_resnet.py:18, MinkowskiEngine) on the gather-GEMM-scatter sparse
engine: conv1 k3 s2 + InstanceNorm + ReLU + maxpool k2 s2, then 4 stages of
BasicBlocks whose first block carries the stride-2 (k3 s2 conv + 1x1 s2
identity projection, evaluated at the same output sites — mirroring ME's
shared coordinate manager).

Rulebook/neighbor-map construction is vmapped per scene; every conv
gather+GEMM runs batch-FLATTENED on [B*N, C] with row-offset maps
(vmapped gathers are ~4x slower on TPU — tools/microbench_vmap_gather.py).
Each coordinate set's neighbor map is built once and shared by all SubM
convs on it. Norms run on [B, N, C] so statistics match the reference's
per-tensor norms.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import sparse as sp
from ..layers import MaskedBatchNorm, conv_init, flatten_nmap

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


def _build_nmap(coords, valid, grid):
    """Vmapped neighbor-map build for a batched coordinate set."""
    def one(c, v):
        st = sp.SparseTensor(jnp.zeros((c.shape[0], 1), jnp.float32),
                             c, v, tuple(grid))
        return sp.build_neighbor_map(st)
    return jax.vmap(one)(coords, valid)


def _flat_subm(weights, feats, valid, nmap, hit):
    """Batch-flattened submanifold conv on a shared neighbor map."""
    B, N, C = feats.shape
    nf, hf = flatten_nmap(nmap, hit)
    out = sp.subm_conv_with_map(feats.reshape(B * N, C),
                                valid.reshape(B * N), nf, hf, weights)
    return out.reshape(B, N, weights.shape[-1])


class MinkBasicBlock(nn.Module):
    """BasicBlock; stride=2 downsamples inside the block
    (ME resnet_block.BasicBlock via MinkResNet._make_layer).

    Returns (feats, coords, valid, grid, nmap, hit) — the neighbor map
    of the OUTPUT coordinate set, reusable by following stride-1 blocks
    of the same stage.
    """
    channels: int
    stride: int = 1
    out_budget: int = 4096

    @nn.compact
    def __call__(self, feats, coords, valid, grid, train: bool,
                 nmap=None, hit=None):
        cin = feats.shape[-1]
        w1 = self.param('w1', conv_init, (27, cin, self.channels))
        w2 = self.param('w2', conv_init, (27, self.channels, self.channels))
        B, N, _ = feats.shape

        if self.stride == 1:
            if nmap is None:
                nmap, hit = _build_nmap(coords, valid, grid)
            x = _flat_subm(w1, feats, valid, nmap, hit)
            oc, ov, og = coords, valid, grid
            identity = feats
        else:
            oc, ov, og, fm_f, bm_f = sp.downsample_rulebook_batched(
                coords, valid, tuple(grid), (3, 3, 3), (2, 2, 2),
                (1, 1, 1), self.out_budget)
            M = self.out_budget
            x = sp.rulebook_conv(
                feats.reshape(B * N, cin), w1, fm_f, bm_f,
                ov.reshape(B * M)).reshape(B, M, self.channels)
            nmap, hit = _build_nmap(oc, ov, og)
            # identity: 1x1 stride-2 projection gathered at the SAME output
            # sites (ME shares the coordinate map across branches)
            wd = self.param('wd', conv_init, (1, cin, self.channels))

            def resolve(f, c, v, qc, qv):
                st = sp.SparseTensor(f, c, v, tuple(grid))
                return sp._neighbor_pos_hit(st, qc, qv, (1, 1, 1),
                                            (2, 2, 2), (0, 0, 0))

            pos1, hit1 = jax.vmap(resolve)(feats, coords, valid, oc, ov)
            # the map indexes into the INPUT set (N rows/scene), not the
            # output set (M rows/scene) — pass n_in or scenes cross-talk
            p_f, h_f = flatten_nmap(pos1, hit1, n_in=N)
            ff = feats.reshape(B * N, cin)
            idf = jnp.where(h_f[0][:, None], ff[p_f[0]],
                            jnp.zeros((), ff.dtype)).reshape(B, M, cin)
            identity = jnp.einsum('bnc,cd->bnd', idf, wd[0],
                                  preferred_element_type=jnp.float32)
            identity = MaskedBatchNorm(name='bn_down')(identity, ov, train)

        x = nn.relu(MaskedBatchNorm(name='bn1')(x, ov, train))
        x = _flat_subm(w2, x, ov, nmap, hit)
        x = MaskedBatchNorm(name='bn2')(x, ov, train)
        if self.stride == 1 and cin != self.channels:
            wd = self.param('wd', conv_init, (1, cin, self.channels))
            identity = jnp.einsum('bnc,cd->bnd', identity, wd[0],
                                  preferred_element_type=jnp.float32)
            identity = MaskedBatchNorm(name='bn_down')(identity, ov, train)
        out = nn.relu(x + identity)
        out = jnp.where(ov[..., None], out, 0.0)
        return out, oc, ov, og, nmap, hit


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
        B, N, _ = feats.shape

        c0, v0, g, fm_f, bm_f = sp.downsample_rulebook_batched(
            coords, valid, tuple(grid), (3, 3, 3), (2, 2, 2), (1, 1, 1),
            self.budgets[0])
        f = sp.rulebook_conv(
            feats.reshape(B * N, self.in_channels), w0, fm_f, bm_f,
            v0.reshape(-1)).reshape(B, self.budgets[0], self.base_planes)
        c, v = c0, v0
        f = nn.relu(MaskedInstanceNorm()(f, v))

        def pool(f_, c_, v_):
            st = sp.SparseTensor(f_, c_, v_, g)
            out = sp.sparse_max_pool(st, out_budget=self.budgets[1])
            return out.features, out.coords, out.valid

        f, c, v = jax.vmap(pool)(f, c, v)
        g = tuple(d // 2 for d in g)

        outs = []
        planes = self.base_planes
        for i, n_blocks in enumerate(stage_blocks):
            f, c, v, g, nmap, hit = MinkBasicBlock(
                planes, stride=2, out_budget=self.budgets[i + 2],
                name=f'layer{i}_0')(f, c, v, g, train)
            for b in range(1, n_blocks):
                f, c, v, g, nmap, hit = MinkBasicBlock(
                    planes, name=f'layer{i}_{b}')(
                        f, c, v, g, train, nmap=nmap, hit=hit)
            outs.append((f, c, v, g))
            planes *= 2
        return outs
