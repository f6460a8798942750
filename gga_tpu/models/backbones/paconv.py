"""PAConv: position-adaptive convolution segmentor.

Rebuild of the PAConv op (/root/reference/mmdet3d/ops/paconv/paconv.py:108
non-CUDA variant), its ScoreNet (:14), the PAConv PointNet2 segmentor
(configs/paconv + decode_heads/paconv_head.py:11) and the kernel
correlation regularizer (losses/paconv_regularization_loss.py): every
neighbor's filter is assembled on the fly as a ScoreNet-weighted mixture
of M weight-bank kernels, where the ScoreNet reads the point-pair
geometry [center | diff | distance] ('w_neighbor_dist') and the kernel
consumes [feature-diff | feature] ('w_neighbor').
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import points as po
from ..layers import conv_init
from .pointnet2 import PointFPModule, SharedMLP


class ScoreNet(nn.Module):
    """MLP on pair geometry -> softmax kernel scores (paconv.py:14)."""
    num_kernels: int
    hidden: Tuple[int, ...] = (16, 16)
    temp: float = 1.0

    @nn.compact
    def __call__(self, pair_feats, mask, train):
        h = SharedMLP(self.hidden, name='mlp')(pair_feats, mask, train)
        s = nn.Dense(self.num_kernels, kernel_init=conv_init,
                     name='out')(h)
        return jax.nn.softmax(s / self.temp, axis=-1)


class PAConvLayer(nn.Module):
    """One PAConv on grouped neighborhoods.

    Input: grouped features [B, S, K, C] + relative xyz [B, S, K, 3]
    (+ absolute center xyz). Output [B, S, K, out_channels].
    """
    out_channels: int
    num_kernels: int = 8

    @nn.compact
    def __call__(self, feats, rel_xyz, center_xyz, mask, train):
        B, S, K, C = feats.shape
        # kernel input 'w_neighbor': [feat - center | feat]
        center_f = feats[:, :, :1, :]
        kin = jnp.concatenate([feats - center_f, feats], -1)  # 2C

        # scorenet input 'w_neighbor_dist': [center | diff | dist]
        dist = jnp.linalg.norm(rel_xyz, axis=-1, keepdims=True)
        ctr = jnp.broadcast_to(center_xyz[:, :, None, :],
                               rel_xyz.shape)
        pair = jnp.concatenate([ctr, rel_xyz, dist], -1)       # 7
        scores = ScoreNet(self.num_kernels, name='scorenet')(
            pair, mask, train)                                 # [B,S,K,M]

        bank = self.param(
            'weight_bank', conv_init,
            (2 * C, self.num_kernels * self.out_channels))
        mixed = (kin @ bank).reshape(
            B, S, K, self.num_kernels, self.out_channels)
        out = (mixed * scores[..., None]).sum(-2)
        out = nn.BatchNorm(use_running_average=not train,
                           momentum=0.9, name='bn')(out)
        return nn.relu(out)

def paconv_regularization_loss(params, num_kernels=8,
                               reduction='mean'):
    """Mean (or sum) of upper-triangular squared cosine similarities
    between the M kernels of every PAConv weight bank in a param tree
    (paconv_regularization_loss.py:20)."""
    banks = []

    def walk(tree):
        if isinstance(tree, dict):
            if 'weight_bank' in tree:
                banks.append(tree['weight_bank'])
            for v in tree.values():
                walk(v)

    walk(params)
    out = []
    for bank in banks:
        cin = bank.shape[0]
        m = num_kernels
        flat = bank.reshape(cin, m, -1).transpose(1, 0, 2).reshape(m, -1)
        inner = flat @ flat.T
        norms = jnp.sqrt((flat ** 2).sum(-1, keepdims=True))
        cos = inner / jnp.maximum(norms @ norms.T, 1e-8)
        out.append((jnp.triu(cos, 1) ** 2).sum())
    total = jnp.sum(jnp.stack(out)) if out else jnp.zeros(())
    if reduction == 'mean' and out:
        total = total / len(out)
    return total


class PAConvSAModule(nn.Module):
    """Set abstraction with PAConv layers instead of shared MLPs."""
    num_point: int
    radius: float
    num_sample: int
    channels: Tuple[int, ...]
    num_kernels: int = 8

    @nn.compact
    def __call__(self, xyz, feats, valid, train):
        idx = jax.vmap(lambda p, v: po.furthest_point_sample(
            p, v, self.num_point))(xyz, valid)
        new_xyz = jnp.take_along_axis(xyz, idx[..., None], 1)
        new_valid = jnp.take_along_axis(valid, idx, 1)

        def group(p, f, v, c):
            out, mask = po.query_and_group(p, f, c, self.radius,
                                           self.num_sample, p_valid=v)
            return out[..., :3], out[..., 3:], mask

        rel, g_feats, mask = jax.vmap(group)(xyz, feats, valid, new_xyz)
        h = g_feats
        for i, ch in enumerate(self.channels):
            h = PAConvLayer(ch, self.num_kernels, name=f'paconv{i}')(
                h, rel, new_xyz, mask, train)
        neg = jnp.finfo(h.dtype).min
        pooled = jnp.where(mask[..., None], h, neg).max(-2)
        pooled = jnp.where((mask.any(-1) & new_valid)[..., None],
                           pooled, 0.0)
        return new_xyz, pooled, new_valid


@dataclasses.dataclass(frozen=True)
class PAConvConfig:
    in_channels: int = 9
    num_points: Tuple[int, ...] = (1024, 256, 64, 16)
    radii: Tuple[float, ...] = (0.1, 0.2, 0.4, 0.8)
    num_samples: Tuple[int, ...] = (32, 32, 32, 32)
    sa_channels: Sequence[Tuple[int, ...]] = (
        (32, 32, 64), (64, 64, 128), (128, 128, 256), (256, 256, 512))
    fp_channels: Sequence[Tuple[int, ...]] = (
        (256, 256), (256, 256), (256, 128), (128, 128, 128))
    num_kernels: int = 8
    num_classes: int = 13
    head_channels: int = 128
    dropout: float = 0.5


class PAConvSegmentor(nn.Module):
    """PAConv SSG segmentor (configs/paconv/paconv_ssg.py stack)."""
    cfg: PAConvConfig

    @nn.compact
    def __call__(self, points, valid, train: bool = True):
        c = self.cfg
        xyz = points[..., :3]
        feats = points[..., 3:] if points.shape[-1] > 3 else \
            jnp.zeros(points.shape[:-1] + (0,))
        sa_xyz, sa_feats, sa_valid = [xyz], [feats], [valid]
        for i in range(len(c.num_points)):
            x, f, v = PAConvSAModule(
                c.num_points[i], c.radii[i], c.num_samples[i],
                tuple(c.sa_channels[i]), c.num_kernels,
                name=f'sa{i}')(sa_xyz[-1], sa_feats[-1], sa_valid[-1],
                               train)
            sa_xyz.append(x)
            sa_feats.append(f)
            sa_valid.append(v)
        f = sa_feats[-1]
        x = sa_xyz[-1]
        v = sa_valid[-1]
        for i, mlp in enumerate(c.fp_channels):
            tgt = -(i + 2)
            f = PointFPModule(tuple(mlp), name=f'fp{i}')(
                sa_xyz[tgt], sa_feats[tgt], x, f, v, sa_valid[tgt],
                train)
            x, v = sa_xyz[tgt], sa_valid[tgt]
        h = SharedMLP((c.head_channels,), name='pre_seg')(f, v, train)
        h = nn.Dropout(c.dropout, deterministic=not train)(h)
        return nn.Dense(c.num_classes, name='cls_seg')(h)
