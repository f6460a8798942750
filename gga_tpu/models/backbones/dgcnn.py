"""DGCNN backbone + segmentation head.

Rebuild of DGCNNBackbone (/root/reference/mmdet3d/models/backbones/
dgcnn.py:10), its GF/FA modules (ops/dgcnn_modules/) and DGCNNHead
(decode_heads/dgcnn_head.py:12): each graph-feature module builds a
k-NN graph (D-KNN on the last-3 coordinate dims for the first module,
F-KNN on full features after), forms edge features
[neighbor - center | center], runs a shared MLP and max-pools over
neighbors; the FA module concatenates all GF outputs, lifts them, and
appends the global max feature; the head is an MLP + classifier on the
aggregated per-point features. Masked k-NN keeps padding points out of
every graph.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .pointnet2 import SharedMLP


def masked_knn_graph(feats, valid, k):
    """[N, C] features -> [N, k] neighbor indices (self excluded is NOT
    required by DGCNN — the reference's knn includes self)."""
    d = ((feats[:, None, :] - feats[None, :, :]) ** 2).sum(-1)
    d = jnp.where(valid[None, :], d, jnp.inf)
    _, idx = jax.lax.top_k(-d, k)
    return idx


class DGCNNGFModule(nn.Module):
    """Graph-feature module (dgcnn_gf_module.py:109)."""
    mlp_channels: Tuple[int, ...]
    num_sample: int = 20
    knn_mode: str = 'F-KNN'

    @nn.compact
    def __call__(self, feats, valid, train):
        """feats [B, N, C] -> [B, N, mlp[-1]]."""
        def graph(f, v):
            key = f[:, -3:] if self.knn_mode == 'D-KNN' else f
            return masked_knn_graph(key, v, self.num_sample)

        idx = jax.vmap(graph)(feats, valid)               # [B, N, K]
        grouped = jnp.take_along_axis(
            feats[:, :, None, :], idx[..., None], 1)      # [B, N, K, C]
        edge = jnp.concatenate(
            [grouped - feats[:, :, None, :],
             jnp.broadcast_to(feats[:, :, None, :], grouped.shape)], -1)
        g = SharedMLP(tuple(self.mlp_channels))(
            edge, valid[:, :, None], train)
        neg = jnp.finfo(g.dtype).min
        nb_valid = jax.vmap(lambda v, i: v[i])(valid, idx)  # [B, N, K]
        pooled = jnp.where(nb_valid[..., None], g, neg).max(-2)
        return jnp.where(valid[..., None], pooled, 0.0)


@dataclasses.dataclass(frozen=True)
class DGCNNConfig:
    in_channels: int = 9         # s3dis: xyz + rgb + normalized xyz
    num_samples: Tuple[int, ...] = (20, 20, 20)
    knn_modes: Tuple[str, ...] = ('D-KNN', 'F-KNN', 'F-KNN')
    gf_channels: Sequence[Tuple[int, ...]] = ((64, 64), (64, 64), (64,))
    fa_channels: Tuple[int, ...] = (1024,)
    # head (decode_heads/dgcnn_head.py + s3dis config)
    num_classes: int = 13
    fp_channels: Tuple[int, ...] = (512,)
    head_channels: int = 256
    dropout: float = 0.5


class DGCNNBackbone(nn.Module):
    cfg: DGCNNConfig

    @nn.compact
    def __call__(self, points, valid, train: bool = True):
        """points [B, N, C] -> dict(gf_points list, fa_points)."""
        c = self.cfg
        gf = [points]
        for i, mlps in enumerate(c.gf_channels):
            gf.append(DGCNNGFModule(
                tuple(mlps), c.num_samples[i], c.knn_modes[i],
                name=f'gf{i}')(gf[-1], valid, train))
        # FA: concat all gf outputs, lift, append global max
        cat = jnp.concatenate(gf[1:], -1)
        lifted = SharedMLP(tuple(c.fa_channels), name='fa')(
            cat, valid, train)
        neg = jnp.finfo(lifted.dtype).min
        gmax = jnp.where(valid[..., None], lifted, neg).max(
            1, keepdims=True)
        fa = jnp.concatenate(
            [jnp.broadcast_to(gmax, lifted.shape), cat], -1)
        return dict(gf_points=gf, fa_points=fa, fa_valid=valid)


class DGCNNSegmentor(nn.Module):
    """Backbone + DGCNNHead as one segmentor (EncoderDecoder3D shape)."""
    cfg: DGCNNConfig

    @nn.compact
    def __call__(self, points, valid, train: bool = True):
        c = self.cfg
        feat = DGCNNBackbone(c, name='backbone')(points, valid, train)
        h = SharedMLP(tuple(c.fp_channels), name='fp')(
            feat['fa_points'], valid, train)
        h = SharedMLP((c.head_channels,), name='pre_seg')(h, valid,
                                                          train)
        h = nn.Dropout(c.dropout, deterministic=not train)(h)
        return nn.Dense(c.num_classes, name='cls_seg')(h)
