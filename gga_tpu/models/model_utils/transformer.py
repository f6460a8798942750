"""Transformer pieces for GroupFree3D.

Rebuild of GroupFree3DMHA + the BaseTransformerLayer stack configured at
/root/reference/configs/_base_/models/groupfree3d.py:24-38 (operation
order self_attn -> norm -> cross_attn -> norm -> ffn -> norm, DETR-style
positional encodings added to queries/keys before attention, identity
shortcuts around each block) and the ConvBNPositionalEncoding used for
decoder_self_posembeds (on 6-dim proposal boxes) / cross_posembeds (on
seed xyz).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class PositionalMLP(nn.Module):
    """ConvBNPositionalEncoding: 1x1 conv + BN + ReLU + 1x1 conv."""
    embed_dim: int

    @nn.compact
    def __call__(self, x, train: bool):
        h = nn.Dense(self.embed_dim, name='fc0')(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name='bn')(h)
        h = nn.relu(h)
        return nn.Dense(self.embed_dim, name='fc1')(h)


class GroupFree3DDecoderLayer(nn.Module):
    embed_dim: int
    num_heads: int = 8
    ffn_dim: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, query, query_pos, key, key_pos, key_valid, train):
        """query [B, M, C]; key [B, N, C]; key_valid [B, N]."""
        det = not train
        # self attention among queries (q = k = query + pos, v = query)
        q_in = query + query_pos
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.embed_dim,
            dropout_rate=self.dropout, name='self_attn')(
                q_in, inputs_k=q_in, inputs_v=query, deterministic=det)
        query = nn.LayerNorm(name='norm1')(query + attn)

        # cross attention to seeds
        mask = key_valid[:, None, None, :]      # [B, 1, q, k] broadcast
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.embed_dim,
            dropout_rate=self.dropout, name='cross_attn')(
                query + query_pos, inputs_k=key + key_pos, inputs_v=key,
                mask=mask, deterministic=det)
        query = nn.LayerNorm(name='norm2')(query + attn)

        # FFN
        h = nn.Dense(self.ffn_dim, name='ffn0')(query)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=det)(h)
        h = nn.Dense(self.embed_dim, name='ffn1')(h)
        return nn.LayerNorm(name='norm3')(query + h)
