"""3D semantic segmentation: encoder-decoder over point clouds.

TPU rebuild of /root/reference/mmdet3d/models/segmentors/
encoder_decoder.py:14 (EncoderDecoder3D with PointNet2SASSG +
PointNet2Head, configs/pointnet2/*-s3dis/scannet): fixed-budget point
batches with validity masks replace the reference's sliding-window
inference; the loss is masked cross-entropy with optional class weights
and ignore_index (Base3DSegmentor losses).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..backbones.pointnet2 import PointNet2SASSG
from ..decode_heads import PointNet2SegHead


@dataclasses.dataclass(frozen=True)
class EncoderDecoder3DConfig:
    num_classes: int = 20
    in_channels: int = 6        # xyz + rgb (ScanNet seg config)
    num_points: Tuple[int, ...] = (1024, 256, 64, 16)
    radii: Tuple[float, ...] = (0.1, 0.2, 0.4, 0.8)
    num_samples: Tuple[int, ...] = (32, 32, 32, 32)
    sa_channels: Sequence[Tuple[int, ...]] = (
        (32, 32, 64), (64, 64, 128), (128, 128, 256), (256, 256, 512))
    fp_channels: Sequence[Tuple[int, ...]] = (
        (256, 256), (256, 256), (256, 128), (128, 128, 128))
    head_channels: int = 128
    dropout_ratio: float = 0.5
    # multi-scale-grouping encoder (pointnet2_msg configs): per-level
    # radius/sample/channel tuples replace the SSG scalars
    # (/root/reference/configs/_base_/models/pointnet2_msg.py)
    msg: bool = False
    msg_radii: Sequence = (
        (0.05, 0.1), (0.1, 0.2), (0.2, 0.4), (0.4, 0.8))
    msg_num_samples: Sequence = ((16, 32), (16, 32), (16, 32), (16, 32))
    msg_sa_channels: Sequence = (
        ((16, 16, 32), (32, 32, 64)),
        ((64, 64, 128), (64, 96, 128)),
        ((128, 196, 256), (128, 196, 256)),
        ((256, 256, 512), (256, 384, 512)))

    @classmethod
    def tiny(cls, num_classes=6):
        return cls(num_classes=num_classes, in_channels=6,
                   num_points=(256, 64, 16, 8),
                   radii=(0.2, 0.4, 0.8, 1.6),
                   num_samples=(16, 16, 8, 8),
                   sa_channels=((8, 8), (8, 16), (16, 16), (16, 16)),
                   fp_channels=((16,), (16,), (16,), (16, 16)),
                   head_channels=16)


class EncoderDecoder3D(nn.Module):
    cfg: EncoderDecoder3DConfig

    @nn.compact
    def __call__(self, points, valid, train: bool = True):
        """points [B, P, in_channels]; valid [B, P].

        Returns per-point class logits [B, P, num_classes].
        """
        c = self.cfg
        if c.msg:
            from ..backbones.pointnet2 import PointNet2SAMSG
            feat = PointNet2SAMSG(
                in_channels=c.in_channels,
                num_points=tuple(c.num_points),
                radii=tuple(tuple(r) for r in c.msg_radii),
                num_samples=tuple(tuple(s) for s in c.msg_num_samples),
                sa_channels=tuple(tuple(tuple(m) for m in lvl)
                                  for lvl in c.msg_sa_channels),
                aggregation_channels=(0,) * len(c.num_points))(
                    points, valid, train)
        else:
            feat = PointNet2SASSG(
                in_channels=c.in_channels,
                num_points=tuple(c.num_points), radii=tuple(c.radii),
                num_samples=tuple(c.num_samples),
                sa_channels=tuple(tuple(x) for x in c.sa_channels),
                fp_channels=())(points, valid, train)
        return PointNet2SegHead(
            num_classes=c.num_classes,
            fp_channels=tuple(tuple(x) for x in c.fp_channels),
            channels=c.head_channels,
            dropout_ratio=c.dropout_ratio)(feat, train)


def segmentation_loss(logits, labels, valid, class_weights=None,
                      ignore_index: Optional[int] = None):
    """Masked cross-entropy (Base3DDecodeHead.losses).

    Args:
        logits: [B, P, K]; labels: [B, P] int; valid: [B, P] bool.
        class_weights: optional [K].
        ignore_index: label value to exclude (reference pads ScanNet
            unannotated points with num_classes).
    """
    K = logits.shape[-1]
    ok = valid
    if ignore_index is not None:
        ok = ok & (labels != ignore_index)
    lab = jnp.clip(labels, 0, K - 1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, lab[..., None], axis=-1)[..., 0]
    w = jnp.ones_like(nll)
    if class_weights is not None:
        w = jnp.asarray(class_weights)[lab]
    nll = jnp.where(ok, nll * w, 0.0)
    denom = jnp.maximum(jnp.where(ok, w, 0.0).sum(), 1.0)
    return nll.sum() / denom
