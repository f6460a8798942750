"""MonoFlex monocular 3D detector: DLA-34 + DLANeck + MonoFlexHead.

The reference registers MonoFlexHead for a SingleStageMono3DDetector
with a DLA backbone (configs/monoflex ships only README/metafile — the
head is test-pinned at tests/test_models/test_heads/test_heads.py:1510);
this assembles the same stack the MonoFlex paper and the SMOKE config
use: DLA-34 (gn-all) -> DLANeck stride-4 map -> head.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn

from ..backbones.dla import DLANet
from ..dense_heads.monoflex_head import (MonoFlexConfig, MonoFlexHead,
                                         monoflex_decode, monoflex_loss)
from ..necks.dla_neck import DLANeck


@dataclasses.dataclass(frozen=True)
class MonoFlexModelConfig:
    img_depth: int = 34
    dla_channels: Tuple[int, ...] = ()      # override for tiny configs
    head: MonoFlexConfig = dataclasses.field(
        default_factory=MonoFlexConfig)

    @classmethod
    def tiny(cls):
        return cls(dla_channels=(4, 8, 8, 16, 16, 16),
                   head=MonoFlexConfig(feat_channels=16, max_objs=8,
                                       topk=16))


class MonoFlexDetector(nn.Module):
    cfg: MonoFlexModelConfig

    @nn.compact
    def __call__(self, img, train: bool = True):
        """img [B, H, W, 3] -> head predictions on the stride-4 map."""
        c = self.cfg
        levels = DLANet(depth=c.img_depth,
                        base_channels=tuple(c.dla_channels))(img, train)
        x = DLANeck(in_channels=tuple(l.shape[-1] for l in levels))(
            levels, train)
        return MonoFlexHead(c.head)(x, train)

    def loss(self, preds, gt_boxes_cam, labels, bboxes2d, centers2d,
             depths, obj_valid, cam2img, img_shape):
        return monoflex_loss(self.cfg.head, preds, gt_boxes_cam, labels,
                             bboxes2d, centers2d, depths, obj_valid,
                             cam2img, img_shape)

    def decode(self, preds, cam2img):
        return monoflex_decode(self.cfg.head, preds, cam2img)
