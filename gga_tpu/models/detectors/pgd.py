"""FCOSMono3D / PGD detector: ResNet + FPN + PGDHead.

Rebuild of the reference's FCOSMono3D shell with the PGD head as configured
for GGA retraining (/root/reference/configs/gga/gga_pdg.py:5-63).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn

from ..backbones.resnet import ResNet
from ..dense_heads.pgd_head import PGDConfig, PGDHead
from ..necks.fpn import FPN


@dataclasses.dataclass(frozen=True)
class PGDModelConfig:
    backbone_depth: int = 101
    fpn_channels: int = 256
    fpn_start_level: int = 0
    fpn_num_outs: int = 4
    head: PGDConfig = dataclasses.field(default_factory=PGDConfig)

    @classmethod
    def tiny(cls):
        head = PGDConfig(
            feat_channels=32, stacked_convs=1,
            cls_branch=(32,), reg_branch=((32,),) * 6,
            dir_branch=(32,), centerness_branch=(32,),
            depth_branch=(32,), weight_branch=((32,),),
            pos_budget=128, nms_pre=32, max_per_img=8)
        return cls(backbone_depth=18, fpn_channels=32, head=head)


class PGDDetector(nn.Module):
    cfg: PGDModelConfig

    @nn.compact
    def __call__(self, images, train: bool = True):
        """images: [B, H, W, 3] (normalized) -> (per-level head outs,
        fuse_lambda)."""
        c = self.cfg
        feats = ResNet(depth=c.backbone_depth)(images, train)
        fpn = FPN(out_channels=c.fpn_channels,
                  start_level=c.fpn_start_level,
                  num_outs=c.fpn_num_outs)(feats, train)
        return PGDHead(c.head)(fpn, train)
