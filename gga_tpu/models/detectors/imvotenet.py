"""ImVoteNet: VoteNet boosted by lifted 2D detections.

Rebuild of /root/reference/mmdet3d/models/detectors/imvotenet.py:56
(stage-2 joint training): PointNet2SASSG seeds + VoteFusion image cues
-> an img_mlp compresses the cues, three VoteHead towers (joint =
[point | image] features, pts-only, img-only) train with loss weights
(0.8, 0.1, 0.1); inference uses the joint tower.

Scope note: the reference's image BRANCH (a whole mmdet Faster R-CNN
used to produce the 2D boxes, frozen in stage 2) is consumed as
PROVIDED 2D boxes here — the reference itself supports that path
(``extract_bboxes_2d(..., bboxes_2d=...)``, imvotenet.py:440), and its
2D detector is an external mmdet model, not mmdet3d surface.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..backbones.pointnet2 import PointNet2SASSG, SharedMLP
from ..dense_heads.vote_head import VoteHead, VoteHeadConfig
from ..dense_heads import vote_head as vh
from ..fusion_layers.vote_fusion import (VoteFusionConfig,
                                         sample_valid_seeds, vote_fusion)


@dataclasses.dataclass(frozen=True)
class ImVoteNetConfig:
    in_channels: int = 4
    num_points: Tuple[int, ...] = (2048, 1024, 512, 256)
    radii: Tuple[float, ...] = (0.2, 0.4, 0.8, 1.2)
    num_samples: Tuple[int, ...] = (64, 32, 16, 16)
    sa_channels: Tuple = ((64, 64, 128), (128, 128, 256),
                          (128, 128, 256), (128, 128, 256))
    fp_channels: Tuple = ((256, 256), (256, 256))
    num_sampled_seed: int = 1024
    img_mlp_channels: Tuple[int, ...] = (256, 256)
    fusion: VoteFusionConfig = dataclasses.field(
        default_factory=VoteFusionConfig)
    head: VoteHeadConfig = dataclasses.field(
        default_factory=VoteHeadConfig)
    loss_weights: Tuple[float, float, float] = (0.8, 0.1, 0.1)

    @classmethod
    def tiny(cls):
        head = VoteHeadConfig(
            num_classes=4, mean_sizes=((1.0, 1.0, 1.0),) * 4,
            in_channels=16, vote_conv_channels=(16,),
            agg_num_point=16, agg_mlp=(16, 16),
            pred_conv_channels=(16,), max_objs=8, max_out=8,
            pos_distance_thr=0.8, neg_distance_thr=1.2)
        return cls(num_points=(256, 128, 64, 32),
                   sa_channels=((16, 16),) * 4,
                   fp_channels=((16,), (16,)),
                   num_sampled_seed=64, img_mlp_channels=(16,),
                   fusion=VoteFusionConfig(num_classes=4),
                   head=head)


class ImVoteNet(nn.Module):
    cfg: ImVoteNetConfig

    @nn.compact
    def __call__(self, points, points_valid, img, boxes_2d, boxes_valid,
                 depth2img, rng=None, train: bool = True):
        """points [B, P, C]; img [B, H, W, 3]; boxes_2d [B, Kb, 6];
        depth2img [B, 4, 4].

        Returns (joint, pts, img) VoteHead prediction dicts (pts/img
        towers only when training)."""
        c = self.cfg
        feat = PointNet2SASSG(
            in_channels=c.in_channels,
            num_points=tuple(c.num_points), radii=tuple(c.radii),
            num_samples=tuple(c.num_samples),
            sa_channels=tuple(tuple(x) for x in c.sa_channels),
            fp_channels=tuple(tuple(x) for x in c.fp_channels))(
                points, points_valid, train)
        seeds = feat['fp_xyz']
        seed_feats = feat['fp_features']
        seed_valid = feat['fp_valid']

        cues, mask = jax.vmap(
            lambda im, bb, bv, sd, sv, d2i: vote_fusion(
                c.fusion, im, bb, bv, sd, sv, d2i))(
            img, boxes_2d, boxes_valid, seeds, seed_valid, depth2img)

        B = points.shape[0]
        K = c.fusion.max_imvote_per_pixel
        if rng is None:
            rng = jax.random.PRNGKey(0)
        keys = jax.random.split(rng, B)
        inds = jax.vmap(lambda m, k: sample_valid_seeds(
            m, c.num_sampled_seed, k))(mask, keys)          # [B, S']
        cues = jnp.take_along_axis(cues, inds[..., None], 1)
        sel_mask = jnp.take_along_axis(mask, inds, 1)
        seed_idx = inds // K
        sel_seeds = jnp.take_along_axis(seeds, seed_idx[..., None], 1)
        sel_feats = jnp.take_along_axis(seed_feats,
                                        seed_idx[..., None], 1)
        sel_valid = jnp.take_along_axis(seed_valid, seed_idx, 1)

        img_feats = SharedMLP(tuple(c.img_mlp_channels),
                              name='img_mlp')(cues, sel_valid, train)
        img_feats = img_feats * sel_mask[..., None]

        def tower(feats, name):
            # the reference's per-tower vote_module in_channels follows
            # the tower's feature width (joint = pts + img concat)
            hc = dataclasses.replace(c.head,
                                     in_channels=feats.shape[-1])
            fd = dict(fp_xyz=sel_seeds, fp_features=feats,
                      fp_valid=sel_valid)
            return VoteHead(hc, name=name)(fd, train)

        joint = tower(jnp.concatenate([sel_feats, img_feats], -1),
                      'head_joint')
        if not train:
            return (joint,)
        return (joint, tower(sel_feats, 'head_pts'),
                tower(img_feats, 'head_img'))


def imvotenet_loss(cfg: ImVoteNetConfig, towers, points, points_valid,
                   gt_boxes, gt_labels, gt_valid):
    """Weighted three-tower VoteHead loss (imvotenet.py:487-518)."""
    total = 0.0
    logs = {}
    names = ('joint', 'pts', 'img')
    for preds, w, name in zip(towers, cfg.loss_weights, names):
        # vote targets live on the SAMPLED seeds, not the raw cloud
        targets = jax.vmap(
            lambda p, pv, ax, av, gb, gl, gv: vh.build_targets(
                cfg.head, p, pv, ax, av, gb, gl, gv))(
            preds['seed_xyz'], preds['seed_valid'], preds['agg_xyz'],
            preds['agg_valid'], gt_boxes, gt_labels, gt_valid)
        tot, tower_logs = vh.loss(cfg.head, preds, targets)
        total = total + w * tot
        if name == 'joint':
            logs.update({k: v for k, v in tower_logs.items()
                         if k != 'loss'})
        logs[f'loss_{name}'] = tot
    logs['loss'] = total
    return total, logs


def decode_imvotenet(cfg: ImVoteNetConfig, joint_preds):
    return vh.decode(cfg.head, joint_preds)
