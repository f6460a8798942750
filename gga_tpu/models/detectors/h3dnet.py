"""H3DNet: hybrid geometric primitives detector.

Rebuild of /root/reference/mmdet3d/models/detectors/h3dnet.py:10 +
roi_heads/h3d_roi_head.py:14: MultiBackbone (4 PointNet2 towers fused
into hd features) -> VoteNet RPN proposals -> three PrimitiveHeads
(z / xy / line) -> H3DBboxHead matches proposal surface/line centers
against predicted primitives and refines the proposal predictions
through a second VoteHead-layout prediction layer ("optimized" stage).

Loss = RPN VoteHead loss + per-primitive losses + refined-stage
VoteHead loss + matching / semantic-matching CE on proposal objectness
(documented simplification of the reference's primitive-cue targets,
h3d_bbox_head.get_targets:654 — the cue labels there reduce to
proposal-objectness for axis-aligned boxes once primitives exist for
every GT face/edge).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..backbones.multi_backbone import MultiBackbone, MultiBackboneConfig
from ..backbones.pointnet2 import SharedMLP
from ..dense_heads import vote_head as vh
from ..dense_heads.vote_head import VoteHead, VoteHeadConfig
from ..layers import conv_init
from ..roi_heads.h3d_head import (H3DBboxConfig, H3DBboxHead,
                                  PrimitiveConfig, PrimitiveHead,
                                  primitive_loss)


@dataclasses.dataclass(frozen=True)
class H3DNetConfig:
    backbone: MultiBackboneConfig = dataclasses.field(
        default_factory=MultiBackboneConfig)
    rpn: VoteHeadConfig = dataclasses.field(
        default_factory=lambda: VoteHeadConfig(
            num_classes=18, with_rot=False, num_dir_bins=1))
    primitives: Tuple[PrimitiveConfig, ...] = (
        PrimitiveConfig(mode='z'), PrimitiveConfig(mode='xy'),
        PrimitiveConfig(mode='line'))
    bbox: H3DBboxConfig = dataclasses.field(
        default_factory=H3DBboxConfig)
    matching_weight: float = 1.0

    @classmethod
    def tiny(cls):
        rpn = VoteHeadConfig(
            num_classes=4, mean_sizes=((1.0, 1.0, 1.0),) * 4,
            with_rot=False, num_dir_bins=1,
            in_channels=16, vote_conv_channels=(16,),
            agg_num_point=16, agg_mlp=(16, 16),
            pred_conv_channels=(16,), max_objs=8, max_out=8,
            pos_distance_thr=0.8, neg_distance_thr=1.2)
        prim = lambda m: PrimitiveConfig(
            mode=m, num_classes=4, in_channels=16,
            vote_conv_channels=(16,), num_proposal=16,
            agg_mlp=(16, 16), feat_channels=(16,))
        return cls(
            backbone=MultiBackboneConfig(
                num_streams=2, num_points=(128, 64, 32, 16),
                sa_channels=((8, 8),) * 4, fp_channels=((16,), (16,)),
                agg_channels=16),
            rpn=rpn,
            primitives=(prim('z'), prim('xy'), prim('line')),
            bbox=H3DBboxConfig(num_classes=4, match_mlp=(16,),
                               agg_channels=(16,)))


class H3DNet(nn.Module):
    cfg: H3DNetConfig

    @nn.compact
    def __call__(self, points, points_valid, train: bool = True):
        c = self.cfg
        feat = MultiBackbone(c.backbone, name='backbone')(
            points, points_valid, train)
        rpn_preds = VoteHead(c.rpn, name='rpn_head')(feat, train)

        prim_outs = {}
        for pc in c.primitives:
            prim_outs[pc.mode] = PrimitiveHead(
                pc, name=f'primitive_{pc.mode}')(
                feat['fp_xyz'], feat['hd_feature'], feat['fp_valid'],
                train)

        # proposals from the RPN decode (no NMS at refinement time —
        # the reference refines ALL aggregated proposals)
        proposals = jax.lax.stop_gradient(self._rpn_boxes(rpn_preds))

        surface = dict(
            center=jnp.concatenate(
                [prim_outs['z']['matched_center'],
                 prim_outs['xy']['matched_center']], 1),
            feats=jnp.concatenate(
                [prim_outs['z']['agg_feats'],
                 prim_outs['xy']['agg_feats']], 1),
            valid=jnp.concatenate(
                [prim_outs['z']['agg_valid'],
                 prim_outs['xy']['agg_valid']], 1))
        line = dict(center=prim_outs['line']['matched_center'],
                    feats=prim_outs['line']['agg_feats'],
                    valid=prim_outs['line']['agg_valid'])

        prop_feats = rpn_preds['agg_feats']
        refine = H3DBboxHead(c.bbox, name='bbox_head')(
            proposals, prop_feats, rpn_preds['agg_valid'], surface,
            line, train)

        # refined prediction in the VoteHead output layout
        h = c.rpn
        out_ch = (2 + 3 + 2 * h.num_dir_bins + 4 * h.num_sizes
                  + h.num_classes)
        y = SharedMLP(tuple(h.pred_conv_channels), name='refine_shared')(
            refine['refined_feats'], rpn_preds['agg_valid'], train)
        pred = nn.Dense(out_ch, kernel_init=conv_init,
                        name='refine_out')(y)
        refined = dict(rpn_preds)
        # the refined stage reuses the RPN vote tensors only for the
        # loss-dict shape; its vote loss must not double the RPN vote
        # gradient (the reference's refined loss has no vote term)
        refined['vote_offset'] = jax.lax.stop_gradient(
            rpn_preds['vote_offset'])
        i = 0
        refined['obj'] = pred[..., i:i + 2]; i += 2
        refined['center'] = rpn_preds['agg_xyz'] + pred[..., i:i + 3]
        i += 3
        refined['dir_cls'] = pred[..., i:i + h.num_dir_bins]
        i += h.num_dir_bins
        refined['dir_res_norm'] = pred[..., i:i + h.num_dir_bins]
        i += h.num_dir_bins
        refined['size_cls'] = pred[..., i:i + h.num_sizes]
        i += h.num_sizes
        refined['size_res_norm'] = pred[
            ..., i:i + 3 * h.num_sizes].reshape(
            pred.shape[:-1] + (h.num_sizes, 3))
        i += 3 * h.num_sizes
        refined['sem'] = pred[..., i:]

        return dict(rpn=rpn_preds, primitives=prim_outs,
                    refined=refined, matching=refine,
                    fp_xyz=feat['fp_xyz'], fp_valid=feat['fp_valid'])

    def _rpn_boxes(self, preds):
        c = self.cfg.rpn
        dims = vh_decode_dims(c, preds)
        center = preds['center']
        bottom = center.at[..., 2].add(-dims[..., 2] / 2)
        yaw = jnp.zeros(center.shape[:-1])
        return jnp.concatenate([bottom, dims, yaw[..., None]], -1)


def vh_decode_dims(cfg, preds):
    mean = jnp.asarray(cfg.mean_sizes, jnp.float32)
    scls = jnp.argmax(preds['size_cls'], -1)
    res = jnp.take_along_axis(
        preds['size_res_norm'],
        scls[..., None, None].repeat(3, -1), -2)[..., 0, :] \
        * mean[scls]
    return jnp.clip(mean[scls] + res, 0.1, None)


def h3dnet_loss(cfg: H3DNetConfig, out, gt_boxes, gt_labels, gt_valid):
    logs = {}
    total = 0.0
    for stage, preds in (('rpn', out['rpn']),
                         ('refined', out['refined'])):
        targets = jax.vmap(
            lambda p, pv, ax, av, gb, gl, gv: vh.build_targets(
                cfg.rpn, p, pv, ax, av, gb, gl, gv))(
            preds['seed_xyz'], preds['seed_valid'], preds['agg_xyz'],
            preds['agg_valid'], gt_boxes, gt_labels, gt_valid)
        tot, stage_logs = vh.loss(cfg.rpn, preds, targets)
        total = total + tot
        logs[f'loss_{stage}'] = tot
        if stage == 'refined':
            logs.update({f'refined.{k}': v
                         for k, v in stage_logs.items() if k != 'loss'})

    for pc in cfg.primitives:
        ptot, plogs = primitive_loss(
            pc, out['primitives'][pc.mode], out['fp_xyz'],
            out['fp_valid'], gt_boxes, gt_labels, gt_valid)
        total = total + ptot
        logs.update(plogs)

    # matching losses: CE toward proposal objectness (simplified cues)
    t = jax.vmap(
        lambda p, pv, ax, av, gb, gl, gv: vh.build_targets(
            cfg.rpn, p, pv, ax, av, gb, gl, gv))(
        out['rpn']['seed_xyz'], out['rpn']['seed_valid'],
        out['rpn']['agg_xyz'], out['rpn']['agg_valid'],
        gt_boxes, gt_labels, gt_valid)
    obj_t = t['objectness_t']
    if True:
        for key in ('matching_score', 'semantic_matching_score'):
            sc = out['matching'][key]
            # 18 matching channels average into one objectness logit
            logit = sc.mean(-1)
            tgt = obj_t.astype(jnp.float32)
            bce = (jnp.maximum(logit, 0) - logit * tgt
                   + jnp.log1p(jnp.exp(-jnp.abs(logit))))
            m = out['rpn']['agg_valid'].astype(jnp.float32)
            l = (bce * m).sum() / jnp.maximum(m.sum(), 1.0) \
                * cfg.matching_weight
            logs[f'loss_{key}'] = l
            total = total + l
    logs['loss'] = total
    return total, logs


def decode_h3dnet(cfg: H3DNetConfig, out):
    """Decode the refined ("optimized") stage with the VoteHead
    decoder."""
    return vh.decode(cfg.rpn, out['refined'])
