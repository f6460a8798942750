"""GroupFree3D head: KPS candidate sampling + transformer decoding.

Rebuild of GroupFree3DHead
(/root/reference/mmdet3d/models/dense_heads/groupfree3d_head.py:110) and
GroupFree3DBBoxCoder (core/bbox/coders/groupfree3d_bbox_coder.py:10):
per-seed objectness picks the top ``num_proposal`` candidates (KPS), an
initial head predicts proposal boxes, then ``num_decoder_layers``
DETR-style layers (self-attn with positional encodings from the CURRENT
boxes, cross-attn over all seeds) refine them; losses apply at every
stage (averaged) plus a focal sampling-objectness loss on the seeds
whose targets are each GT's k=4 nearest (dims-normalized) assigned
seeds.

TPU deltas: per-sample loops/padding become masked [S]/[G, S] batched
math; instance labels are computed directly on seed coordinates
(points_in_rbbox, first-containing-box) instead of gathering per-point
labels through seed indices — identical semantics since seeds ARE
backbone points.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core import geometry as geo
from ...core.nms import aligned_3d_nms
from ..backbones.pointnet2 import SharedMLP
from ..layers import conv_init
from ..losses import smooth_l1_loss
from ..model_utils import GroupFree3DDecoderLayer, PositionalMLP
from .vote_head import SUNRGBD_MEAN_SIZES

EPS = 1e-6


@dataclasses.dataclass(frozen=True)
class GroupFree3DConfig:
    num_classes: int = 18
    in_channels: int = 288
    num_proposal: int = 256
    num_decoder_layers: int = 6
    num_heads: int = 8
    ffn_dim: int = 2048
    dropout: float = 0.1
    num_dir_bins: int = 1
    with_rot: bool = False
    size_cls_agnostic: bool = False
    mean_sizes: Tuple[Tuple[float, float, float], ...] = \
        SUNRGBD_MEAN_SIZES
    seed_points_obj_topk: int = 4
    # loss weights (configs/_base_/models/groupfree3d.py:40-63)
    sampling_obj_weight: float = 8.0
    obj_weight: float = 1.0
    center_weight: float = 10.0
    dir_class_weight: float = 1.0
    dir_res_weight: float = 10.0
    size_class_weight: float = 1.0
    size_res_weight: float = 10.0 / 3.0
    size_reg_weight: float = 10.0 / 3.0
    semantic_weight: float = 1.0
    # test cfg
    nms_thr: float = 0.25
    score_thr: float = 0.0
    max_out: int = 128

    @property
    def num_sizes(self):
        return len(self.mean_sizes)


class GroupFree3DHead(nn.Module):
    cfg: GroupFree3DConfig

    @nn.compact
    def __call__(self, feat_dict, train: bool = True):
        """feat_dict: fp_xyz [B, N, 3], fp_features [B, N, C],
        fp_valid [B, N]. Returns dict with per-stage predictions."""
        c = self.cfg
        seeds = feat_dict['fp_xyz']
        feats = feat_dict['fp_features']
        valid = feat_dict['fp_valid']

        # KPS: per-seed objectness, topk candidates
        h = SharedMLP((c.in_channels, c.in_channels),
                      name='points_obj_cls')(feats, valid, train)
        obj_logits = nn.Dense(1, kernel_init=conv_init,
                              name='points_obj_out')(h)[..., 0]
        score = jnp.where(valid, jax.nn.sigmoid(obj_logits), -1.0)
        _, cand_idx = jax.lax.top_k(score, c.num_proposal)   # [B, M]
        cand_xyz = jnp.take_along_axis(seeds, cand_idx[..., None], 1)
        cand_feat = jnp.take_along_axis(feats, cand_idx[..., None], 1)
        cand_valid = jnp.take_along_axis(valid, cand_idx, 1)

        def pred_head(x, v, name):
            y = SharedMLP((c.in_channels, c.in_channels),
                          name=f'{name}_shared')(x, v, train)
            n_cls = 1 + c.num_classes
            n_reg = 3 + 2 * c.num_dir_bins + (
                3 if c.size_cls_agnostic
                else c.num_sizes + 3 * c.num_sizes)
            cls = nn.Dense(n_cls, kernel_init=conv_init,
                           name=f'{name}_cls')(y)
            reg = nn.Dense(n_reg, kernel_init=conv_init,
                           name=f'{name}_reg')(y)
            return self._split(cls, reg, cand_xyz)

        stages = [pred_head(cand_feat, cand_valid, 'proposal')]

        query = nn.Dense(c.in_channels, name='decoder_query_proj')(
            cand_feat)
        key = nn.Dense(c.in_channels, name='decoder_key_proj')(feats)
        base_box6 = jax.lax.stop_gradient(
            self._decode_box6(stages[-1]))
        for i in range(c.num_decoder_layers):
            qpos = PositionalMLP(c.in_channels,
                                 name=f'self_pos{i}')(base_box6, train)
            kpos = PositionalMLP(c.in_channels,
                                 name=f'cross_pos{i}')(seeds, train)
            query = GroupFree3DDecoderLayer(
                c.in_channels, c.num_heads, c.ffn_dim, c.dropout,
                name=f'decoder{i}')(query, qpos, key, kpos, valid,
                                    train)
            stages.append(pred_head(query, cand_valid, f's{i}'))
            base_box6 = jax.lax.stop_gradient(
                self._decode_box6(stages[-1]))

        return dict(seed_xyz=seeds, seed_valid=valid,
                    seeds_obj_cls_logits=obj_logits,
                    cand_idx=cand_idx, cand_xyz=cand_xyz,
                    cand_valid=cand_valid, stages=stages)

    def _split(self, cls, reg, base_xyz):
        """GroupFree3DBBoxCoder.split_pred (groupfree3d_bbox_coder:123)."""
        c = self.cfg
        out = dict(obj=cls[..., 0], sem=cls[..., 1:])
        i = 0
        out['center'] = base_xyz + reg[..., i:i + 3]
        i += 3
        out['dir_class'] = reg[..., i:i + c.num_dir_bins]
        i += c.num_dir_bins
        out['dir_res_norm'] = reg[..., i:i + c.num_dir_bins]
        i += c.num_dir_bins
        if c.size_cls_agnostic:
            out['size'] = reg[..., i:i + 3]
        else:
            out['size_class'] = reg[..., i:i + c.num_sizes]
            i += c.num_sizes
            out['size_res_norm'] = reg[..., i:].reshape(
                reg.shape[:-1] + (c.num_sizes, 3))
        return out

    def _decode_box6(self, stage):
        dims = decode_dims(self.cfg, stage)
        return jnp.concatenate([stage['center'], dims], -1)


def decode_dims(cfg: GroupFree3DConfig, stage):
    mean = jnp.asarray(cfg.mean_sizes, jnp.float32)
    if cfg.size_cls_agnostic:
        return stage['size']
    scls = jnp.argmax(stage['size_class'], -1)
    res = jnp.take_along_axis(
        stage['size_res_norm'],
        scls[..., None, None].repeat(3, -1), -2)[..., 0, :]
    return mean[scls] + res * mean[scls]


def decode_yaw(cfg: GroupFree3DConfig, stage):
    if not cfg.with_rot:
        return jnp.zeros(stage['center'].shape[:-1])
    dcls = jnp.argmax(stage['dir_class'], -1)
    res = jnp.take_along_axis(stage['dir_res_norm'],
                              dcls[..., None], -1)[..., 0] \
        * (np.pi / cfg.num_dir_bins)
    ang = dcls.astype(jnp.float32) * (2 * np.pi / cfg.num_dir_bins) + res
    return jnp.where(ang > np.pi, ang - 2 * np.pi, ang)


def groupfree3d_targets_single(cfg: GroupFree3DConfig, gt_boxes,
                               gt_labels, gt_valid, seeds, seed_valid,
                               cand_idx):
    """get_targets_single (groupfree3d_head.py:646), static shapes.
    gt_boxes [G, 7] depth bottom-center."""
    G = gt_boxes.shape[0]
    grav = gt_boxes[:, :3].at[:, 2].add(gt_boxes[:, 5] / 2)
    # encode (coder :36)
    size_res = gt_boxes[:, 3:6] - jnp.asarray(
        cfg.mean_sizes, jnp.float32)[jnp.clip(gt_labels, 0,
                                              cfg.num_sizes - 1)]
    if cfg.with_rot:
        bin_w = 2 * np.pi / cfg.num_dir_bins
        yaw = gt_boxes[:, 6] % (2 * np.pi)
        shifted = (yaw + bin_w / 2) % (2 * np.pi)
        dir_cls_t = jnp.clip((shifted // bin_w).astype(jnp.int32), 0,
                             cfg.num_dir_bins - 1)
        dir_res_t = shifted - (dir_cls_t * bin_w + bin_w / 2)
    else:
        dir_cls_t = jnp.zeros(G, jnp.int32)
        dir_res_t = jnp.zeros(G)

    # seed instance labels (first containing valid box)
    inbox = geo.points_in_rbbox(seeds, gt_boxes) & gt_valid[None, :]
    seed_obj = inbox.any(1) & seed_valid
    seed_inst = jnp.where(seed_obj, jnp.argmax(inbox, 1), G - 1)

    # sampling targets: each valid gt's topk nearest assigned seeds
    delta = (seeds[:, None, :] - grav[None, :, :]) \
        / (gt_boxes[None, :, 3:6] + EPS)
    d = jnp.sqrt((delta ** 2).sum(-1) + EPS)                 # [S, G]
    assigned = inbox & (seed_inst[:, None] == jnp.arange(G)[None, :])
    d = jnp.where(assigned, d, 100.0).T                      # [G, S]
    _, topk = jax.lax.top_k(-d, cfg.seed_points_obj_topk)    # [G, k]
    samp = jnp.zeros(seeds.shape[0], jnp.int32)
    samp = samp.at[topk.reshape(-1)].max(
        jnp.repeat(gt_valid.astype(jnp.int32),
                   cfg.seed_points_obj_topk), mode='drop')
    samp = (samp > 0) & seed_obj

    # candidate targets
    cand_obj = jnp.take_along_axis(seed_obj, cand_idx, 0)
    cand_inst = jnp.take_along_axis(seed_inst, cand_idx, 0)
    assign = jnp.clip(cand_inst, 0, G - 1)
    mean = jnp.asarray(cfg.mean_sizes, jnp.float32)
    cls_of = jnp.clip(gt_labels[assign], 0, cfg.num_sizes - 1)
    return dict(
        sampling_targets=samp,
        objectness_targets=cand_obj,
        center_targets=grav[assign],
        size_targets=gt_boxes[assign, 3:6],
        size_class_targets=cls_of,
        size_res_targets=size_res[assign] / mean[cls_of],
        dir_class_targets=dir_cls_t[assign],
        dir_res_targets=dir_res_t[assign] / (np.pi / cfg.num_dir_bins),
        mask_targets=jnp.clip(gt_labels[assign], 0,
                              cfg.num_classes - 1))


def _focal_binary(logits, target, gamma=2.0, alpha=0.25):
    p = jax.nn.sigmoid(logits)
    t = target.astype(jnp.float32)
    pt = p * t + (1 - p) * (1 - t)
    w = alpha * t + (1 - alpha) * (1 - t)
    ce = -(t * jax.nn.log_sigmoid(logits)
           + (1 - t) * jax.nn.log_sigmoid(-logits))
    return w * (1 - pt) ** gamma * ce


def groupfree3d_loss(cfg: GroupFree3DConfig, preds, gt_boxes, gt_labels,
                     gt_valid):
    """Batched multi-stage loss (groupfree3d_head.py:394)."""
    t = jax.vmap(lambda gb, gl, gv, sd, sv, ci:
                 groupfree3d_targets_single(cfg, gb, gl, gv, sd, sv, ci))(
        gt_boxes, gt_labels, gt_valid, preds['seed_xyz'],
        preds['seed_valid'], preds['cand_idx'])
    B, S = preds['seeds_obj_cls_logits'].shape
    logs = {}

    sw = preds['seed_valid'].astype(jnp.float32)
    sw = sw / jnp.maximum(sw.sum(1, keepdims=True), 1.0)
    samp_loss = (_focal_binary(preds['seeds_obj_cls_logits'],
                               t['sampling_targets']) * sw).sum() / B \
        * cfg.sampling_obj_weight
    logs['sampling_objectness_loss'] = samp_loss
    total = samp_loss

    stages = preds['stages']
    n_stages = len(stages)
    ow = preds['cand_valid'].astype(jnp.float32)
    ow = ow / jnp.maximum(ow.sum(1, keepdims=True), 1.0)
    blw = t['objectness_targets'].astype(jnp.float32)
    blw = blw / (blw.sum() + EPS)
    onehot_dir = jax.nn.one_hot(t['dir_class_targets'],
                                cfg.num_dir_bins)
    for si, st in enumerate(stages):
        pre = 'proposal' if si == 0 else f's{si - 1}'
        l_obj = (_focal_binary(st['obj'], t['objectness_targets'])
                 * ow).sum() / B * cfg.obj_weight
        l_center = (smooth_l1_loss(st['center'], t['center_targets'])
                    * blw[..., None]).sum() * cfg.center_weight
        logp = jax.nn.log_softmax(st['dir_class'], -1)
        l_dcls = (-jnp.take_along_axis(
            logp, t['dir_class_targets'][..., None], -1)[..., 0]
            * blw).sum() * cfg.dir_class_weight
        dres = (st['dir_res_norm'] * onehot_dir).sum(-1)
        l_dres = (smooth_l1_loss(dres, t['dir_res_targets'])
                  * blw).sum() * cfg.dir_res_weight
        if cfg.size_cls_agnostic:
            l_size = (smooth_l1_loss(st['size'], t['size_targets'])
                      * blw[..., None]).sum() * cfg.size_reg_weight
            l_scls = 0.0
        else:
            logp = jax.nn.log_softmax(st['size_class'], -1)
            l_scls = (-jnp.take_along_axis(
                logp, t['size_class_targets'][..., None], -1)[..., 0]
                * blw).sum() * cfg.size_class_weight
            onehot_s = jax.nn.one_hot(t['size_class_targets'],
                                      cfg.num_sizes)[..., None]
            sres = (st['size_res_norm'] * onehot_s).sum(-2)
            l_size = (smooth_l1_loss(sres, t['size_res_targets'])
                      * blw[..., None]).sum() * cfg.size_res_weight
        logp = jax.nn.log_softmax(st['sem'], -1)
        l_sem = (-jnp.take_along_axis(
            logp, t['mask_targets'][..., None], -1)[..., 0]
            * blw).sum() * cfg.semantic_weight
        stage_total = (l_obj + l_center + l_dcls + l_dres + l_scls
                       + l_size + l_sem) / n_stages
        logs[f'{pre}.loss'] = stage_total
        total = total + stage_total
    logs['loss'] = total
    return total, logs


def decode_groupfree3d(cfg: GroupFree3DConfig, preds):
    """Last-stage boxes + class-aware aligned NMS (get_bboxes:865).
    Returns bottom-center depth boxes."""
    st = preds['stages'][-1]
    obj = jax.nn.sigmoid(st['obj'])
    sem = jax.nn.softmax(st['sem'], -1)
    scores = obj[..., None] * sem
    score = scores.max(-1)
    labels = scores.argmax(-1)
    dims = jnp.clip(decode_dims(cfg, st), 0.1, None)
    yaw = decode_yaw(cfg, st)
    center = st['center']
    bottom = center.at[..., 2].add(-dims[..., 2] / 2)
    boxes = jnp.concatenate([bottom, dims, yaw[..., None]], -1)

    def one(b, s, lab, v):
        corners = geo.boxes7_to_corners(b)
        aligned = jnp.concatenate([corners.min(1), corners.max(1)], -1)
        keep = aligned_3d_nms(aligned, s, lab, cfg.nms_thr,
                              valid=v & (s > cfg.score_thr))
        order = jnp.argsort(jnp.where(keep, -s, jnp.inf))[:cfg.max_out]
        kept = keep[order]
        return b[order], jnp.where(kept, s[order], 0.0), lab[order], kept

    b, s, l, v = jax.vmap(one)(boxes, score, labels,
                               preds['cand_valid'])
    return dict(boxes=b, scores=s, labels=l, valid=v)
