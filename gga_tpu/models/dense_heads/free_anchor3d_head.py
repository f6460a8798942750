"""FreeAnchor3DHead: learning-to-match loss on the anchor head.

Rebuild of FreeAnchor3DHead
(/root/reference/mmdet3d/models/dense_heads/free_anchor3d_head.py:13):
the network is exactly Anchor3DHead; only the LOSS changes — each GT
owns a "bag" of its top-k anchors by nearest-BEV IoU, the positive loss
is a mean-max soft-BCE over bag members' cls*box likelihoods (box
likelihood = exp(-smooth-L1 - dir CE)), and the negative loss is a
focal BCE on cls_prob * (1 - P[anchor explains some object]) where the
anchor->object probability is a saturated-linear function of decoded-box
IoU. Per-sample python loops become a vmapped [G, A] formulation with
GT validity masks.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ...core.coders import delta_decode, delta_encode
from ...core.geometry import limit_period
from .anchor3d_head import Anchor3DConfig, _bev_iou, _nearest_bev


@dataclasses.dataclass(frozen=True)
class FreeAnchor3DConfig(Anchor3DConfig):
    pre_anchor_topk: int = 50
    bbox_thr: float = 0.6
    gamma: float = 2.0
    alpha: float = 0.5


def _flatten_preds(cfg, preds):
    """NHWC maps -> per-anchor rows matching make_anchors' class-major
    [C, H*W*R] layout, flattened to [B, C*H*W*R, ch]."""
    B = preds['cls'].shape[0]
    C = cfg.num_classes
    R = len(cfg.rotations)
    H, W = preds['cls'].shape[1:3]

    def flat(m, ch):
        m = m.reshape(B, H * W, C, R, ch)
        return m.transpose(0, 2, 1, 3, 4).reshape(B, C * H * W * R, ch)

    return flat(preds['cls'], C), flat(preds['reg'], 7), \
        flat(preds['dir'], 2)


def free_anchor_loss(cfg: FreeAnchor3DConfig, preds, anchors, gt_boxes,
                     gt_labels, gt_valid):
    """Batched loss (free_anchor3d_head.py:45-246).

    Args:
        anchors: [C, A, 7] from make_anchors.
        gt_boxes [B, G, 7]; gt_labels [B, G]; gt_valid [B, G].
    """
    cls_map, reg_map, dir_map = _flatten_preds(cfg, preds)
    anc = anchors.reshape(-1, 7)                       # [Atot, 7]
    anc_bev = _nearest_bev(anc)

    def one(cls_s, reg_s, dir_s, gb, gl, gv):
        cls_prob = jax.nn.sigmoid(cls_s)               # [A, C]
        # --- anchor -> object probability (no grad)
        pred_boxes = jax.lax.stop_gradient(delta_decode(reg_s, anc))
        iou = _bev_iou(_nearest_bev(gb), _nearest_bev(pred_boxes))
        iou = jnp.where(gv[:, None], iou, -1.0)        # [G, A]
        t1 = cfg.bbox_thr
        t2 = jnp.clip(iou.max(1, keepdims=True), t1 + 1e-6, None)
        obj_box_prob = jnp.clip((iou - t1) / (t2 - t1), 0.0, 1.0)
        # image_box_prob[a, c] = max over gts of class c
        cls_onehot = jax.nn.one_hot(gl, cfg.num_classes) \
            * gv[:, None]                              # [G, C]
        image_box_prob = (obj_box_prob[:, :, None]
                          * cls_onehot[:, None, :]).max(0)  # [A, C]
        image_box_prob = jax.lax.stop_gradient(image_box_prob)

        # --- bags: topk anchors per GT by anchor IoU
        iou_anc = _bev_iou(_nearest_bev(gb), anc_bev)  # [G, A]
        _, matched = jax.lax.top_k(iou_anc, cfg.pre_anchor_topk)

        m_cls = jnp.take_along_axis(
            cls_prob[matched],                         # [G, k, C]
            jnp.clip(gl, 0, cfg.num_classes - 1)[:, None, None]
            .repeat(cfg.pre_anchor_topk, 1), -1)[..., 0]
        m_anc = anc[matched]                           # [G, k, 7]
        m_targets = delta_encode(
            jnp.broadcast_to(gb[:, None, :], m_anc.shape), m_anc)
        m_reg = reg_s[matched]

        # direction CE
        rot = limit_period(
            jnp.broadcast_to(gb[:, None, 6], m_anc.shape[:2])
            - cfg.dir_offset, 0, 2 * np.pi)
        dir_t = jnp.clip((rot / np.pi).astype(jnp.int32), 0, 1)
        dir_ce = -jnp.take_along_axis(
            jax.nn.log_softmax(dir_s[matched], -1),
            dir_t[..., None], -1)[..., 0]

        # sin-difference smooth L1, summed over code dims
        rs = jnp.sin(m_reg[..., 6]) * jnp.cos(m_targets[..., 6])
        rt = jnp.cos(m_reg[..., 6]) * jnp.sin(m_targets[..., 6])
        diff = jnp.concatenate(
            [m_reg[..., :6] - m_targets[..., :6], (rs - rt)[..., None]],
            -1)
        beta = 1.0 / 9.0
        sl1 = jnp.where(jnp.abs(diff) < beta, 0.5 * diff ** 2 / beta,
                        jnp.abs(diff) - 0.5 * beta)
        loss_bbox = sl1.sum(-1) * cfg.loss_bbox_weight + dir_ce
        m_box_prob = jnp.exp(-loss_bbox)               # [G, k]

        # positive bag loss: mean-max
        m_prob = m_cls * m_box_prob
        w = 1.0 / jnp.clip(1.0 - m_prob, 1e-12, None)
        w = w / w.sum(1, keepdims=True)
        bag_prob = jnp.clip((w * m_prob).sum(1), 0.0, 1.0)
        pos_loss = -cfg.alpha * jnp.log(jnp.clip(bag_prob, 1e-12, 1.0))
        pos_loss = jnp.where(gv, pos_loss, 0.0).sum()

        # negative bag loss (focal BCE toward 0)
        prob = jnp.clip(cls_prob * (1 - image_box_prob), 0.0, 1.0)
        neg_loss = (prob ** cfg.gamma
                    * -jnp.log(jnp.clip(1 - prob, 1e-12, 1.0))).sum()
        return pos_loss, neg_loss, gv.sum()

    pos, neg, npos = jax.vmap(one)(cls_map, reg_map, dir_map, gt_boxes,
                                   gt_labels, gt_valid)
    num_pos = jnp.maximum(npos.sum(), 1)
    positive_bag_loss = pos.sum() / num_pos
    negative_bag_loss = (1 - cfg.alpha) * neg.sum() / jnp.maximum(
        num_pos * cfg.pre_anchor_topk, 1)
    total = positive_bag_loss + negative_bag_loss
    return total, dict(positive_bag_loss=positive_bag_loss,
                       negative_bag_loss=negative_bag_loss, loss=total)
