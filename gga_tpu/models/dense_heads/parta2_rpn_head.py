"""PartA2 RPN head: Anchor3DHead + class-agnostic proposal generation.

The head/loss are Anchor3DHead's (the reference subclass only changes
inference — /root/reference/mmdet3d/models/dense_heads/parta2_rpn_head.py:13):
proposals keep their per-class score and label, scores are maxed over
classes, and NMS is class-agnostic with a large budget (train_cfg
rpn_proposal: nms_pre 9000, nms_post/max_num 512, nms_thr 0.8).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core.nms import nms_bev
from ...core.geometry import limit_period
from ...core.coders import delta_decode
from .anchor3d_head import Anchor3DConfig, Anchor3DHead, make_anchors  # noqa: F401 (re-exported)
from .anchor3d_head import assign_targets, loss  # noqa: F401


def rpn_proposals(cfg: Anchor3DConfig, preds, anchors, nms_pre=1024,
                  nms_thr=0.8, num_proposals=512, score_thr=0.0):
    """Decode RPN maps into a static proposal set per sample.

    Returns dict: boxes [B, R, 7], scores [B, R] (sigmoid cls of the
    argmax class), labels [B, R], valid [B, R].
    """
    B = preds['cls'].shape[0]
    C = cfg.num_classes
    R = len(cfg.rotations)
    H, W = preds['cls'].shape[1:3]

    def flat(m, ch):
        m = m.reshape(B, H * W, C, R, ch)
        return m.transpose(0, 2, 1, 3, 4).reshape(B, C, H * W * R, ch)

    cls = jax.nn.sigmoid(flat(preds['cls'], C))      # [B, C, A, C]
    reg = flat(preds['reg'], 7)
    dirp = flat(preds['dir'], 2)

    # per-class anchors are distinct sets: flatten (class, anchor) jointly
    scores_all, boxes_all, labels_all = [], [], []
    for ci in range(C):
        score = cls[:, ci, :, ci]
        boxes = delta_decode(reg[:, ci], anchors[ci][None])
        dir_score = jnp.argmax(dirp[:, ci], -1)
        rot = limit_period(boxes[..., 6] - cfg.dir_offset, 1.0, np.pi)
        boxes = boxes.at[..., 6].set(
            rot + cfg.dir_offset + np.pi * dir_score)
        scores_all.append(score)
        boxes_all.append(boxes)
        labels_all.append(jnp.full(score.shape, ci, jnp.int32))
    scores = jnp.concatenate(scores_all, 1)
    boxes = jnp.concatenate(boxes_all, 1)
    labels = jnp.concatenate(labels_all, 1)

    k = min(nms_pre, scores.shape[-1])
    top_s, top_i = jax.lax.top_k(scores, k)
    top_b = jnp.take_along_axis(boxes, top_i[..., None], 1)
    top_l = jnp.take_along_axis(labels, top_i, 1)

    def one(b, s, l):
        bev = b[:, [0, 1, 3, 4, 6]]
        idx, _ = nms_bev(bev, s, nms_thr, post_max_size=num_proposals,
                         valid=s > score_thr)
        safe = jnp.maximum(idx, 0)
        return (b[safe], jnp.where(idx >= 0, s[safe], 0.0), l[safe],
                idx >= 0)

    pb, ps, plab, pv = jax.vmap(one)(top_b, top_s, top_l)
    return dict(boxes=pb, scores=ps, labels=plab, valid=pv)
