"""Mask R-CNN (2D instance segmentation) — the nuImages family.

Behavioral mirror of the reference's nuImages models
(/root/reference/configs/nuimages/mask_rcnn_r50_fpn_1x_nuim.py over
mmdet's MaskRCNN: ResNet50 + FPN(5) + RPNHead + StandardRoIHead with
Shared2FCBBoxHead and FCNMaskHead), rebuilt TPU-first:

- every stage static-shape: per-level top-k proposal pre-selection,
  greedy mask NMS, rank-keyed RoI sampling (no boolean indexing);
- RoIAlign is four row-gathers + bilinear blend on [H*W, C]
  (ops/roi_align.py), routed across FPN levels by one-hot selection;
- the RandomSampler's pos/neg quota becomes a priority-key argsort,
  the same idiom as the 3D RoI heads (roi_heads/part_aggregation.py).

Documented TPU deltas: proposal budget 512 (ref 1000) and RoIAlign
sampling grid fixed at 2x2 per bin (ref sampling_ratio=0 = adaptive) —
both static-shape requirements.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.nms import iou_2d, nms_2d
from ...ops.roi_align import multilevel_roi_align
from ..backbones.resnet import ResNet
from ..layers import conv_init
from ..necks.fpn import FPN


@dataclasses.dataclass(frozen=True)
class MaskRCNNConfig:
    """Defaults mirror configs/_base_/models/mask_rcnn_r50_fpn.py."""
    num_classes: int = 10                     # nuImages (nuim README)
    backbone_depth: int = 50
    fpn_channels: int = 256
    strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    anchor_scale: float = 8.0
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    # RPN (train_cfg.rpn / rpn_proposal; nms_pre per level, static)
    rpn_pre_nms: int = 512
    rpn_post_nms: int = 512                   # ref 1000; static budget
    rpn_nms_thr: float = 0.7
    rpn_pos_iou: float = 0.7
    rpn_neg_iou: float = 0.3
    rpn_min_pos_iou: float = 0.3   # match_low_quality gate (mmdet)
    rpn_num_samples: int = 256
    rpn_pos_fraction: float = 0.5
    # RCNN (train_cfg.rcnn)
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.5
    num_samples: int = 256                    # ref 512; static budget
    pos_fraction: float = 0.25
    target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    roi_size: int = 7
    mask_roi_size: int = 14
    mask_size: int = 28
    fc_channels: int = 1024
    mask_convs: int = 4
    # test_cfg.rcnn
    score_thr: float = 0.05
    test_nms_thr: float = 0.5
    max_per_img: int = 100

    @classmethod
    def tiny(cls):
        """Test-scale variant (64x96 images)."""
        return cls(backbone_depth=18, fpn_channels=32, fc_channels=64,
                   rpn_pre_nms=64, rpn_post_nms=64, rpn_num_samples=32,
                   num_samples=32, max_per_img=8, mask_convs=1)


# ------------------------------------------------------------- boxes


def delta2d_encode(gt, anchors, stds=(1., 1., 1., 1.)):
    """mmdet DeltaXYWHBBoxCoder.encode: corner boxes -> (dx, dy, dw, dh)."""
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = (anchors[..., 0] + anchors[..., 2]) * 0.5
    ay = (anchors[..., 1] + anchors[..., 3]) * 0.5
    gw = jnp.maximum(gt[..., 2] - gt[..., 0], 1e-4)
    gh = jnp.maximum(gt[..., 3] - gt[..., 1], 1e-4)
    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    d = jnp.stack([(gx - ax) / jnp.maximum(aw, 1e-4),
                   (gy - ay) / jnp.maximum(ah, 1e-4),
                   jnp.log(gw / jnp.maximum(aw, 1e-4)),
                   jnp.log(gh / jnp.maximum(ah, 1e-4))], -1)
    return d / jnp.asarray(stds, d.dtype)


def delta2d_decode(deltas, anchors, stds=(1., 1., 1., 1.),
                   max_shape=None):
    """mmdet DeltaXYWHBBoxCoder.decode (wh clamp 16/1000 reproduced)."""
    d = deltas * jnp.asarray(stds, deltas.dtype)
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = (anchors[..., 0] + anchors[..., 2]) * 0.5
    ay = (anchors[..., 1] + anchors[..., 3]) * 0.5
    cx = ax + d[..., 0] * aw
    cy = ay + d[..., 1] * ah
    w = aw * jnp.exp(jnp.clip(d[..., 2], -np.log(1000. / 16), np.log(1000. / 16)))
    h = ah * jnp.exp(jnp.clip(d[..., 3], -np.log(1000. / 16), np.log(1000. / 16)))
    boxes = jnp.stack([cx - w * 0.5, cy - h * 0.5,
                       cx + w * 0.5, cy + h * 0.5], -1)
    if max_shape is not None:
        hh, ww = max_shape
        boxes = jnp.stack([jnp.clip(boxes[..., 0], 0, ww),
                           jnp.clip(boxes[..., 1], 0, hh),
                           jnp.clip(boxes[..., 2], 0, ww),
                           jnp.clip(boxes[..., 3], 0, hh)], -1)
    return boxes


def make_anchors(cfg: MaskRCNNConfig, feat_shapes):
    """Per-level [H*W*A, 4] corner anchors (mmdet AnchorGenerator:
    scale 8, ratios (0.5, 1, 2), base size = stride). Trace-time numpy."""
    out = []
    for (h, w), stride in zip(feat_shapes, cfg.strides):
        base = cfg.anchor_scale * stride
        ws = np.array([base * np.sqrt(1.0 / r) for r in cfg.anchor_ratios])
        hs = np.array([base * np.sqrt(r) for r in cfg.anchor_ratios])
        cx = (np.arange(w) + 0.5) * stride
        cy = (np.arange(h) + 0.5) * stride
        cxg, cyg = np.meshgrid(cx, cy)
        # mmdet centers anchors at (x * stride, y * stride) without the
        # half-cell shift by default (center_offset=0); the half-cell
        # variant is used here for symmetry — a constant translation
        # absorbed by the deltas
        a = np.stack([cxg[..., None] - ws / 2, cyg[..., None] - hs / 2,
                      cxg[..., None] + ws / 2, cyg[..., None] + hs / 2],
                     -1)
        out.append(jnp.asarray(a.reshape(-1, 4), jnp.float32))
    return out


# --------------------------------------------------------------- RPN


class RPNHead(nn.Module):
    """3x3 conv + sigmoid objectness + per-anchor deltas, params shared
    across levels (mmdet RPNHead)."""
    channels: int
    num_anchors: int

    @nn.compact
    def __call__(self, feats):
        conv = nn.Conv(self.channels, (3, 3), padding='SAME',
                       kernel_init=conv_init, name='rpn_conv')
        cls = nn.Conv(self.num_anchors, (1, 1), kernel_init=conv_init,
                      name='rpn_cls')
        reg = nn.Conv(self.num_anchors * 4, (1, 1), kernel_init=conv_init,
                      name='rpn_reg')
        outs = []
        for f in feats:
            x = nn.relu(conv(f))
            outs.append((cls(x), reg(x)))
        return outs


def make_proposals(cfg: MaskRCNNConfig, anchors, rpn_outs, img_shape):
    """Per-sample proposal generation: per-level top-k -> decode ->
    joint NMS -> static rpn_post_nms budget. Batched inputs.

    Returns (proposals [B, P, 4], scores [B, P], valid [B, P])."""
    lvl_boxes, lvl_scores = [], []
    for (clsmap, regmap), anc in zip(rpn_outs, anchors):
        B = clsmap.shape[0]
        sc = clsmap.reshape(B, -1)                      # [B, H*W*A]
        rg = regmap.reshape(B, -1, 4)
        k = min(cfg.rpn_pre_nms, sc.shape[1])
        top, idx = jax.lax.top_k(sc, k)
        boxes = delta2d_decode(
            jnp.take_along_axis(rg, idx[..., None], 1),
            anc[idx], max_shape=img_shape)
        lvl_boxes.append(boxes)
        lvl_scores.append(top)
    boxes = jnp.concatenate(lvl_boxes, 1)
    scores = jnp.concatenate(lvl_scores, 1)

    def one(b, s):
        # drop degenerate boxes (min_bbox_size=0: strictly positive wh)
        ok = ((b[:, 2] > b[:, 0]) & (b[:, 3] > b[:, 1]))
        idx, _ = nms_2d(b, s, cfg.rpn_nms_thr,
                        post_max_size=cfg.rpn_post_nms, valid=ok)
        safe = jnp.maximum(idx, 0)
        return b[safe], jnp.where(idx >= 0, s[safe], -jnp.inf), idx >= 0

    return jax.vmap(one)(boxes, scores)


def rpn_loss(cfg: MaskRCNNConfig, anchors, rpn_outs, gt_boxes, gt_valid,
             rng, img_shape):
    """Sampled sigmoid-BCE + L1 on anchor deltas (train_cfg.rpn)."""
    cls = jnp.concatenate(
        [c.reshape(c.shape[0], -1) for c, _ in rpn_outs], 1)
    reg = jnp.concatenate(
        [r.reshape(r.shape[0], -1, 4) for _, r in rpn_outs], 1)
    anc = jnp.concatenate(anchors, 0)                   # [A, 4]
    hh, ww = img_shape

    def one(logits, deltas, gtb, gtv, key):
        iou = iou_2d(anc, gtb)                          # [A, G]
        iou = jnp.where(gtv[None, :], iou, -1.0)
        max_iou = iou.max(-1)
        # empty image: treat every anchor as background (mmdet does),
        # otherwise the -1 sentinel empties neg and the loss silently
        # vanishes for this sample
        max_iou = jnp.where(gtv.any(), max_iou, 0.0)
        arg = iou.argmax(-1)
        pos = max_iou >= cfg.rpn_pos_iou
        # match_low_quality: each GT's best anchor becomes positive,
        # gated by min_pos_iou. Accumulating scatter-max so duplicate
        # indices (invalid GTs all map to anchor 0) cannot clobber a
        # valid GT's flag via unspecified write order.
        best_per_gt = iou.argmax(0)
        low_ok = gtv & (iou.max(0) >= cfg.rpn_min_pos_iou)
        pos = pos | jnp.zeros_like(pos).at[best_per_gt].max(low_ok)
        neg = (max_iou < cfg.rpn_neg_iou) & (max_iou >= 0) & ~pos

        A = anc.shape[0]
        r = jax.random.uniform(key, (A,))
        npos = int(cfg.rpn_num_samples * cfg.rpn_pos_fraction)

        def rank(mask):
            key_ = jnp.where(mask, r, 2.0)
            order = jnp.argsort(key_)
            rk = jnp.zeros((A,), jnp.float32).at[order].set(
                jnp.arange(A, dtype=jnp.float32))
            return jnp.where(mask, rk, jnp.inf)

        pr, nr = rank(pos), rank(neg)
        sel_pos = pos & (pr < npos)
        n_needed = cfg.rpn_num_samples - jnp.minimum(
            sel_pos.sum(), npos)
        sel_neg = neg & (nr < n_needed)
        tgt = delta2d_encode(gtb[arg], anc)
        lc = (jnp.where(
            sel_pos | sel_neg,
            -jax.nn.log_sigmoid(jnp.where(sel_pos, logits, -logits)),
            0.0).sum() / jnp.maximum(cfg.rpn_num_samples, 1))
        lb = (jnp.where(sel_pos[:, None],
                        jnp.abs(deltas - tgt), 0.0).sum()
              / jnp.maximum(cfg.rpn_num_samples, 1))
        return lc, lb

    keys = jax.random.split(rng, cls.shape[0])
    lc, lb = jax.vmap(one)(cls, reg, gt_boxes, gt_valid, keys)
    return lc.mean(), lb.mean()


# -------------------------------------------------------------- RCNN


def assign_sample_2d(cfg: MaskRCNNConfig, rng, proposals, prop_valid,
                     gt_boxes, gt_labels, gt_valid):
    """MaxIoUAssigner + RandomSampler for one sample, static shapes.

    add_gt_as_proposals=True: GT boxes are appended before sampling.
    Returns [num_samples]-slot dict."""
    props = jnp.concatenate([proposals, gt_boxes], 0)
    pvalid = jnp.concatenate([prop_valid, gt_valid], 0)
    P = props.shape[0]
    iou = iou_2d(props, gt_boxes)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    max_iou = jnp.where(pvalid, iou.max(-1), -1.0)
    # empty image: all valid proposals become background (mmdet)
    max_iou = jnp.where(gt_valid.any(), max_iou,
                        jnp.where(pvalid, 0.0, -1.0))
    arg = iou.argmax(-1)
    pos = (max_iou >= cfg.pos_iou_thr) & pvalid
    neg = (max_iou < cfg.neg_iou_thr) & (max_iou >= 0) & pvalid

    r = jax.random.uniform(rng, (P,))
    npos = int(cfg.num_samples * cfg.pos_fraction)

    def rank(mask):
        k = jnp.where(mask, r, 2.0)
        order = jnp.argsort(k)
        rk = jnp.zeros((P,), jnp.float32).at[order].set(
            jnp.arange(P, dtype=jnp.float32))
        return jnp.where(mask, rk, jnp.inf)

    pr, nr = rank(pos), rank(neg)
    BIG = 1e6
    # quota-overflow positives are EXCLUDED (jnp.inf), matching mmdet's
    # RandomSampler which leaves unsampled positives out rather than
    # training them as background
    key = jnp.where(pos & (pr < npos), pr,
                    jnp.where(neg, BIG + nr, jnp.inf))
    order = jnp.argsort(key)[:cfg.num_samples]
    sel = jnp.isfinite(key[order])
    return dict(
        rois=props[order],
        roi_valid=sel,
        pos_mask=pos[order] & sel & (pr[order] < npos),
        gt_idx=arg[order],
        gt_of_roi=gt_boxes[arg[order]],
        gt_label_of_roi=gt_labels[arg[order]])


class BBoxHead(nn.Module):
    """Shared2FCBBoxHead: flatten -> 2 FC -> (softmax cls, per-class reg)."""
    num_classes: int
    fc_channels: int

    @nn.compact
    def __call__(self, roi_feats):
        x = roi_feats.reshape(roi_feats.shape[0], -1)
        x = nn.relu(nn.Dense(self.fc_channels, name='fc1')(x))
        x = nn.relu(nn.Dense(self.fc_channels, name='fc2')(x))
        cls = nn.Dense(self.num_classes + 1, name='cls')(x)
        reg = nn.Dense(self.num_classes * 4, name='reg')(x)
        return cls, reg


class MaskHead(nn.Module):
    """FCNMaskHead: convs -> 2x deconv -> per-class mask logits."""
    num_classes: int
    channels: int
    num_convs: int

    @nn.compact
    def __call__(self, roi_feats):
        x = roi_feats
        for i in range(self.num_convs):
            x = nn.relu(nn.Conv(self.channels, (3, 3), padding='SAME',
                                kernel_init=conv_init,
                                name=f'conv{i}')(x))
        x = nn.relu(nn.ConvTranspose(self.channels, (2, 2),
                                     strides=(2, 2), name='up')(x))
        return nn.Conv(self.num_classes, (1, 1), kernel_init=conv_init,
                       name='logits')(x)


class MaskRCNN(nn.Module):
    """End-to-end Mask R-CNN.

    Train: ``__call__(img, gt_boxes, gt_labels, gt_valid, gt_masks,
    train=True)`` -> loss dict (rngs={'sampler': ...}).
    Test: ``__call__(img, train=False)`` -> per-image detections with
    ``masks`` [B, max_per_img, mask_size*2, mask_size*2] roi-space
    probabilities (paste-to-image happens on host, like the
    reference's CPU encode of pycocotools RLEs).
    """
    cfg: MaskRCNNConfig

    @nn.compact
    def __call__(self, img, gt_boxes=None, gt_labels=None, gt_valid=None,
                 gt_masks=None, train: bool = True):
        c = self.cfg
        B, H, W, _ = img.shape
        feats = ResNet(depth=c.backbone_depth, style='pytorch',
                       name='backbone')(img, train)
        fpn = FPN(out_channels=c.fpn_channels, num_outs=len(c.strides),
                  name='neck')(list(feats), train)
        na = len(c.anchor_ratios)
        rpn_outs = RPNHead(c.fpn_channels, na, name='rpn')(fpn)
        anchors = make_anchors(
            c, [f.shape[1:3] for f in fpn])
        proposals, prop_scores, prop_valid = make_proposals(
            c, anchors, rpn_outs, (H, W))

        bbox_head = BBoxHead(c.num_classes, c.fc_channels,
                             name='bbox_head')
        mask_head = MaskHead(c.num_classes, c.fpn_channels, c.mask_convs,
                             name='mask_head')
        # RoI extraction uses the first 4 FPN levels (featmap_strides)
        roi_feats_of = lambda lv, rois, sz: multilevel_roi_align(
            lv, rois, sz, c.strides[:4])

        if not train:
            def one(lv, rois, rvalid):
                rf = roi_feats_of(lv, rois, c.roi_size)
                cls, reg = bbox_head(rf)
                prob = jax.nn.softmax(cls, -1)[:, :-1]      # [P, C]
                boxes_c = delta2d_decode(
                    reg.reshape(-1, c.num_classes, 4),
                    rois[:, None, :], stds=c.target_stds,
                    max_shape=(H, W))                       # [P, C, 4]
                P = rois.shape[0]
                flat_s = jnp.where(rvalid[:, None], prob,
                                   0.0).reshape(-1)         # [P*C]
                flat_b = boxes_c.reshape(-1, 4)
                lab = jnp.tile(jnp.arange(c.num_classes), P)
                ok = flat_s > c.score_thr
                # class-aware NMS: offset boxes per label (mmdet
                # batched_nms trick) so cross-class pairs never overlap
                off = lab.astype(jnp.float32) * (max(H, W) + 1.0)
                idx, _ = nms_2d(flat_b + off[:, None], flat_s,
                                c.test_nms_thr,
                                post_max_size=c.max_per_img, valid=ok)
                safe = jnp.maximum(idx, 0)
                det_b = flat_b[safe]
                det_s = jnp.where(idx >= 0, flat_s[safe], 0.0)
                det_l = lab[safe]
                mf = roi_feats_of(lv, det_b, c.mask_roi_size)
                mlog = mask_head(mf)                        # [K, 2m, 2m, C]
                mprob = jax.nn.sigmoid(jnp.take_along_axis(
                    mlog, det_l[:, None, None, None], -1))[..., 0]
                return dict(boxes=det_b, scores=det_s, labels=det_l,
                            valid=idx >= 0, masks=mprob)
            return jax.vmap(one)(list(fpn[:4]), proposals, prop_valid)

        rng = self.make_rng('sampler')
        k_rpn, k_rcnn = jax.random.split(rng)
        l_rpn_cls, l_rpn_box = rpn_loss(
            c, anchors, rpn_outs, gt_boxes, gt_valid, k_rpn, (H, W))

        # detach proposals (mmdet does; parta2.py/point_rcnn.py too):
        # RCNN losses must not backprop into the RPN reg head through
        # the RoI sample coordinates or the encode() targets
        proposals = jax.lax.stop_gradient(proposals)
        keys = jax.random.split(k_rcnn, B)
        sample = jax.vmap(
            lambda p, pv, gb, gl, gv, k: assign_sample_2d(
                c, k, p, pv, gb, gl, gv))(
            proposals, prop_valid, gt_boxes, gt_labels, gt_valid, keys)

        def rcnn_one(lv, s, gmasks):
            rf = roi_feats_of(lv, s['rois'], c.roi_size)
            cls, reg = bbox_head(rf)
            # labels: matched class for pos, background C for neg
            lab = jnp.where(s['pos_mask'], s['gt_label_of_roi'],
                            c.num_classes)
            lc = jnp.where(
                s['roi_valid'],
                -jax.nn.log_softmax(cls, -1)[
                    jnp.arange(cls.shape[0]), lab], 0.0)
            lc = lc.sum() / jnp.maximum(s['roi_valid'].sum(), 1)
            tgt = delta2d_encode(s['gt_of_roi'], s['rois'],
                                 stds=c.target_stds)
            reg_of_lab = jnp.take_along_axis(
                reg.reshape(-1, c.num_classes, 4),
                jnp.minimum(lab, c.num_classes - 1)[:, None, None],
                1)[:, 0]
            lb = jnp.where(s['pos_mask'][:, None],
                           jnp.abs(reg_of_lab - tgt), 0.0).sum() \
                / jnp.maximum(s['roi_valid'].sum(), 1)

            mf = roi_feats_of(lv, s['rois'], c.mask_roi_size)
            mlog = mask_head(mf)                           # [R, 2m, 2m, C]
            mlog = jnp.take_along_axis(
                mlog, jnp.minimum(lab, c.num_classes - 1)[
                    :, None, None, None], -1)[..., 0]
            # mask targets: RoIAlign-crop each roi's matched GT bitmap
            from ...ops.roi_align import roi_align
            mt = jax.vmap(lambda m, r: roi_align(
                m[:, :, None].astype(jnp.float32), r[None], 2 * c.mask_roi_size
            )[0, :, :, 0])(gmasks[s['gt_idx']], s['rois'])
            mt = (mt > 0.5).astype(jnp.float32)
            lm = jnp.where(
                s['pos_mask'][:, None, None],
                jnp.maximum(mlog, 0) - mlog * mt
                + jnp.log1p(jnp.exp(-jnp.abs(mlog))), 0.0)
            lm = lm.mean((1, 2)).sum() / jnp.maximum(
                s['pos_mask'].sum(), 1)
            return lc, lb, lm

        lc, lb, lm = jax.vmap(rcnn_one)(list(fpn[:4]), sample, gt_masks)
        return dict(loss_rpn_cls=l_rpn_cls, loss_rpn_bbox=l_rpn_box,
                    loss_cls=lc.mean(), loss_bbox=lb.mean(),
                    loss_mask=lm.mean())
