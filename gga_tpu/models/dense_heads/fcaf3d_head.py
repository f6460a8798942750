"""FCAF3D head: sparse 3D FPN + anchor-free head, targets, losses, decode.

Batched jittable rebuild of the reference FCAF3DHead
(/root/reference/mmdet3d/models/dense_heads/fcaf3d_head.py:21): top-down
generative-transpose pathway with score-based pruning, shared 1x1 head
convs with per-level scales, the 3-condition target assigner (inside box,
best level by >= pts_assign_threshold insiders, top pts_center_threshold by
centerness, min-volume tie-break) and centerness/IoU/focal losses.

TPU deltas (documented):
- per-level active sites live in static budgets; pruning IS the budget
  top-k (the reference's per-sample topk + MinkowskiPruning);
- ME's trilinear features_at_coordinates for prune scores becomes a
  parent-site lookup (child // 2);
- NMS candidates are capped to a static top-K per class.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.rotated_iou import rotated_overlap
from ...ops import sparse as sp
from ..layers import MaskedBatchNorm, conv_init, flatten_nmap

INF = 1e8


@dataclasses.dataclass(frozen=True)
class FCAF3DConfig:
    n_classes: int = 10
    in_channels: Tuple[int, ...] = (64, 128, 256, 512)
    out_channels: int = 128
    n_reg_outs: int = 8          # 6 distances + 2 angle chans (SUN RGB-D)
    voxel_size: float = 0.01
    pts_assign_threshold: int = 27
    pts_center_threshold: int = 18
    # static per-level budgets (fine -> coarse), double as prune thresholds
    level_budgets: Tuple[int, ...] = (16384, 8192, 4096, 2048)
    max_objs: int = 64
    with_yaw: bool = True
    # test cfg (configs/fcaf3d: nms_pre=1000, iou_thr=.5, score_thr=.01)
    nms_pre: int = 512
    iou_thr: float = 0.5
    score_thr: float = 0.01
    max_out: int = 128


class _SparseConvBNELU(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, feats, coords, valid, grid, train):
        w = self.param('w', conv_init, (27, feats.shape[-1],
                                        self.out_channels))

        # per-scene neighbor resolution, batch-flattened gather+GEMM
        # (vmapped gathers are ~4x slower on TPU — models/layers.py)
        def mk(c, v):
            st = sp.SparseTensor(jnp.zeros((c.shape[0], 1), jnp.float32),
                                 c, v, tuple(grid))
            return sp.build_neighbor_map(st)

        nmap, hit = jax.vmap(mk)(coords, valid)
        B, N, C = feats.shape
        nf, hf = flatten_nmap(nmap, hit)
        x = sp.subm_conv_with_map(
            feats.reshape(B * N, C), valid.reshape(B * N), nf, hf,
            w).reshape(B, N, self.out_channels)
        x = MaskedBatchNorm()(x, valid, train)
        return nn.elu(x)


class FCAF3DHead(nn.Module):
    cfg: FCAF3DConfig

    @nn.compact
    def __call__(self, backbone_outs, train: bool = True):
        """backbone_outs: list over 4 levels of (feats [B,N,C], coords,
        valid, grid) from MinkResNet (fine -> coarse).

        Returns list over levels (fine -> coarse) of dicts:
            center [B, N, 1], bbox [B, N, n_reg_outs], cls [B, N, C],
            points [B, N, 3] metric coords, valid [B, N].
        """
        c = self.cfg
        n_lvl = len(backbone_outs)
        # shared head convs (1x1 == dense on features)
        w_center = self.param('w_center',
                              nn.initializers.normal(0.01),
                              (c.out_channels, 1))
        w_reg = self.param('w_reg', nn.initializers.normal(0.01),
                           (c.out_channels, c.n_reg_outs))
        w_cls = self.param('w_cls', nn.initializers.normal(0.01),
                           (c.out_channels, c.n_classes))
        b_cls = self.param('b_cls', nn.initializers.constant(-4.595),
                           (c.n_classes,))

        outs = [None] * n_lvl
        x = None
        for i in range(n_lvl - 1, -1, -1):
            f_i, c_i, v_i, g_i = backbone_outs[i]
            if x is None:
                x = sp.SparseTensor(f_i[0], c_i[0], v_i[0], g_i)  # template
                feats, coords, valid, grid = f_i, c_i, v_i, g_i
            else:
                # up block: generative transpose k2 s2 -> BN -> ELU ->
                # subm conv k3 -> BN -> ELU (fcaf3d _make_up_block)
                w_up = self.param(f'w_up{i}', conv_init,
                                  (8, feats.shape[-1],
                                   c.in_channels[i]))

                def up(f, cc, v):
                    st = sp.SparseTensor(f, cc, v, grid)
                    out = sp.generative_transpose_conv(
                        st, w_up, out_budget=c.level_budgets[i] * 2)
                    return out.features, out.coords, out.valid

                uf, uc, uv = jax.vmap(up)(feats, coords, valid)
                ug = tuple(d * 2 for d in grid)
                uf = nn.elu(MaskedBatchNorm(name=f'bn_up{i}')(uf, uv,
                                                              train))
                uf = _SparseConvBNELU(c.in_channels[i],
                                      name=f'up_conv{i}')(
                                          uf, uc, uv, ug, train)

                # add to lateral (union); grids must match
                def add(af, ac, av, bf, bc, bv):
                    a = sp.SparseTensor(af, ac, av, ug)
                    b = sp.SparseTensor(bf, bc, bv, g_i)
                    return sp.sparse_add(a, b, c.level_budgets[i] * 2)

                merged = jax.vmap(
                    lambda af, ac, av, bf, bc, bv: add(af, ac, av, bf, bc,
                                                       bv))(
                    uf, uc, uv, f_i, c_i, v_i)
                mf, mc, mv = (merged.features, merged.coords, merged.valid)

                # prune by the coarser level's max-cls score at parents
                prev = outs[i + 1]

                def parent_score(cls_f, cls_c, cls_v, qc, qv):
                    st = sp.SparseTensor(
                        cls_f.max(-1, keepdims=True), cls_c, cls_v, grid)
                    return sp.lookup_features(st, qc // 2, qv)[:, 0]

                score = jax.vmap(parent_score)(
                    prev['cls'], coords, valid, mc, mv)

                def prune(f, cc, v, s):
                    st = sp.SparseTensor(f, cc, v, g_i)
                    out = sp.topk_prune(st, s, c.level_budgets[i])
                    return out.features, out.coords, out.valid

                feats, coords, valid = jax.vmap(prune)(mf, mc, mv, score)
                grid = g_i

            out_f = _SparseConvBNELU(c.out_channels,
                                     name=f'out_block{i}')(
                                         feats, coords, valid, grid, train)
            scale = self.param(f'scale{i}', nn.initializers.ones, ())
            center = jnp.einsum('bnc,cd->bnd', out_f, w_center)
            cls = jnp.einsum('bnc,cd->bnd', out_f, w_cls) + b_cls
            reg = jnp.einsum('bnc,cd->bnd', out_f, w_reg)
            dist = jnp.exp(reg[..., :6] * scale)
            bbox = jnp.concatenate([dist, reg[..., 6:]], -1)
            # metric point positions: MinkResNet stage i sits at stride
            # 2^(i+3) (conv1 s2 * pool s2 * per-stage s2) — ME keeps
            # absolute coords, our halved grids rescale by the stride
            lvl_stride = c.voxel_size * (2 ** (i + 3))
            pts = coords[..., ::-1].astype(jnp.float32) * lvl_stride
            outs[i] = dict(center=center, bbox=bbox, cls=cls, points=pts,
                           valid=valid)
        return outs


def bbox_pred_to_bbox(points, bbox_pred, with_yaw=True):
    """6-distance (+2 angle) predictions -> boxes
    (fcaf3d _bbox_pred_to_bbox:450). Boxes are gravity-centered
    (x, y, z, dx, dy, dz[, yaw])."""
    x = points[..., 0] + (bbox_pred[..., 1] - bbox_pred[..., 0]) / 2
    y = points[..., 1] + (bbox_pred[..., 3] - bbox_pred[..., 2]) / 2
    z = points[..., 2] + (bbox_pred[..., 5] - bbox_pred[..., 4]) / 2
    if not with_yaw:
        return jnp.stack([x, y, z,
                          bbox_pred[..., 0] + bbox_pred[..., 1],
                          bbox_pred[..., 2] + bbox_pred[..., 3],
                          bbox_pred[..., 4] + bbox_pred[..., 5]], -1)
    scale = (bbox_pred[..., 0] + bbox_pred[..., 1]
             + bbox_pred[..., 2] + bbox_pred[..., 3])
    # guarded sqrt/atan2: inactive (zero-padded) rows sit exactly at
    # (0, 0) where both have NaN gradients that would leak through the
    # masked loss (0 * NaN = NaN)
    s6, c7 = bbox_pred[..., 6], bbox_pred[..., 7]
    degen = (jnp.abs(s6) + jnp.abs(c7)) < 1e-8
    q = jnp.exp(jnp.sqrt(s6 ** 2 + c7 ** 2 + 1e-12))
    alpha = 0.5 * jnp.arctan2(jnp.where(degen, 0.0, s6),
                              jnp.where(degen, 1.0, c7))
    return jnp.stack([x, y, z, scale / (1 + q), scale / (1 + q) * q,
                      bbox_pred[..., 5] + bbox_pred[..., 4], alpha], -1)


def _face_distances(points, boxes):
    """[Np, M, 6] distances to box faces (fcaf3d _get_face_distances)."""
    rel = points[:, None, :] - boxes[None, :, :3]
    yaw = boxes[:, 6] if boxes.shape[-1] > 6 else jnp.zeros(boxes.shape[0])
    cos, sin = jnp.cos(-yaw), jnp.sin(-yaw)
    rx = rel[..., 0] * cos[None] - rel[..., 1] * sin[None]
    ry = rel[..., 0] * sin[None] + rel[..., 1] * cos[None]
    centers = boxes[None, :, :3] + jnp.stack(
        [rx, ry, rel[..., 2]], -1)
    dx_min = centers[..., 0] - boxes[None, :, 0] + boxes[None, :, 3] / 2
    dx_max = boxes[None, :, 0] + boxes[None, :, 3] / 2 - centers[..., 0]
    dy_min = centers[..., 1] - boxes[None, :, 1] + boxes[None, :, 4] / 2
    dy_max = boxes[None, :, 1] + boxes[None, :, 4] / 2 - centers[..., 1]
    dz_min = centers[..., 2] - boxes[None, :, 2] + boxes[None, :, 5] / 2
    dz_max = boxes[None, :, 2] + boxes[None, :, 5] / 2 - centers[..., 2]
    return jnp.stack([dx_min, dx_max, dy_min, dy_max, dz_min, dz_max], -1)


def _centerness(face_d):
    xd = face_d[..., 0:2]
    yd = face_d[..., 2:4]
    zd = face_d[..., 4:6]
    c = (xd.min(-1) / jnp.maximum(xd.max(-1), 1e-8)
         * yd.min(-1) / jnp.maximum(yd.max(-1), 1e-8)
         * zd.min(-1) / jnp.maximum(zd.max(-1), 1e-8))
    return jnp.sqrt(jnp.maximum(c, 0.0))


def get_targets(cfg: FCAF3DConfig, points, pts_valid, level_ids, gt_boxes,
                gt_labels, obj_valid):
    """Target assignment for one scene (fcaf3d _get_targets:543).

    Args:
        points: [Np, 3] metric locations (all levels concatenated).
        pts_valid: [Np] bool; level_ids: [Np] int32.
        gt_boxes: [M, 7] gravity-centered depth boxes.
        gt_labels: [M]; obj_valid: [M].

    Returns (center_t [Np], bbox_t [Np, 7], cls_t [Np] with -1 bg).
    """
    n_levels = len(cfg.level_budgets)
    face_d = _face_distances(points, gt_boxes)          # [Np, M, 6]
    inside = (face_d.min(-1) > 0) & pts_valid[:, None] & obj_valid[None, :]

    n_pos_per_level = jnp.stack([
        (inside & (level_ids == i)[:, None]).sum(0)
        for i in range(n_levels)])                       # [L, M]
    lower_mask = n_pos_per_level < cfg.pts_assign_threshold
    lower_index = jnp.argmax(lower_mask.astype(jnp.int32), 0) - 1
    lower_index = jnp.maximum(lower_index, 0)
    all_upper = jnp.all(~lower_mask, 0)
    best_level = jnp.where(all_upper, n_levels - 1, lower_index)  # [M]
    level_cond = level_ids[:, None] == best_level[None, :]

    center = _centerness(face_d)
    center = jnp.where(inside & level_cond, center, -1.0)
    k = cfg.pts_center_threshold + 1
    top_c = jax.lax.top_k(center.T, min(k, center.shape[0]))[0][:, -1]
    topk_cond = center > top_c[None, :]

    volumes = gt_boxes[:, 3] * gt_boxes[:, 4] * gt_boxes[:, 5]
    vol = jnp.where(inside & level_cond & topk_cond, volumes[None, :],
                    INF)
    min_vol = vol.min(1)
    amin = vol.argmin(1)
    pos = min_vol < INF

    center_t = jnp.take_along_axis(center, amin[:, None], 1)[:, 0]
    bbox_t = gt_boxes[amin]
    cls_t = jnp.where(pos, gt_labels[amin], -1)
    return center_t, bbox_t, cls_t, pos


def _iou3d_aligned(a, b, with_yaw=True):
    """Elementwise rotated 3D IoU of gravity-centered boxes [N, 7]
    (mmcv diff_iou_rotated_3d behavioral equivalent; differentiable —
    gradients flow through vertex coordinates)."""
    if with_yaw:
        inter_bev = jax.vmap(
            lambda x, y: rotated_overlap(x[None, [0, 1, 3, 4, 6]],
                                         y[None, [0, 1, 3, 4, 6]])[0, 0]
        )(a, b)
    else:
        lo = jnp.maximum(a[:, :2] - a[:, 3:5] / 2, b[:, :2] - b[:, 3:5] / 2)
        hi = jnp.minimum(a[:, :2] + a[:, 3:5] / 2, b[:, :2] + b[:, 3:5] / 2)
        inter_bev = jnp.prod(jnp.maximum(hi - lo, 0), -1)
    z_ov = jnp.maximum(
        jnp.minimum(a[:, 2] + a[:, 5] / 2, b[:, 2] + b[:, 5] / 2)
        - jnp.maximum(a[:, 2] - a[:, 5] / 2, b[:, 2] - b[:, 5] / 2), 0)
    inter = inter_bev * z_ov
    va = a[:, 3] * a[:, 4] * a[:, 5]
    vb = b[:, 3] * b[:, 4] * b[:, 5]
    return inter / jnp.maximum(va + vb - inter, 1e-8)


def loss(cfg: FCAF3DConfig, head_outs, gt_boxes, gt_labels, obj_valid):
    """Batch loss (fcaf3d _loss_single:267 averaged over scenes).

    Args:
        head_outs: list over levels of head-output dicts.
        gt_boxes: [B, M, 7]; gt_labels: [B, M]; obj_valid: [B, M].
    """
    B = head_outs[0]['center'].shape[0]
    points = jnp.concatenate([o['points'] for o in head_outs], 1)
    pvalid = jnp.concatenate([o['valid'] for o in head_outs], 1)
    level_ids = jnp.concatenate([
        jnp.full((o['points'].shape[1],), i, jnp.int32)
        for i, o in enumerate(head_outs)])
    center_p = jnp.concatenate([o['center'] for o in head_outs], 1)[..., 0]
    bbox_p = jnp.concatenate([o['bbox'] for o in head_outs], 1)
    cls_p = jnp.concatenate([o['cls'] for o in head_outs], 1)

    center_t, bbox_t, cls_t, pos = jax.vmap(
        lambda p, pv, gb, gl, ov: get_targets(cfg, p, pv, level_ids, gb,
                                              gl, ov)
    )(points, pvalid, gt_boxes, gt_labels, obj_valid)

    posf = (pos & pvalid).astype(jnp.float32)
    n_pos = jnp.maximum(posf.sum(1), 1.0)                  # per scene

    # focal cls loss (alpha .25, gamma 2; -1 => background)
    onehot = jax.nn.one_hot(jnp.where(cls_t < 0, cfg.n_classes, cls_t),
                            cfg.n_classes)
    p = jax.nn.sigmoid(cls_p)
    pt = p * onehot + (1 - p) * (1 - onehot)
    alpha_w = 0.25 * onehot + 0.75 * (1 - onehot)
    ce = -(onehot * jax.nn.log_sigmoid(cls_p)
           + (1 - onehot) * jax.nn.log_sigmoid(-cls_p))
    cls_loss = ((alpha_w * (1 - pt) ** 2 * ce).sum(-1)
                * pvalid.astype(jnp.float32)).sum(1) / n_pos

    # centerness BCE
    bce = -(center_t * jax.nn.log_sigmoid(center_p)
            + (1 - center_t) * jax.nn.log_sigmoid(-center_p))
    center_loss = (bce * posf).sum(1) / n_pos

    # IoU bbox loss weighted by centerness targets
    boxes_pred = bbox_pred_to_bbox(points, bbox_p, cfg.with_yaw)
    if not cfg.with_yaw:
        boxes_pred = jnp.concatenate(
            [boxes_pred, jnp.zeros_like(boxes_pred[..., :1])], -1)
    iou = jax.vmap(lambda a, b: _iou3d_aligned(a, b, cfg.with_yaw))(
        boxes_pred, bbox_t)
    denom = jnp.maximum((center_t * posf).sum(1), 1e-6)
    bbox_loss = (((1 - iou) * center_t * posf).sum(1)) / denom

    logs = dict(center_loss=center_loss.mean(),
                bbox_loss=bbox_loss.mean(),
                cls_loss=cls_loss.mean())
    total = sum(logs.values())
    logs['loss'] = total
    logs['num_pos'] = posf.sum()
    return total, logs


def decode(cfg: FCAF3DConfig, head_outs):
    """Inference decode (fcaf3d _get_bboxes_single + per-class 3D NMS),
    static shapes.

    Returns dict: boxes [B, K, 7] gravity-centered, scores [B, K],
    labels [B, K], valid [B, K] (K = n_classes * max_out).
    """
    from ...core.nms import nms_bev

    scores_all, boxes_all, valid_all = [], [], []
    for o in head_outs:
        s = jax.nn.sigmoid(o['cls']) * jax.nn.sigmoid(o['center'])
        boxes = bbox_pred_to_bbox(o['points'], o['bbox'], cfg.with_yaw)
        if not cfg.with_yaw:
            boxes = jnp.concatenate(
                [boxes, jnp.zeros_like(boxes[..., :1])], -1)
        scores_all.append(jnp.where(o['valid'][..., None], s, 0.0))
        boxes_all.append(boxes)
        valid_all.append(o['valid'])
    scores = jnp.concatenate(scores_all, 1)     # [B, Np, C]
    boxes = jnp.concatenate(boxes_all, 1)       # [B, Np, 7]
    valid = jnp.concatenate(valid_all, 1)

    outs = []
    for ci in range(cfg.n_classes):
        sc = scores[..., ci]
        top_s, top_i = jax.lax.top_k(sc, cfg.nms_pre)
        bx = jnp.take_along_axis(boxes, top_i[..., None], 1)

        def one(b, s):
            # rotated BEV NMS as a stand-in for nms3d (z-extent overlap
            # rarely changes suppression indoors)
            bev = b[:, [0, 1, 3, 4, 6]]
            idx, keep = nms_bev(bev, s, cfg.iou_thr,
                                post_max_size=cfg.max_out,
                                valid=s > cfg.score_thr)
            safe = jnp.maximum(idx, 0)
            return b[safe], jnp.where(idx >= 0, s[safe], 0.0), idx >= 0

        b, s, v = jax.vmap(one)(bx, top_s)
        outs.append((b, s, jnp.full(s.shape, ci, jnp.int32), v))

    return dict(
        boxes=jnp.concatenate([o[0] for o in outs], 1),
        scores=jnp.concatenate([o[1] for o in outs], 1),
        labels=jnp.concatenate([o[2] for o in outs], 1),
        valid=jnp.concatenate([o[3] for o in outs], 1))
