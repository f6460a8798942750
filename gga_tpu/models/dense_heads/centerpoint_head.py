"""CenterPoint head: shared conv + per-task separate heads, plus a
static-shape box decoder.

Rebuild of the reference CenterHead / SeparateHead
(/root/reference/mmdet3d/models/dense_heads/centerpoint_head.py:20) and
CenterPointBBoxCoder
(/root/reference/mmdet3d/core/bbox/coders/centerpoint_bbox_coders.py:9) in
NHWC with fixed top-K outputs + validity masks instead of dynamic shapes.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.nms import nms_bev
from ..layers import ConvModule2d, conv_init


class SeparateHead(nn.Module):
    """Per-task branch heads (centerpoint_head.py:20): for each output key,
    (num_conv - 1) ConvModule(k=final_kernel)+BN+ReLU then a final conv with
    bias; heatmap final bias initialized to init_bias.

    out_biases: optional {head_name: per-channel bias values} to start a
    head at a prior (e.g. dim at log class-mean size, height at the class
    gravity-z). TPU-delta vs the reference's zero init: with only weak 2D
    supervision (GGA), dims/height learn slowly from far-off starts; a
    prior init shifts where training begins, not what the losses train.
    """
    heads: Dict[str, Tuple[int, int]]
    head_conv: int = 64
    final_kernel: int = 3
    init_bias: float = -2.19
    out_biases: Dict[str, Tuple[float, ...]] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        out = {}
        for name, (out_ch, num_conv) in self.heads.items():
            y = x
            for _ in range(num_conv - 1):
                y = ConvModule2d(self.head_conv, self.final_kernel,
                                 use_bias=True)(y, train)
            if name == 'heatmap':
                bias_init = nn.initializers.constant(self.init_bias)
            elif self.out_biases and name in self.out_biases:
                bias_init = nn.initializers.constant(
                    jnp.asarray(self.out_biases[name], jnp.float32))
            else:
                bias_init = nn.initializers.zeros
            y = nn.Conv(out_ch, (self.final_kernel, self.final_kernel),
                        padding='SAME', use_bias=True, dtype=y.dtype,
                        kernel_init=conv_init, bias_init=bias_init,
                        name=f'{name}_out')(y)
            # losses and decode run in f32
            out[name] = y.astype(jnp.float32)
        return out


class DeformConv2d(nn.Module):
    """mmcv DeformConv2dPack (DCN v1) as a flax module: a zero-init
    standard conv predicts per-tap (dy, dx) offsets, the main kernel is
    applied at the shifted bilinear samples (ops/deform.py). Zero offset
    init makes it a regular conv at initialization, like mmcv."""
    features: int
    kernel_size: int = 3
    groups: int = 1

    @nn.compact
    def __call__(self, x):
        from ...ops.deform import deform_conv2d
        kk = self.kernel_size * self.kernel_size
        off = nn.Conv(2 * kk, (self.kernel_size, self.kernel_size),
                      padding='SAME', use_bias=True, dtype=x.dtype,
                      kernel_init=nn.initializers.zeros,
                      name='conv_offset')(x)
        w = self.param(
            'kernel', conv_init,
            (kk, x.shape[-1] // self.groups, self.features))
        return deform_conv2d(x, off.astype(jnp.float32), w,
                             kernel_size=self.kernel_size,
                             groups=self.groups)


class DCNSeparateHead(nn.Module):
    """DCNSeparateHead (centerpoint_head.py:125): two deformable-conv
    feature adapters split classification from regression; the heatmap
    branch is ConvModule(3x3)+final conv on the cls features, the box
    heads are a SeparateHead on the reg features."""
    heads: Dict[str, Tuple[int, int]]
    num_cls: int
    head_conv: int = 64
    final_kernel: int = 3
    init_bias: float = -2.19
    dcn_groups: int = 4
    out_biases: Dict[str, Tuple[float, ...]] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        c = x.shape[-1]
        center_feat = DeformConv2d(c, groups=self.dcn_groups,
                                   name='feature_adapt_cls')(x)
        reg_feat = DeformConv2d(c, groups=self.dcn_groups,
                                name='feature_adapt_reg')(x)

        y = ConvModule2d(self.head_conv, 3, use_bias=True)(
            center_feat, train)
        hm = nn.Conv(self.num_cls, (3, 3), padding='SAME', use_bias=True,
                     dtype=y.dtype, kernel_init=conv_init,
                     bias_init=nn.initializers.constant(self.init_bias),
                     name='heatmap_out')(y)
        box_heads = {k: v for k, v in self.heads.items() if k != 'heatmap'}
        out = SeparateHead(heads=box_heads, head_conv=self.head_conv,
                           final_kernel=self.final_kernel,
                           out_biases=self.out_biases,
                           name='task_head')(reg_feat, train)
        out['heatmap'] = hm.astype(jnp.float32)
        return out


class CenterHead(nn.Module):
    """CenterPoint head over NHWC BEV features.

    tasks: tuple of per-task class counts, e.g. (1, 1, 1) for the GGA
    Pedestrian/Cyclist/Car config (gga_kitti_config.py:39-43).
    """
    tasks: Sequence[int] = (1, 1, 1)
    in_channels: int = 512
    share_conv_channel: int = 64
    common_heads: Dict[str, Tuple[int, int]] = None
    num_heatmap_convs: int = 2
    separate_head_final_kernel: int = 3
    # use DCNSeparateHead (deformable feature adaptation) per task, the
    # reference's separate_head type for the *_dcn_* centerpoint configs
    dcn_head: bool = False
    # optional per-task {head_name: bias values} prior inits
    task_out_biases: Sequence[Dict[str, Tuple[float, ...]]] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        """x: [B, H, W, C] -> list over tasks of dicts of NHWC maps."""
        common = self.common_heads or dict(
            reg=(2, 2), height=(1, 2), dim=(3, 2), rot=(2, 2))
        x = ConvModule2d(self.share_conv_channel, 3, use_bias=True)(x, train)
        outs = []
        for t, num_cls in enumerate(self.tasks):
            heads = dict(common)
            heads['heatmap'] = (num_cls, self.num_heatmap_convs)
            biases = (self.task_out_biases[t]
                      if self.task_out_biases else None)
            if self.dcn_head:
                outs.append(
                    DCNSeparateHead(
                        heads=heads, num_cls=num_cls,
                        final_kernel=self.separate_head_final_kernel,
                        out_biases=biases,
                        name=f'task{t}')(x, train))
            else:
                outs.append(
                    SeparateHead(
                        heads=heads,
                        final_kernel=self.separate_head_final_kernel,
                        out_biases=biases,
                        name=f'task{t}')(x, train))
        return outs


def decode_task(preds, *, voxel_size, pc_range, out_size_factor, max_num=100,
                score_threshold=0.1, post_center_range=None):
    """Static-shape CenterPointBBoxCoder.decode
    (centerpoint_bbox_coders.py:117).

    Args:
        preds: task dict of NHWC maps (heatmap pre-sigmoid; dim pre-exp).

    Returns dict:
        boxes [B, K, 7] (x, y, z_gravity, dx, dy, dz, yaw), scores [B, K],
        labels [B, K], valid [B, K].
    """
    # top-k over LOGITS, not sigmoids: sigmoid is monotone so the order
    # is identical, but f32 sigmoid saturates to exactly 1.0 above ~17
    # and top_k then tie-breaks positionally — on confident (weak-train)
    # heatmaps that made the ranking degenerate (ACCURACY.md)
    B, H, W, C = preds['heatmap'].shape
    flat = preds['heatmap'].reshape(B, H * W * C)
    logits, inds = jax.lax.top_k(flat, max_num)   # over all cls+locations
    scores = jax.nn.sigmoid(logits)
    labels = inds % C
    loc = inds // C
    ys = (loc // W).astype(jnp.float32)
    xs = (loc % W).astype(jnp.float32)

    def gather(m):
        return jnp.take_along_axis(
            m.reshape(B, H * W, -1), loc[..., None], axis=1)

    reg = gather(preds['reg'])
    xs = (xs + reg[..., 0]) * out_size_factor * voxel_size[0] + pc_range[0]
    ys = (ys + reg[..., 1]) * out_size_factor * voxel_size[1] + pc_range[1]
    hei = gather(preds['height'])[..., 0]
    dim = jnp.exp(gather(preds['dim']))
    rot = gather(preds['rot'])
    yaw = jnp.arctan2(rot[..., 0], rot[..., 1])

    boxes = jnp.stack([xs, ys, hei, dim[..., 0], dim[..., 1], dim[..., 2],
                       yaw], axis=-1)
    if 'vel' in preds:
        boxes = jnp.concatenate([boxes, gather(preds['vel'])], -1)
    valid = scores > score_threshold
    if post_center_range is not None:
        pcr = jnp.asarray(post_center_range, jnp.float32)
        valid &= jnp.all(boxes[..., :3] >= pcr[:3], -1)
        valid &= jnp.all(boxes[..., :3] <= pcr[3:], -1)
    # 'logits' ride along as a saturation-free ranking key (AP depends
    # only on score ORDER, so eval may rank by logit without changing
    # the reference's sigmoid-score semantics)
    return dict(boxes=boxes, scores=scores, labels=labels, valid=valid,
                logits=logits)


def get_task_detections(decoded, *, nms_thr=0.2, post_max_size=512):
    """Rotated-BEV NMS per task (centerpoint_head_gga.py:819), static K.

    Returns the decoded dict with ``valid`` refined by NMS and entries
    reordered by score among kept (padding at the end).
    """
    def one(boxes, scores, labels, valid, logits):
        bev = boxes[:, [0, 1, 3, 4, 6]]
        k = min(post_max_size, boxes.shape[0])
        # suppression order by logits (monotone with scores, no
        # saturation ties at score 1.0)
        idx, keep = nms_bev(bev, logits, nms_thr, post_max_size=k,
                            valid=valid)
        safe = jnp.maximum(idx, 0)
        neg_inf = jnp.asarray(-jnp.inf, logits.dtype)
        return dict(
            boxes=boxes[safe], scores=jnp.where(idx >= 0, scores[safe], 0.0),
            labels=labels[safe], valid=idx >= 0,
            logits=jnp.where(idx >= 0, logits[safe], neg_inf))

    return jax.vmap(one)(decoded['boxes'], decoded['scores'],
                         decoded['labels'], decoded['valid'],
                         decoded['logits'])


def merge_task_detections(task_dets, task_num_classes):
    """Concatenate per-task detections, offsetting labels and converting
    gravity-center z to bottom-center (centerpoint_head_gga.py:806-812)."""
    boxes, scores, labels, valid, logits = [], [], [], [], []
    flag = 0
    for det, ncls in zip(task_dets, task_num_classes):
        b = det['boxes']
        b = b.at[..., 2].add(-b[..., 5] * 0.5)
        boxes.append(b)
        scores.append(det['scores'])
        labels.append(det['labels'] + flag)
        valid.append(det['valid'])
        logits.append(det.get('logits', det['scores']))
        flag += ncls
    return dict(
        boxes=jnp.concatenate(boxes, axis=1),
        scores=jnp.concatenate(scores, axis=1),
        labels=jnp.concatenate(labels, axis=1),
        valid=jnp.concatenate(valid, axis=1),
        logits=jnp.concatenate(logits, axis=1))


# ---------------------------------------------------------------- training
# Fully-supervised CenterPoint targets/loss (centerpoint_head.py
# get_targets_single:343 + loss:629 of the reference's NON-GGA head):
# gaussian heatmaps at GT centers, per-task anno_box regression
# (subpixel offset, gravity z, log dims, sin/cos yaw [, velocity]).

def centerpoint_targets_single(gt_boxes, gt_labels, gt_valid, *,
                               task_classes, feat_hw, voxel_size,
                               pc_range, out_size_factor,
                               gaussian_overlap=0.1, min_radius=2,
                               with_velocity=False):
    """One sample -> per-task target dicts. gt_boxes [M, 7(+2)] lidar
    BOTTOM-center."""
    from ...core.gaussian import gaussian_radius, render_class_heatmaps

    H, W = feat_hw
    M = gt_labels.shape[0]
    fx = voxel_size[0] * out_size_factor
    fy = voxel_size[1] * out_size_factor
    cx = (gt_boxes[:, 0] - pc_range[0]) / fx
    cy = (gt_boxes[:, 1] - pc_range[1]) / fy
    cxi = jnp.clip(cx.astype(jnp.int32), 0, W - 1)
    cyi = jnp.clip(cy.astype(jnp.int32), 0, H - 1)
    inb = gt_valid & (cx >= 0) & (cx < W) & (cy >= 0) & (cy < H)

    radius = gaussian_radius((gt_boxes[:, 4] / fy, gt_boxes[:, 3] / fx),
                             gaussian_overlap)
    radius = jnp.maximum(radius.astype(jnp.int32), min_radius)

    z_grav = gt_boxes[:, 2] + gt_boxes[:, 5] / 2
    anno = [jnp.stack([cx - cxi, cy - cyi], -1),
            z_grav[:, None],
            jnp.log(jnp.maximum(gt_boxes[:, 3:6], 1e-6)),
            jnp.stack([jnp.sin(gt_boxes[:, 6]),
                       jnp.cos(gt_boxes[:, 6])], -1)]
    if with_velocity:
        anno.append(gt_boxes[:, 7:9])
    anno_box = jnp.concatenate(anno, -1)

    tasks = []
    flag = 0
    centers_int = jnp.stack([cxi, cyi], -1)
    for ncls in task_classes:
        local = gt_labels - flag
        tmask = inb & (local >= 0) & (local < ncls)
        hm = render_class_heatmaps(
            centers_int, radius, jnp.where(tmask, local, 0), tmask,
            ncls, (H, W)).transpose(1, 2, 0)          # -> [H, W, C]
        tasks.append(dict(
            heatmap=hm,
            ind=jnp.where(tmask, cyi * W + cxi, 0),
            anno_box=jnp.where(tmask[:, None], anno_box, 0.0),
            mask=tmask))
        flag += ncls
    return tasks


def centerpoint_loss(preds, targets, *, code_weights,
                     loss_heatmap_weight=1.0, loss_bbox_weight=0.25):
    """Batched supervised loss over per-task preds/targets."""
    from ...core.gaussian import clip_sigmoid, gaussian_focal_loss

    total = 0.0
    logs = {}
    cw = jnp.asarray(code_weights, jnp.float32)
    for t, (tp, tt) in enumerate(zip(preds, targets)):
        hm = clip_sigmoid(tp['heatmap'])
        num_pos = jnp.maximum((tt['heatmap'] == 1.0).sum(), 1.0)
        l_hm = gaussian_focal_loss(hm, tt['heatmap']).sum() / num_pos

        keys = ['reg', 'height', 'dim', 'rot'] + (
            ['vel'] if 'vel' in tp else [])
        pred_map = jnp.concatenate([tp[k] for k in keys], -1)
        B, H, W, C = pred_map.shape
        flat = pred_map.reshape(B, H * W, C)
        picked = jnp.take_along_axis(flat, tt['ind'][..., None], axis=1)
        m = tt['mask'].astype(jnp.float32)[..., None]
        l1 = jnp.abs(picked - tt['anno_box']) * m * cw[:C]
        l_bbox = l1.sum() / jnp.maximum(m.sum(), 1.0)

        logs[f'task{t}.loss_heatmap'] = l_hm * loss_heatmap_weight
        logs[f'task{t}.loss_bbox'] = l_bbox * loss_bbox_weight
        total = total + logs[f'task{t}.loss_heatmap'] \
            + logs[f'task{t}.loss_bbox']
    logs['loss'] = total
    return total, logs
