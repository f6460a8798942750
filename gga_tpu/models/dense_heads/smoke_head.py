"""SMOKE monocular 3D detection head.

TPU rebuild of the reference's SMOKEMono3DHead + SMOKECoder
(/root/reference/mmdet3d/models/dense_heads/smoke_mono3d_head.py:17,
/root/reference/mmdet3d/core/bbox/coders/smoke_bbox_coder.py:10):
CenterNet-style class heatmap + 8-channel regression
(depth_offset, keypoint offset xy, dim offsets lhw, orientation sin/cos).
Training uses the disentangled corner L1: three camera boxes are built by
swapping ONE predicted component (ori / dim / loc) into the ground truth
and each is compared to the GT corners (smoke_mono3d_head.py:495-510).

TPU-first: fixed max_objs budgets, masked gathers at target centers, and
guarded atan/atan2 (NaN-grad-safe under masking).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.gaussian import (clip_sigmoid, gaussian_focal_loss,
                              gaussian_radius, render_heatmap)
from ...core.geometry import corners_3d

CAM_ORIGIN = (0.5, 1.0, 0.5)


@dataclasses.dataclass(frozen=True)
class SMOKEConfig:
    num_classes: int = 3
    feat_channels: int = 64
    max_objs: int = 32
    down_ratio: int = 4
    base_depth: Tuple[float, float] = (28.01, 16.32)
    base_dims: Tuple[Tuple[float, float, float], ...] = (
        (0.88, 1.73, 0.67), (1.78, 1.70, 0.58), (3.88, 1.63, 1.53))
    loss_hm_weight: float = 1.0
    loss_bbox_weight: float = 0.1
    # test cfg
    topk: int = 100
    score_thr: float = 0.25


# ---------------- SMOKECoder equivalents ----------------

def decode_depth(depth_offset, base_depth):
    """smoke_bbox_coder.py:100: depth = offset * sigma + mu."""
    return depth_offset * base_depth[1] + base_depth[0]


def decode_location(points, offsets, depths, cam2img_inv, trans_mat_inv):
    """Unproject feature-map keypoints to camera locations
    (smoke_bbox_coder.py:114).

    points/offsets [N, 2] on the FEATURE map; depths [N];
    cam2img_inv [4, 4]; trans_mat_inv [3, 3] (feature -> original image).
    """
    centers = points + offsets
    ones = jnp.ones_like(centers[:, :1])
    hom = jnp.concatenate([centers, ones], -1)              # [N, 3]
    img_pts = jnp.einsum('ij,nj->ni', trans_mat_inv, hom)
    img_pts = img_pts * depths[:, None]
    hom4 = jnp.concatenate([img_pts, jnp.ones_like(ones)], -1)
    locs = jnp.einsum('ij,nj->ni', cam2img_inv, hom4)
    return locs[:, :3]


def decode_dimension(labels, dims_offset, base_dims):
    """dims = exp(offset) * class prior (smoke_bbox_coder.py:155)."""
    base = jnp.asarray(base_dims, jnp.float32)
    sel = base[jnp.clip(labels, 0, base.shape[0] - 1)]
    return jnp.exp(dims_offset) * sel


def decode_orientation(ori_vector, locations):
    """[sin, cos] + location ray -> global yaw in [-pi, pi]
    (smoke_bbox_coder.py:171)."""
    s, c = ori_vector[:, 0], ori_vector[:, 1]
    z = locations[:, 2]
    rays = jnp.arctan(locations[:, 0] / (z + 1e-7))
    alphas = jnp.arctan(s / (c + 1e-7))
    alphas = jnp.where(c >= 0, alphas - jnp.pi / 2, alphas + jnp.pi / 2)
    yaws = alphas + rays
    yaws = jnp.where(yaws > jnp.pi, yaws - 2 * jnp.pi, yaws)
    yaws = jnp.where(yaws < -jnp.pi, yaws + 2 * jnp.pi, yaws)
    return yaws


# ---------------- head module ----------------

class SMOKEHead(nn.Module):
    cfg: SMOKEConfig

    @nn.compact
    def __call__(self, x, train: bool = True):
        """x: [B, H, W, C] stride-``down_ratio`` feature map.

        Returns dict(heatmap [B, H, W, K], reg [B, H, W, 8]).
        """
        c = self.cfg

        def branch(out, name):
            h = nn.Conv(c.feat_channels, (3, 3), padding='SAME',
                        name=f'{name}_conv')(x)
            h = nn.GroupNorm(num_groups=min(32, c.feat_channels),
                             name=f'{name}_gn')(h)
            h = nn.relu(h)
            return nn.Conv(out, (1, 1), name=f'{name}_out')(h)

        hm = branch(c.num_classes, 'hm')
        reg = branch(8, 'reg')
        return dict(heatmap=hm, reg=reg)


def smoke_build_targets(cfg, gt_boxes_cam, labels, centers2d, obj_valid,
                        feat_shape, trans_mat):
    """Heatmap + center indices (smoke_mono3d_head.py get_targets).

    gt_boxes_cam [B, M, 7] camera boxes (x, y_bottom, z, l, h, w, yaw);
    centers2d [B, M, 2] projected 3D centers on the ORIGINAL image;
    trans_mat [B, 3, 3] original image -> feature map.
    """
    H, W = feat_shape
    M = labels.shape[1]

    def one(boxes, lab, c2d, ok, tm):
        hom = jnp.concatenate([c2d, jnp.ones((M, 1))], -1)
        ct = jnp.einsum('ij,nj->ni', tm, hom)[:, :2]     # feature coords
        cti = jnp.floor(ct).astype(jnp.int32)
        inb = ok & (cti[:, 0] >= 0) & (cti[:, 0] < W) \
            & (cti[:, 1] >= 0) & (cti[:, 1] < H)
        # radius from projected box scale (reference uses bbox2d/down_ratio;
        # we approximate with dims/depth scaling via the same formula)
        l = boxes[:, 3]
        h = boxes[:, 4]
        z = jnp.maximum(boxes[:, 2], 1.0)
        fx = 1.0 / jnp.maximum(tm[0, 0], 1e-6)
        wpix = l * fx / z
        hpix = h * fx / z
        radius = gaussian_radius((hpix, wpix), 0.7)
        radius = jnp.maximum(radius.astype(jnp.int32), 1)
        ctc = jnp.stack([jnp.clip(cti[:, 0], 0, W - 1),
                         jnp.clip(cti[:, 1], 0, H - 1)], -1)
        hm = jnp.stack([
            render_heatmap(ctc, radius, inb & (lab == k), (H, W))
            for k in range(cfg.num_classes)], axis=-1)
        return hm, cti, inb

    return jax.vmap(one)(gt_boxes_cam, labels, centers2d, obj_valid,
                         trans_mat)


def smoke_loss(cfg, preds, gt_boxes_cam, labels, centers2d, obj_valid,
               cam2img, trans_mat):
    """Gaussian-focal heatmap + disentangled corner L1."""
    hm_pred = clip_sigmoid(preds['heatmap'])
    B, H, W, _ = hm_pred.shape
    heatmap, cti, inb = smoke_build_targets(
        cfg, gt_boxes_cam, labels, centers2d, obj_valid, (H, W), trans_mat)
    num_pos = jnp.maximum(inb.sum(), 1.0)
    loss_hm = gaussian_focal_loss(hm_pred, heatmap).sum() / num_pos

    def corners_of(loc, dim, yaw):
        return corners_3d(loc, dim, yaw, origin=CAM_ORIGIN, axis=1)

    def one(reg_map, boxes, lab, ct, ok, k2i, tm):
        x = jnp.clip(ct[:, 0], 0, W - 1)
        y = jnp.clip(ct[:, 1], 0, H - 1)
        reg = reg_map[y, x]                                  # [M, 8]
        pts = jnp.stack([x, y], -1).astype(jnp.float32)
        depths = decode_depth(reg[:, 0], cfg.base_depth)
        locs = decode_location(pts, reg[:, 1:3], depths,
                               jnp.linalg.inv(k2i), jnp.linalg.inv(tm))
        dims = decode_dimension(lab, reg[:, 3:6], cfg.base_dims)
        oris = decode_orientation(reg[:, 6:8], locs)
        # reference shifts to bottom center: loc_y += dim_h / 2
        locs = locs.at[:, 1].add(dims[:, 1] / 2)
        g_loc, g_dim, g_yaw = boxes[:, :3], boxes[:, 3:6], boxes[:, 6]
        gt_cor = corners_of(g_loc, g_dim, g_yaw)
        m = ok[:, None, None].astype(jnp.float32)
        l_ori = jnp.abs(corners_of(g_loc, g_dim, oris) - gt_cor) * m
        l_dim = jnp.abs(corners_of(g_loc, dims, g_yaw) - gt_cor) * m
        l_loc = jnp.abs(corners_of(locs, g_dim, g_yaw) - gt_cor) * m
        return (l_ori + l_dim + l_loc).sum()

    tot = jax.vmap(one)(preds['reg'], gt_boxes_cam, labels, cti, inb,
                        cam2img, trans_mat).sum()
    loss_bbox = tot / (num_pos * 24.0)   # 8 corners x 3 coords
    return dict(loss_heatmap=cfg.loss_hm_weight * loss_hm,
                loss_bbox=cfg.loss_bbox_weight * loss_bbox,
                loss=cfg.loss_hm_weight * loss_hm
                + cfg.loss_bbox_weight * loss_bbox)


def smoke_decode(cfg, preds, cam2img, trans_mat):
    """Top-k heatmap peaks -> camera boxes (smoke get_bboxes).

    Returns dict(boxes [B, K, 7], scores [B, K], labels [B, K]).
    """
    hm = clip_sigmoid(preds['heatmap'])
    B, H, W, K = hm.shape
    # 3x3 local-max suppression (CenterNet nms)
    pooled = nn.max_pool(hm, (3, 3), strides=(1, 1), padding='SAME')
    hm = jnp.where(hm == pooled, hm, 0.0)

    def one(h, reg_map, k2i, tm):
        flat = h.reshape(-1)
        scores, idx = jax.lax.top_k(flat, cfg.topk)
        cls = (idx % K).astype(jnp.int32)
        pix = idx // K
        y = pix // W
        x = pix % W
        reg = reg_map[y, x]
        pts = jnp.stack([x, y], -1).astype(jnp.float32)
        depths = decode_depth(reg[:, 0], cfg.base_depth)
        locs = decode_location(pts, reg[:, 1:3], depths,
                               jnp.linalg.inv(k2i), jnp.linalg.inv(tm))
        dims = decode_dimension(cls, reg[:, 3:6], cfg.base_dims)
        oris = decode_orientation(reg[:, 6:8], locs)
        locs = locs.at[:, 1].add(dims[:, 1] / 2)
        boxes = jnp.concatenate([locs, dims, oris[:, None]], -1)
        return boxes, scores, cls

    boxes, scores, labels = jax.vmap(one)(hm, preds['reg'], cam2img,
                                          trans_mat)
    return dict(boxes=boxes, scores=scores, labels=labels)
