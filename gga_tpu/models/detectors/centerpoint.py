"""CenterPoint (fully supervised) detector.

Rebuild of /root/reference/mmdet3d/models/detectors/centerpoint.py:9
with configs/_base_/models/centerpoint_01voxel_second_secfpn_nus.py:
hard voxelization -> HardSimpleVFE -> SparseEncoder -> SECOND ->
SECONDFPN -> CenterHead (6 nuScenes task groups, velocity heads).
The GGA detector shares this stack but swaps the weak-supervision head;
this class is the plain 3D-GT-supervised variant used by the nuScenes
family.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.voxelize import hard_voxelize
from ..backbones.second import SECOND
from ..dense_heads import centerpoint_head as cp
from ..middle_encoders import SparseEncoder
from ..necks.second_fpn import SECONDFPN
from ..voxel_encoders import HardSimpleVFE


@dataclasses.dataclass(frozen=True)
class CenterPointConfig:
    voxel_size: Tuple[float, float, float] = (0.1, 0.1, 0.2)
    point_cloud_range: Tuple[float, ...] = (-51.2, -51.2, -5.0,
                                            51.2, 51.2, 3.0)
    in_channels: int = 5              # nus: xyzi + sweep dt
    max_points_per_voxel: int = 10
    max_voxels: int = 90000
    sparse_shape: Tuple[int, int, int] = (41, 1024, 1024)
    encoder_channels: Sequence = ((16,), (32, 32, 32), (64, 64, 64),
                                  (128, 128))
    encoder_paddings: Sequence = ((1,), (1, 1, 1), (1, 1, 1),
                                  ((1, 1, 0), 1))
    encoder_budgets: Tuple[int, ...] = (90000, 60000, 40000)
    encoder_out_budget: int = 40000
    encoder_out_channels: int = 128
    backbone_channels: Tuple[int, ...] = (128, 256)
    backbone_layers: Tuple[int, ...] = (5, 5)
    backbone_strides: Tuple[int, ...] = (1, 2)
    neck_channels: Tuple[int, ...] = (256, 256)
    neck_strides: Tuple[int, ...] = (1, 2)
    # nus task grouping (centerpoint_01voxel nus config tasks)
    tasks: Tuple[int, ...] = (1, 2, 2, 1, 2, 2)
    share_conv_channel: int = 64
    # DCNSeparateHead per task (the *_dcn_* config family): deformable
    # feature adaptation before the cls/reg branches
    dcn_head: bool = False
    with_velocity: bool = True
    out_size_factor: int = 8
    gaussian_overlap: float = 0.1
    min_radius: int = 2
    code_weights: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0, 1.0, 1.0,
                                       1.0, 1.0, 0.2, 0.2)
    loss_bbox_weight: float = 0.25
    # test cfg
    max_per_task: int = 100
    score_threshold: float = 0.1
    nms_thr: float = 0.2
    post_max_size: int = 500
    # 'rotated' (nms_bev) or 'circle' — the circlenms config family
    # (test_cfg nms_type='circle', min_radius per task, reference
    # centerpoint_..._circlenms_*.py)
    nms_type: str = 'rotated'
    nms_min_radius: Tuple[float, ...] = (4, 12, 10, 1, 0.85, 0.175)
    # pillar variant (02pillar configs): PillarFeatureNet +
    # PointPillarsScatter replace VFE + SparseEncoder
    # (reference centerpoint_02pillar_second_secfpn_nus.py)
    pillar: bool = False
    pfn_channels: Tuple[int, ...] = (64,)
    scatter_shape: Tuple[int, int] = (512, 512)

    @classmethod
    def tiny(cls):
        return cls(voxel_size=(0.8, 0.8, 0.2),
                   point_cloud_range=(-25.6, -25.6, -5.0,
                                      25.6, 25.6, 3.0),
                   max_voxels=2048, sparse_shape=(41, 64, 64),
                   encoder_channels=((8,), (8, 8), (8, 8), (8,)),
                   encoder_paddings=((1,), (1, 1), (1, 1), (1,)),
                   encoder_budgets=(2048, 2048, 2048),
                   encoder_out_budget=2048, encoder_out_channels=16,
                   backbone_channels=(16, 32), backbone_layers=(1, 1),
                   neck_channels=(16, 16), tasks=(1, 1),
                   share_conv_channel=16, max_per_task=16,
                   post_max_size=32)


class CenterPointDetector(nn.Module):
    cfg: CenterPointConfig

    @nn.compact
    def __call__(self, points, points_valid, train: bool = True):
        c = self.cfg

        def vox(p, v):
            out = hard_voxelize(
                p, v, voxel_size=tuple(c.voxel_size),
                pc_range=tuple(c.point_cloud_range),
                max_points=c.max_points_per_voxel,
                max_voxels=c.max_voxels)
            return (out['voxels'], out['coords'], out['num_points'],
                    out['num_voxels'])

        voxels, coords, num_points, num_voxels = jax.vmap(vox)(
            points, points_valid)
        vvalid = jnp.arange(c.max_voxels)[None] < num_voxels[:, None]
        if c.pillar:
            from ..middle_encoders import PointPillarsScatter
            from ..voxel_encoders import PillarFeatureNet
            feats = PillarFeatureNet(
                feat_channels=tuple(c.pfn_channels),
                voxel_size=tuple(c.voxel_size),
                point_cloud_range=tuple(c.point_cloud_range))(
                    voxels, num_points, coords, train)
            feats = jnp.where(vvalid[..., None], feats, 0.0)
            bev = PointPillarsScatter(tuple(c.scatter_shape))(
                feats, coords, vvalid)
        else:
            feats = HardSimpleVFE()(voxels, num_points)
            bev = SparseEncoder(
                in_channels=feats.shape[-1],
                sparse_shape=tuple(c.sparse_shape),
                base_channels=c.encoder_channels[0][0],
                output_channels=c.encoder_out_channels,
                encoder_channels=tuple(tuple(b)
                                       for b in c.encoder_channels),
                encoder_paddings=tuple(
                    tuple(p) if isinstance(p, (tuple, list)) else p
                    for p in c.encoder_paddings),
                stage_budgets=tuple(c.encoder_budgets),
                out_budget=c.encoder_out_budget,
                block_type='conv_module')(feats, coords, vvalid, train)
        xs = SECOND(in_channels=bev.shape[-1],
                    out_channels=tuple(c.backbone_channels),
                    layer_nums=tuple(c.backbone_layers),
                    layer_strides=tuple(c.backbone_strides))(bev, train)
        fused = SECONDFPN(in_channels=tuple(c.backbone_channels),
                          out_channels=tuple(c.neck_channels),
                          upsample_strides=tuple(c.neck_strides))(xs,
                                                                  train)
        common = dict(reg=(2, 2), height=(1, 2), dim=(3, 2), rot=(2, 2))
        if c.with_velocity:
            common['vel'] = (2, 2)
        return cp.CenterHead(
            tasks=tuple(c.tasks), in_channels=fused.shape[-1],
            share_conv_channel=c.share_conv_channel,
            dcn_head=c.dcn_head,
            common_heads=common)(fused, train)


def centerpoint_loss(cfg: CenterPointConfig, preds, gt_boxes, gt_labels,
                     gt_valid):
    H = preds[0]['heatmap'].shape[1]
    W = preds[0]['heatmap'].shape[2]
    targets_b = jax.vmap(lambda gb, gl, gv: cp.centerpoint_targets_single(
        gb, gl, gv, task_classes=tuple(cfg.tasks), feat_hw=(H, W),
        voxel_size=tuple(cfg.voxel_size),
        pc_range=tuple(cfg.point_cloud_range),
        out_size_factor=cfg.out_size_factor,
        gaussian_overlap=cfg.gaussian_overlap, min_radius=cfg.min_radius,
        with_velocity=cfg.with_velocity))(gt_boxes, gt_labels, gt_valid)
    ncode = 10 if cfg.with_velocity else 8
    return cp.centerpoint_loss(
        preds, targets_b, code_weights=cfg.code_weights[:ncode],
        loss_bbox_weight=cfg.loss_bbox_weight)


def decode_centerpoint(cfg: CenterPointConfig, preds):
    dets = []
    for ti, tp in enumerate(preds):
        d = cp.decode_task(
            tp, voxel_size=cfg.voxel_size[:2],
            pc_range=cfg.point_cloud_range,
            out_size_factor=cfg.out_size_factor,
            max_num=cfg.max_per_task,
            score_threshold=cfg.score_threshold,
            post_center_range=cfg.point_cloud_range)
        k = min(cfg.post_max_size, cfg.max_per_task)
        if cfg.nms_type == 'circle':
            # circlenms configs: center-distance NMS with a per-task
            # radius (reference test_cfg min_radius, box3d_nms.py:182)
            from ...core.nms import circle_nms
            radius = cfg.nms_min_radius[
                min(ti, len(cfg.nms_min_radius) - 1)]

            def one(boxes, scores, labels, valid, logits, radius=radius):
                idx, _ = circle_nms(boxes[:, :2], logits, radius,
                                    post_max_size=k, valid=valid)
                safe = jnp.maximum(idx, 0)
                neg_inf = jnp.asarray(-jnp.inf, logits.dtype)
                return dict(boxes=boxes[safe],
                            scores=jnp.where(idx >= 0, scores[safe], 0.0),
                            labels=labels[safe], valid=idx >= 0,
                            logits=jnp.where(idx >= 0, logits[safe],
                                             neg_inf))

            dets.append(jax.vmap(one)(d['boxes'], d['scores'],
                                      d['labels'], d['valid'], d['logits']))
        else:
            dets.append(cp.get_task_detections(
                d, nms_thr=cfg.nms_thr, post_max_size=k))
    return cp.merge_task_detections(dets, cfg.tasks)
