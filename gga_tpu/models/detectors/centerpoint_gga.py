"""The GGA weak detector: voxelize -> HardSimpleVFE -> SparseEncoder ->
SECOND -> SECONDFPN -> CenterHead (+ GGA losses).

Rebuild of the reference detector stack
(/root/reference/mmdet3d/models/detectors/centerpoint_gga.py:11 and
mvx_two_stage_gga.py:21) as a single flax module whose forward — including
hard voxelization — traces into one XLA program.
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
from ..dense_heads import centerpoint_head_gga as gga
from ..middle_encoders import SparseEncoder
from ..necks.second_fpn import SECONDFPN
from ..voxel_encoders import HardSimpleVFE


@dataclasses.dataclass(frozen=True)
class GGAModelConfig:
    """Static model config mirroring configs/gga/gga_kitti_config.py:5-91."""
    voxel_size: Tuple[float, float, float] = (0.05, 0.05, 0.1)
    point_cloud_range: Tuple[float, ...] = (0., -40., -3., 70.4, 40., 1.)
    max_points_per_voxel: int = 5
    max_voxels: int = 16000
    sparse_shape: Tuple[int, int, int] = (41, 1600, 1408)
    encoder_channels: Sequence[Sequence[int]] = (
        (16, 16, 32), (32, 32, 64), (64, 64, 128), (128, 128))
    encoder_paddings: Sequence = (
        (0, 0, 1), (0, 0, 1), (0, 0, (0, 1, 1)), (0, 0))
    encoder_budgets: Tuple[int, ...] = (16000, 14000, 12000)
    encoder_out_budget: int = 12000
    encoder_out_channels: int = 128
    backbone_channels: Tuple[int, ...] = (128, 256)
    backbone_layers: Tuple[int, ...] = (5, 5)
    backbone_strides: Tuple[int, ...] = (1, 2)
    neck_channels: Tuple[int, ...] = (256, 256)
    neck_strides: Tuple[int, ...] = (1, 2)
    tasks: Tuple[int, ...] = (1, 1, 1)
    share_conv_channel: int = 64
    head: gga.GGAHeadConfig = dataclasses.field(
        default_factory=gga.GGAHeadConfig)
    # decode/test cfg (gga_kitti_config.py:78-91 + bbox_coder :47-56)
    max_per_task: int = 100
    score_threshold: float = 0.1
    nms_thr: float = 0.2
    post_max_size: int = 512
    # 'bfloat16' runs the backbone/neck/head compute path in bf16 (params
    # and losses stay f32); default f32
    compute_dtype: str = 'float32'
    # per-task (dx, dy, dz) class-mean dims; when set, the dim head's
    # final bias starts at log(prior) and the height head at the class
    # gravity-z (ground_z + dz/2) instead of zeros. Weak supervision
    # (heatmap + 2D projection only) otherwise has to walk dims from
    # exp(0)=1m, which dominates early training.
    task_dim_priors: Tuple[Tuple[float, float, float], ...] = None
    prior_ground_z: float = -1.73
    # rematerialize sparse-encoder residual blocks (memory-for-compute;
    # lets B=16 fit — see SparseEncoder.remat_blocks)
    remat_encoder: bool = False
    # dense-tile engine for these encoder stages' residual blocks
    # (SparseEncoder.tile_stages; stage 0 doesn't cluster — leave it
    # on the row engine)
    encoder_tile_stages: Tuple[int, ...] = ()
    encoder_tile_shape: Tuple[int, int, int] = (2, 4, 4)
    encoder_tile_budgets: Tuple[int, ...] = (0, 7168, 3072, 1536)

    @classmethod
    def small(cls):
        """Accuracy-bench variant: full 70.4x80m range at 0.1m voxels
        (0.8m feature cells) with budgets sized for ~8k-point scenes so
        NOTHING truncates. Exists because tiny()'s 512-voxel budget
        silently drops ~90% of a synthetic scene (coordinate-order
        truncation) and its 2.56m feature cells are wider than a car —
        both made weak training look like it collapsed (ACCURACY.md r2)
        when the model simply could not see most of the scene."""
        head = gga.GGAHeadConfig(
            grid_size=(704, 800, 40), max_objs=16,
            voxel_size=(0.1, 0.1, 0.1))
        return cls(
            voxel_size=(0.1, 0.1, 0.1),
            max_voxels=8192, sparse_shape=(41, 800, 704),
            encoder_channels=((16, 16), (16, 32), (32, 64), (64,)),
            encoder_paddings=((0, 1), (0, 1), (0, (0, 1, 1)), (0,)),
            encoder_budgets=(8192, 8192, 6144), encoder_out_budget=6144,
            encoder_out_channels=64,
            backbone_channels=(64, 128), backbone_layers=(2, 2),
            neck_channels=(64, 64),
            share_conv_channel=32,
            head=head, max_per_task=32, post_max_size=32,
            task_dim_priors=((0.8, 0.6, 1.73), (1.76, 0.6, 1.73),
                             (3.9, 1.6, 1.56)))

    @classmethod
    def tiny(cls):
        """Small variant for CPU tests: ~1/6 grid, thin channels. Grid dims
        divide evenly by 16 so SECONDFPN's deconv concat lines up."""
        head = gga.GGAHeadConfig(
            grid_size=(224, 256, 40), max_objs=16,
            point_cloud_range=(0., -40., -3., 71.68, 40., 1.),
            voxel_size=(0.32, 0.3125, 0.1))
        return cls(
            voxel_size=(0.32, 0.3125, 0.1),
            point_cloud_range=(0., -40., -3., 71.68, 40., 1.),
            max_voxels=512, sparse_shape=(41, 256, 224),
            encoder_channels=((8, 8), (8, 8), (8, 8), (8,)),
            encoder_paddings=((0, 1), (0, 1), (0, (0, 1, 1)), (0,)),
            encoder_budgets=(512, 512, 512), encoder_out_budget=512,
            encoder_out_channels=16,
            backbone_channels=(16, 32), backbone_layers=(1, 1),
            neck_channels=(16, 16),
            share_conv_channel=16,
            head=head, max_per_task=16, post_max_size=16)


class GGADetector(nn.Module):
    cfg: GGAModelConfig

    @nn.compact
    def __call__(self, points, points_valid, train: bool = True):
        """points: [B, P, 4]; points_valid: [B, P].

        Returns list over tasks of head-output dicts (NHWC maps).
        """
        c = self.cfg

        def vox(p, v):
            out = hard_voxelize(
                p, v, voxel_size=tuple(c.voxel_size),
                pc_range=tuple(c.point_cloud_range),
                max_points=c.max_points_per_voxel, max_voxels=c.max_voxels)
            return (out['voxels'], out['coords'], out['num_points'],
                    out['num_voxels'])

        voxels, coords, num_points, num_voxels = jax.vmap(vox)(
            points, points_valid)
        feats = HardSimpleVFE()(voxels, num_points)
        feats = feats.astype(jnp.dtype(c.compute_dtype))
        vvalid = (jnp.arange(c.max_voxels)[None, :]
                  < num_voxels[:, None])

        bev = SparseEncoder(
            in_channels=feats.shape[-1],
            base_channels=c.encoder_channels[0][0],
            sparse_shape=tuple(c.sparse_shape),
            output_channels=c.encoder_out_channels,
            encoder_channels=tuple(c.encoder_channels),
            encoder_paddings=tuple(c.encoder_paddings),
            stage_budgets=tuple(c.encoder_budgets),
            out_budget=c.encoder_out_budget,
            remat_blocks=c.remat_encoder,
            tile_stages=tuple(c.encoder_tile_stages),
            tile_shape=tuple(c.encoder_tile_shape),
            tile_budgets=tuple(c.encoder_tile_budgets))(
                feats, coords, vvalid, train)

        xs = SECOND(in_channels=bev.shape[-1],
                    out_channels=tuple(c.backbone_channels),
                    layer_nums=tuple(c.backbone_layers),
                    layer_strides=tuple(c.backbone_strides))(bev, train)
        fused = SECONDFPN(in_channels=tuple(c.backbone_channels),
                          out_channels=tuple(c.neck_channels),
                          upsample_strides=tuple(c.neck_strides))(xs, train)
        task_out_biases = None
        if c.task_dim_priors is not None:
            import math
            task_out_biases = tuple(
                dict(dim=tuple(math.log(d) for d in dims),
                     height=(c.prior_ground_z + dims[2] / 2.0,))
                for dims in c.task_dim_priors)
        return cp.CenterHead(
            tasks=tuple(c.tasks), in_channels=fused.shape[-1],
            share_conv_channel=c.share_conv_channel,
            task_out_biases=task_out_biases)(fused, train)


def decode_detections(cfg: GGAModelConfig, preds):
    """Head outputs -> merged per-sample detections (static shapes).

    Mirrors get_bboxes + get_task_detections + the merge
    (centerpoint_head_gga.py:725-816)."""
    h = cfg.head
    dets = []
    for tp in preds:
        d = cp.decode_task(
            tp, voxel_size=h.voxel_size[:2],
            pc_range=h.point_cloud_range,
            out_size_factor=h.out_size_factor,
            max_num=cfg.max_per_task,
            score_threshold=cfg.score_threshold,
            post_center_range=h.point_cloud_range)
        dets.append(cp.get_task_detections(
            d, nms_thr=cfg.nms_thr,
            post_max_size=min(cfg.post_max_size, cfg.max_per_task)))
    return cp.merge_task_detections(dets, cfg.tasks)
