"""Test-time-augmentation merging for 3D detections.

Rebuild of merge_aug_bboxes_3d
(/root/reference/mmdet3d/core/post_processing/merge_augs.py:8) and the
MultiScaleFlipAug3D transform surface
(datasets/pipelines/test_time_aug.py:119): augmented variants are
(scale, horizontal-flip, vertical-flip) triples; detections from each
variant map back through the inverse transform (flips are involutive,
then the inverse scale), concatenate, and a per-class rotated-BEV NMS
keeps the best ``max_num`` — all on static padded shapes.
"""
from __future__ import annotations

import itertools

import jax.numpy as jnp
import numpy as np

from .nms import nms_bev


def tta_transforms(scales=(1.0,), flip=False, pcd_horizontal_flip=True,
                   pcd_vertical_flip=False):
    """Enumerate MultiScaleFlipAug3D variants (test_time_aug.py:160-175:
    the identity transform always included, flips added when ``flip``).

    Returns list of dicts(scale, h_flip, v_flip).
    """
    h_opts = [False, True] if flip and pcd_horizontal_flip else [False]
    v_opts = [False, True] if flip and pcd_vertical_flip else [False]
    return [dict(scale=float(s), h_flip=h, v_flip=v)
            for s, h, v in itertools.product(scales, h_opts, v_opts)]


def augment_points(points, transform):
    """Forward transform on lidar points [..., P, 3+] (scale then flip,
    matching GlobalRotScaleTrans + RandomFlip3D order in the TTA
    pipeline)."""
    xyz = points[..., :3] * transform['scale']
    if transform['h_flip']:
        xyz = xyz.at[..., 1].multiply(-1)
    if transform['v_flip']:
        xyz = xyz.at[..., 0].multiply(-1)
    return jnp.concatenate([xyz, points[..., 3:]], -1)


def boxes_mapping_back(boxes, transform):
    """bbox3d_mapping_back (merge_augs.py via bbox3d_mapping_back):
    un-flip (involutive; lidar conventions of core/boxes.py) then
    un-scale. boxes [..., 7] lidar bottom-center."""
    b = boxes
    if transform['h_flip']:
        b = b.at[..., 1].multiply(-1)
        b = b.at[..., 6].multiply(-1)
    if transform['v_flip']:
        b = b.at[..., 0].multiply(-1)
        b = b.at[..., 6].set(-(b[..., 6] + np.pi))
    return b.at[..., :6].divide(transform['scale'])


def merge_aug_detections(aug_dets, transforms, num_classes, nms_thr=0.2,
                         max_num=512):
    """Merge per-variant detections for ONE sample.

    Args:
        aug_dets: list (len A) of dicts with boxes [K, 7], scores [K],
            labels [K], valid [K] — decoded in the AUGMENTED frame.
        transforms: matching list of transform dicts.

    Returns dict(boxes [max_num, 7], scores, labels, valid).
    """
    boxes = jnp.concatenate([
        boxes_mapping_back(d['boxes'], t)
        for d, t in zip(aug_dets, transforms)])
    scores = jnp.concatenate([d['scores'] for d in aug_dets])
    labels = jnp.concatenate([d['labels'] for d in aug_dets])
    valid = jnp.concatenate([d['valid'] for d in aug_dets])

    N = boxes.shape[0]
    bev = boxes[:, [0, 1, 3, 4, 6]]
    keep = jnp.zeros((N,), bool)
    for cls in range(num_classes):
        sel = valid & (labels == cls)
        _, k = nms_bev(bev, scores, nms_thr, valid=sel)
        keep = keep | (k & sel)

    order = jnp.argsort(jnp.where(keep, -scores, jnp.inf))[:max_num]
    kept = keep[order]
    return dict(boxes=boxes[order],
                scores=jnp.where(kept, scores[order], 0.0),
                labels=labels[order], valid=kept)
