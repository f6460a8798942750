"""High-level inference APIs.

Equivalents of /root/reference/mmdet3d/apis/inference.py: build a model
from a config + checkpoint and run single-cloud / batched inference.
"""
from __future__ import annotations

import numpy as np

from .config import Config
from .tools_lib import build_model_from_cfg, run_inference


def init_model(config, checkpoint=None):
    """Config path (or Config) + checkpoint dir -> (model, model_cfg,
    state) (apis/inference.init_model:38)."""
    if isinstance(config, str):
        config = Config.fromfile(config)
    model, model_cfg, state = build_model_from_cfg(config, checkpoint)
    return model, model_cfg, state, config


def inference_detector(model_bundle, points):
    """Run the GGA detector on a single point cloud
    (apis/inference.inference_detector:81).

    Args:
        model_bundle: output of ``init_model``.
        points: [P, 4] numpy lidar points.

    Returns:
        dict(boxes_3d [n, 7], scores_3d [n], labels_3d [n]).
    """
    import jax
    import jax.numpy as jnp

    from .models.detectors.centerpoint_gga import decode_detections

    model, model_cfg, state, cfg = model_bundle
    max_points = cfg.data.max_points
    pts = np.zeros((1, max_points, 4), np.float32)
    val = np.zeros((1, max_points), bool)
    n = min(len(points), max_points)
    pts[0, :n] = points[:n, :4]
    val[0, :n] = True
    variables = jax.device_put(
        {'params': state.params, 'batch_stats': state.batch_stats})
    infer = jax.jit(lambda v, p, m: decode_detections(
        model_cfg, model.apply(v, p, m, train=False)))
    out = jax.device_get(infer(variables, jnp.asarray(pts),
                               jnp.asarray(val)))
    v = out['valid'][0]
    return dict(boxes_3d=out['boxes'][0][v], scores_3d=out['scores'][0][v],
                labels_3d=out['labels'][0][v])


def single_device_test(model_bundle, infos, batch_size=8):
    """Batched inference over a list of scene infos
    (apis/test.single_gpu_test:12 equivalent)."""
    model, model_cfg, state, cfg = model_bundle
    return run_inference(model, model_cfg, state, cfg, infos, batch_size)


def aug_inference_detector(model_bundle, points, scales=(0.95, 1.0, 1.05),
                           flip=True, nms_thr=0.2, max_num=512):
    """Test-time-augmented inference on one point cloud: the aug_test
    surface (detectors/centerpoint_gga.py:99 aug_test_pts +
    core/post_processing/merge_augs.py merge_aug_bboxes_3d) driven by
    MultiScaleFlipAug3D-style (scale x flip) variants.

    Each variant runs the SAME jitted forward (transform applied to the
    input points, boxes mapped back on device), so TTA costs A extra
    launches of one compiled program, not A compilations.
    """
    import jax
    import jax.numpy as jnp

    from .core.merge_augs import (augment_points, merge_aug_detections,
                                  tta_transforms)
    from .models.detectors.centerpoint_gga import decode_detections

    model, model_cfg, state, cfg = model_bundle
    transforms = tta_transforms(scales=scales, flip=flip)
    max_points = cfg.data.max_points
    pts = np.zeros((1, max_points, 4), np.float32)
    val = np.zeros((1, max_points), bool)
    n = min(len(points), max_points)
    pts[0, :n] = points[:n, :4]
    val[0, :n] = True
    variables = jax.device_put(
        {'params': state.params, 'batch_stats': state.batch_stats})

    @jax.jit
    def infer(v, p, m):
        return decode_detections(model_cfg, model.apply(v, p, m,
                                                        train=False))

    aug_dets = []
    for t in transforms:
        p_aug = augment_points(jnp.asarray(pts), t)
        out = infer(variables, p_aug, jnp.asarray(val))
        aug_dets.append({k: out[k][0] for k in
                         ('boxes', 'scores', 'labels', 'valid')})
    num_classes = len(model_cfg.tasks)
    merged = jax.device_get(merge_aug_detections(
        aug_dets, transforms, num_classes, nms_thr=nms_thr,
        max_num=max_num))
    v = merged['valid']
    return dict(boxes_3d=merged['boxes'][v],
                scores_3d=merged['scores'][v],
                labels_3d=merged['labels'][v])
