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


def inference_multi_modality_detector(model, model_cfg, variables, points,
                                      img, lidar2img, max_points=2048):
    """Run a points+image detector (MVXNet) on one sample
    (apis/inference.inference_multi_modality_detector:155).

    Args:
        model/model_cfg/variables: an MVXNet bundle (models.builder).
        points: [P, 4]; img: [H, W, 3]; lidar2img: [4, 4].
    """
    import jax
    import jax.numpy as jnp

    from .models.dense_heads.anchor3d_head import decode, make_anchors

    P = max_points
    pts = np.zeros((1, P, 4), np.float32)
    val = np.zeros((1, P), bool)
    n = min(len(points), P)
    pts[0, :n] = points[:n, :4]
    val[0, :n] = True

    @jax.jit
    def infer(v, p, m, im, l2i):
        preds = model.apply(v, p, m, im, l2i, train=False)
        H, W = preds['cls'].shape[1:3]
        anchors = make_anchors(model_cfg.head, (H, W))
        return decode(model_cfg.head, preds, anchors)

    out = jax.device_get(infer(
        jax.device_put(variables), jnp.asarray(pts), jnp.asarray(val),
        jnp.asarray(img[None]), jnp.asarray(lidar2img[None])))
    v = out['valid'][0]
    return dict(boxes_3d=out['boxes'][0][v],
                scores_3d=out['scores'][0][v],
                labels_3d=out['labels'][0][v])


def inference_mono_3d_detector(model, model_cfg, variables, img, cam2img):
    """Run a monocular detector (SMOKE / MonoFlex) on one image
    (apis/inference.inference_mono_3d_detector:230)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def infer(v, im, k):
        preds = model.apply(v, im, train=False)
        if hasattr(model, 'decode'):
            return model.decode(preds, k)
        raise AttributeError('model has no decode()')

    out = jax.device_get(infer(jax.device_put(variables),
                               jnp.asarray(img[None]),
                               jnp.asarray(cam2img[None])))
    keep = out.get('valid', out['scores'] > 0.25)[0]
    return dict(boxes_3d=out['boxes'][0][keep],
                scores_3d=out['scores'][0][keep],
                labels_3d=out['labels'][0][keep])


def inference_segmentor(model, variables, points, max_points=40000):
    """Run a 3D segmentor on one cloud
    (apis/inference.inference_segmentor:289). Returns per-point labels
    for the first len(points) entries."""
    import jax
    import jax.numpy as jnp

    P = max_points
    pts = np.zeros((1, P, points.shape[1]), np.float32)
    val = np.zeros((1, P), bool)
    n = min(len(points), P)
    pts[0, :n] = points[:n]
    val[0, :n] = True

    @jax.jit
    def infer(v, p, m):
        logits = model.apply(v, p, m, train=False)
        return jnp.argmax(logits, -1)

    lab = jax.device_get(infer(jax.device_put(variables),
                               jnp.asarray(pts), jnp.asarray(val)))
    return lab[0, :n]
