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
