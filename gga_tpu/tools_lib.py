"""Shared helpers for the CLI tools: config -> model, checkpoint restore,
batched inference (the single_gpu_test / multi_gpu_test equivalent,
/root/reference/mmdet3d/apis/test.py:12)."""
from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from .data import pipelines as pl
from .models.builder import build_detector
from .models.detectors.centerpoint_gga import GGAModelConfig, decode_detections


def model_config_from_cfg(cfg) -> GGAModelConfig:
    _, mc = build_detector(cfg)
    return mc


def build_model_from_cfg(cfg, checkpoint_dir=None):
    """(model, model_cfg, state-like dict with params + batch_stats)."""
    from .train import checkpoints as ckpt
    from .train.loop import create_train_state
    from .train.optim import build_optimizer

    model, model_cfg = build_detector(cfg)
    dummy_p = np.zeros((1, 128, 4), np.float32)
    dummy_v = np.zeros((1, 128), bool)
    variables = model.init(jax.random.PRNGKey(0), dummy_p, dummy_v,
                           train=False)
    tx = build_optimizer(total_steps=1)
    state = create_train_state(model, variables, tx)
    if checkpoint_dir:
        state, ok = ckpt.resume_from(checkpoint_dir, state)
        if not ok:
            raise FileNotFoundError(
                f'no checkpoint found in {checkpoint_dir}')
    return model, model_cfg, state


def run_inference(model, model_cfg, state, cfg, infos, batch_size,
                  max_points=None):
    """Batched jitted inference over scenes -> per-scene detection dicts
    (boxes_3d [n, 7] lidar bottom-center, scores_3d, labels_3d)."""
    max_points = max_points or cfg.data.max_points
    # params passed as jit ARGUMENTS: closing over them bakes the weights
    # into the HLO as constants, which this environment re-uploads through
    # the compile relay on every call (~3 s/batch observed)
    variables = jax.device_put(
        {'params': state.params, 'batch_stats': state.batch_stats})

    @jax.jit
    def infer(v, points, points_valid):
        preds = model.apply(v, points, points_valid, train=False)
        return decode_detections(model_cfg, preds)

    detections = []
    n = len(infos)
    for i in range(0, n, batch_size):
        chunk = infos[i:i + batch_size]
        pts_b = np.zeros((batch_size, max_points, 4), np.float32)
        val_b = np.zeros((batch_size, max_points), bool)
        for j, info in enumerate(chunk):
            s = pl.load_sample(info, cfg.data_root,
                               pts_prefix=cfg.data.pts_prefix)
            s = pl.points_range_filter(s, cfg.point_cloud_range)
            p = s['points'][:max_points]
            pts_b[j, :len(p)] = p[:, :4]
            val_b[j, :len(p)] = True
        out = jax.device_get(infer(variables, jnp.asarray(pts_b),
                                   jnp.asarray(val_b)))
        for j in range(len(chunk)):
            v = out['valid'][j]
            detections.append(dict(
                boxes_3d=out['boxes'][j][v],
                scores_3d=out['scores'][j][v],
                labels_3d=out['labels'][j][v]))
        if (i // batch_size) % 20 == 0:
            print(f'  inference {i + len(chunk)}/{n}')
    return detections


def load_infos(cfg, name):
    with open(os.path.join(cfg.data_root, name), 'rb') as f:
        return pickle.load(f)
