"""Supervised CenterPoint (nuScenes-style): targets, train step with
finite grads, velocity decode."""
import jax
import jax.numpy as jnp
import numpy as np

from gga_tpu.models.dense_heads.centerpoint_head import (
    centerpoint_targets_single)
from gga_tpu.models.detectors.centerpoint import (CenterPointConfig,
                                                  CenterPointDetector,
                                                  centerpoint_loss,
                                                  decode_centerpoint)


def test_targets_single_semantics():
    cfg = CenterPointConfig.tiny()
    gt = jnp.asarray([[4.0, -2.0, -1.5, 4.0, 1.8, 1.5, 0.3, 1.0, 0.5]])
    t = centerpoint_targets_single(
        gt, jnp.asarray([1]), jnp.asarray([True]),
        task_classes=(1, 1), feat_hw=(8, 8),
        voxel_size=cfg.voxel_size, pc_range=cfg.point_cloud_range,
        out_size_factor=cfg.out_size_factor, with_velocity=True)
    # label 1 -> second task only
    assert float(t[0]['heatmap'].max()) == 0.0
    assert float(t[1]['heatmap'].max()) == 1.0
    assert bool(t[1]['mask'][0])
    # anno_box: gravity z, log dims, sin/cos, velocity
    ab = np.asarray(t[1]['anno_box'][0])
    assert abs(ab[2] - (-0.75)) < 1e-5          # z + h/2
    np.testing.assert_allclose(ab[3:6], np.log([4.0, 1.8, 1.5]),
                               atol=1e-5)
    np.testing.assert_allclose(ab[6:8], [np.sin(0.3), np.cos(0.3)],
                               atol=1e-6)
    np.testing.assert_allclose(ab[8:10], [1.0, 0.5], atol=1e-6)


def test_centerpoint_train_step_and_decode():
    rng = np.random.RandomState(0)
    B, P, G = 2, 1024, 4
    pts = rng.uniform(-20, 20, (B, P, 5)).astype(np.float32)
    gt = np.zeros((B, G, 9), np.float32)
    gt[..., 0] = rng.uniform(-15, 15, (B, G))
    gt[..., 1] = rng.uniform(-15, 15, (B, G))
    gt[..., 2] = -1.5
    gt[..., 3:6] = [4.0, 1.8, 1.5]
    gt[..., 6] = rng.uniform(-np.pi, np.pi, (B, G))
    for b in range(B):
        for g in range(G):
            pts[b, g * 50:(g + 1) * 50, :3] = (
                gt[b, g, :3] + rng.uniform(-0.45, 0.45, (50, 3))
                * gt[b, g, 3:6] + [0, 0, gt[b, g, 5] / 2])
    pts, pv = jnp.asarray(pts), jnp.ones((B, P), bool)
    gt = jnp.asarray(gt)
    gl = jnp.asarray(rng.randint(0, 2, (B, G)), jnp.int32)
    gv = jnp.ones((B, G), bool)

    cfg = CenterPointConfig.tiny()
    model = CenterPointDetector(cfg)
    variables = model.init(jax.random.PRNGKey(0), pts, pv, train=False)

    def loss_fn(params):
        preds, _ = model.apply(
            {'params': params,
             'batch_stats': variables['batch_stats']},
            pts, pv, train=True,
            mutable=['batch_stats', 'diagnostics'])
        return centerpoint_loss(cfg, preds, gt, gl, gv)

    (total, logs), grads = jax.jit(
        lambda p: jax.value_and_grad(loss_fn, has_aux=True)(p))(
        variables['params'])
    assert np.isfinite(float(total)), logs
    assert all(np.all(np.isfinite(np.asarray(g)))
               for g in jax.tree_util.tree_leaves(grads))
    assert float(logs['task0.loss_heatmap']
                 + logs['task1.loss_heatmap']) > 0

    preds = model.apply(variables, pts, pv, train=False)
    det = jax.jit(lambda p: decode_centerpoint(cfg, p))(preds)
    assert det['boxes'].shape[-1] == 9          # velocity decoded
    assert det['labels'].max() <= 1
