"""PartA2 two-stage detector: SparseUNet, RoI-aware pooling, train step,
decode — tiny config on the CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gga_tpu.models.detectors.parta2 import (PartA2Config, PartA2Detector,
                                             decode_parta2, parta2_loss)
from gga_tpu.ops.roiaware_pool import roiaware_pool3d


def _scene(rng, B=2, P=2000, G=4):
    x = rng.uniform(2, 60, (B, P, 1))
    y = rng.uniform(-0.5, 0.5, (B, P, 1)) * (x * 0.8 + 5)
    z = rng.uniform(-2.0, 0.5, (B, P, 1))
    pts = np.concatenate([x, y, z, rng.rand(B, P, 1)], -1).astype(
        np.float32)
    pv = np.ones((B, P), bool)
    gt = np.zeros((B, G, 7), np.float32)
    gt[..., 0] = rng.uniform(10, 50, (B, G))
    gt[..., 1] = rng.uniform(-10, 10, (B, G))
    gt[..., 2] = -1.8
    gt[..., 3] = 3.9
    gt[..., 4] = 1.6
    gt[..., 5] = 1.56
    gt[..., 6] = rng.uniform(-np.pi, np.pi, (B, G))
    gl = np.full((B, G), 2, np.int32)
    gv = np.ones((B, G), bool)
    return (jnp.asarray(pts), jnp.asarray(pv), jnp.asarray(gt),
            jnp.asarray(gl), jnp.asarray(gv))


def test_roiaware_pool3d_semantics():
    rng = np.random.RandomState(0)
    # one axis-aligned roi at origin; points in known cells
    rois = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]])
    pts = jnp.asarray([
        [-0.99, -0.99, 0.01],     # cell (0, 0, 0)
        [0.99, 0.99, 1.99],       # cell (S-1, S-1, S-1)
        [5.0, 5.0, 5.0],          # outside
    ])
    feats = jnp.asarray([[1.0, 2.0], [3.0, 4.0], [9.0, 9.0]])
    valid = jnp.ones((3,), bool)
    pooled, occ = roiaware_pool3d(feats, pts, valid, rois, out_size=4,
                                  mode='max', pts_budget=8)
    assert pooled.shape == (1, 4, 4, 4, 2)
    assert occ[0, 0, 0, 0] and occ[0, 3, 3, 3]
    assert occ.sum() == 2
    np.testing.assert_allclose(pooled[0, 0, 0, 0], [1.0, 2.0])
    np.testing.assert_allclose(pooled[0, 3, 3, 3], [3.0, 4.0])
    # avg mode averages points sharing a cell
    feats2 = jnp.asarray([[2.0, 0.0], [4.0, 0.0], [0.0, 0.0]])
    pts2 = jnp.asarray([[-0.9, -0.9, 0.1], [-0.95, -0.95, 0.05],
                        [5.0, 5.0, 5.0]])
    pooled2, _ = roiaware_pool3d(feats2, pts2, valid, rois, out_size=4,
                                 mode='avg', pts_budget=8)
    np.testing.assert_allclose(pooled2[0, 0, 0, 0], [3.0, 0.0])


@pytest.fixture(scope='module')
def parta2_setup():
    cfg = PartA2Config.tiny()
    model = PartA2Detector(cfg)
    rng = np.random.RandomState(0)
    pts, pv, gt, gl, gv = _scene(rng)
    variables = model.init(
        {'params': jax.random.PRNGKey(0)},
        pts, pv, jax.random.PRNGKey(1), gt, gl, gv, train=True)
    return cfg, model, variables, (pts, pv, gt, gl, gv)


def test_parta2_train_step(parta2_setup):
    cfg, model, variables, (pts, pv, gt, gl, gv) = parta2_setup

    @jax.jit
    def loss_fn(params):
        out, upd = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            pts, pv, jax.random.PRNGKey(1), gt, gl, gv, train=True,
            mutable=['batch_stats'])
        total, logs = parta2_loss(cfg, out, gt, gl, gv)
        return total, logs

    (total, logs), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(variables['params'])
    assert np.isfinite(float(total)), logs
    for k in ('loss_rpn', 'loss_seg', 'loss_part', 'loss_rcnn'):
        assert np.isfinite(float(logs[k])), k
    gnorm = float(
        jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                     for g in jax.tree.leaves(grads))))
    assert np.isfinite(gnorm) and gnorm > 0


def test_parta2_inference_decode(parta2_setup):
    cfg, model, variables, (pts, pv, gt, gl, gv) = parta2_setup
    out = model.apply(variables, pts, pv, None, None, None, None,
                      train=False)
    dets = decode_parta2(cfg, out)
    assert dets['boxes'].shape[-1] == 7
    assert np.isfinite(np.asarray(dets['boxes'])).all()
    assert dets['scores'].shape == dets['labels'].shape
