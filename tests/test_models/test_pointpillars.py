"""PointPillars + Anchor3DHead family tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gga_tpu.core.coders import delta_decode, delta_encode
from gga_tpu.models.dense_heads import anchor3d_head as ah
from gga_tpu.models.detectors.voxelnet import (PointPillars,
                                               PointPillarsConfig)


def test_delta_coder_roundtrip():
    rng = np.random.RandomState(0)
    anchors = np.concatenate([
        rng.uniform(0, 60, (16, 2)), rng.uniform(-2, 0, (16, 1)),
        rng.uniform(1, 4, (16, 3)), rng.uniform(-1, 1, (16, 1))],
        1).astype(np.float32)
    boxes = anchors + rng.randn(16, 7).astype(np.float32) * 0.2
    boxes[:, 3:6] = np.abs(boxes[:, 3:6]) + 0.5
    enc = delta_encode(jnp.asarray(boxes), jnp.asarray(anchors))
    dec = np.asarray(delta_decode(enc, jnp.asarray(anchors)))
    np.testing.assert_allclose(dec, boxes, atol=1e-4)


def test_anchor_assignment():
    cfg = ah.Anchor3DConfig()
    # fine enough grid that a GT actually overlaps its nearest anchor
    anchors = ah.make_anchors(cfg, (64, 128))
    assert anchors.shape == (3, 64 * 128 * 2, 7)
    gt = np.zeros((4, 7), np.float32)
    # anchor-center aligned: xs=(i+.5)*0.54 (i=55), ys=-39.68+(j+.5)*1.24
    gt[0] = [29.97, 0.62, -1.78, 3.9, 1.6, 1.56, 0.05]
    labels = np.array([2, -1, -1, -1])
    valid = np.array([True, False, False, False])
    t = ah.assign_targets(cfg, anchors, jnp.asarray(gt),
                          jnp.asarray(labels), jnp.asarray(valid))
    assert int(t['pos_mask'].sum()) >= 1  # at least the force-match
    pos = np.asarray(t['pos_mask'])
    lab = np.asarray(t['labels'])
    assert (lab[pos] == 2).all()  # positives carry the car class
    # positives live in the car anchor block (last third)
    A = anchors.shape[1]
    assert np.where(pos)[0].min() >= 2 * A


@pytest.fixture(scope='module')
def pp_setup():
    cfg = PointPillarsConfig.tiny()
    model = PointPillars(cfg)
    rng = np.random.RandomState(0)
    B, P = 2, 2048
    pts = np.concatenate([
        rng.uniform(0, 69, (B, P, 1)), rng.uniform(-39, 39, (B, P, 1)),
        rng.uniform(-2.5, 0.5, (B, P, 1)), rng.rand(B, P, 1)],
        -1).astype(np.float32)
    valid = np.ones((B, P), bool)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                           jnp.asarray(valid), train=False)
    return cfg, model, variables, (jnp.asarray(pts), jnp.asarray(valid))


def test_pointpillars_forward(pp_setup):
    cfg, model, variables, inputs = pp_setup
    preds = model.apply(variables, *inputs, train=False)
    H = cfg.scatter_shape[0] // 2  # first backbone stride 2
    assert preds['cls'].shape == (2, H, cfg.scatter_shape[1] // 2, 6 * 3)
    assert preds['reg'].shape[-1] == 6 * 7
    assert np.isfinite(np.asarray(preds['cls'])).all()


def test_pointpillars_loss_and_grads(pp_setup):
    cfg, model, variables, inputs = pp_setup
    preds = model.apply(variables, *inputs, train=False)
    fsz = preds['cls'].shape[1:3]
    anchors = ah.make_anchors(cfg.head, fsz)

    gt = np.zeros((2, 8, 7), np.float32)
    # aligned with the tiny 64x56 anchor grid (1.28 m spacing)
    gt[:, 0] = [30.08, 0.64, -1.78, 3.9, 1.6, 1.56, 0.0]
    gt[:, 1] = [13.44, -19.84, -0.6, 0.8, 0.6, 1.73, 1.5707963]
    labels = np.full((2, 8), -1, np.int32)
    labels[:, :2] = [2, 0]
    valid = np.zeros((2, 8), bool)
    valid[:, :2] = True
    targets = jax.vmap(lambda b, l, v: ah.assign_targets(
        cfg.head, anchors, b, l, v))(jnp.asarray(gt), jnp.asarray(labels),
                                     jnp.asarray(valid))

    def loss_fn(params):
        preds, _ = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            *inputs, train=True, mutable=['batch_stats'])
        total, logs = ah.loss(cfg.head, preds, anchors, targets)
        return total, logs

    (total, logs), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(variables['params'])
    assert np.isfinite(float(total))
    assert int(logs['num_pos']) >= 4  # 2 objs x 2 scenes (+ force matches)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)


def test_pointpillars_decode(pp_setup):
    cfg, model, variables, inputs = pp_setup
    preds = model.apply(variables, *inputs, train=False)
    anchors = ah.make_anchors(cfg.head, preds['cls'].shape[1:3])
    dets = ah.decode(cfg.head, preds, anchors)
    K = 3 * cfg.head.max_num
    assert dets['boxes'].shape == (2, K, 7)
    assert np.isfinite(np.asarray(dets['boxes'])).all()
