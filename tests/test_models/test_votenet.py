"""VoteNet forward/targets/loss/decode smoke (tiny)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gga_tpu.models.dense_heads import vote_head as vh
from gga_tpu.models.detectors.votenet import VoteNet, VoteNetConfig


@pytest.fixture(scope='module')
def vn_setup():
    cfg = VoteNetConfig.tiny()
    model = VoteNet(cfg)
    rng = np.random.RandomState(0)
    B, P = 2, 1024
    bg = rng.uniform(-3, 3, (B, P - 300, 3)) * [1, 1, 0.4]
    c1 = np.array([1.0, 1.0, 0.4]) + rng.randn(B, 150, 3) * 0.25
    c2 = np.array([-1.5, -1.0, 0.3]) + rng.randn(B, 150, 3) * 0.2
    xyz = np.concatenate([bg, c1, c2], 1).astype(np.float32)
    h = xyz[..., 2:3] + 1.0
    pts = np.concatenate([xyz, h], -1).astype(np.float32)
    valid = np.ones((B, P), bool)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                           jnp.asarray(valid), train=False)
    return cfg, model, variables, (jnp.asarray(pts), jnp.asarray(valid))


def _gt(cfg, B=2):
    M = cfg.head.max_objs
    gt = np.zeros((B, M, 7), np.float32)
    gt[:, 0] = [1.0, 1.0, 0.0, 1.2, 1.2, 0.9, 0.3]
    gt[:, 1] = [-1.5, -1.0, 0.0, 0.9, 0.9, 0.7, -0.4]
    labels = np.full((B, M), -1, np.int32)
    labels[:, :2] = [0, 2]
    valid = np.zeros((B, M), bool)
    valid[:, :2] = True
    return jnp.asarray(gt), jnp.asarray(labels), jnp.asarray(valid)


def test_forward_shapes(vn_setup):
    cfg, model, variables, inputs = vn_setup
    preds = model.apply(variables, *inputs, train=False)
    S = cfg.head.agg_num_point
    assert preds['obj'].shape == (2, S, 2)
    assert preds['center'].shape == (2, S, 3)
    assert preds['dir_cls'].shape == (2, S, cfg.head.num_dir_bins)
    assert preds['size_res_norm'].shape == (2, S, cfg.head.num_sizes, 3)
    assert np.isfinite(np.asarray(preds['center'])).all()


def test_targets_loss_grads(vn_setup):
    cfg, model, variables, inputs = vn_setup
    gt, labels, ovalid = _gt(cfg)

    def loss_fn(params):
        preds, _ = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            *inputs, train=True, mutable=['batch_stats'])
        targets = jax.vmap(lambda p, pv, ax, av, b, l, v: vh.build_targets(
            cfg.head, p, pv, ax, av, b, l, v))(
            preds['seed_xyz'], preds['seed_valid'], preds['agg_xyz'],
            preds['agg_valid'], gt, labels, ovalid)
        total, logs = vh.loss(cfg.head, preds, targets)
        return total, logs

    (total, logs), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(variables['params'])
    assert np.isfinite(float(total))
    for k in ('vote_loss', 'objectness_loss', 'center_loss',
              'dir_res_loss', 'size_res_loss', 'semantic_loss'):
        assert np.isfinite(float(logs[k])), k
    assert int(logs['num_pos']) > 0
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)


def test_decode(vn_setup):
    cfg, model, variables, inputs = vn_setup
    preds = model.apply(variables, *inputs, train=False)
    dets = vh.decode(cfg.head, preds)
    assert dets['boxes'].shape == (2, cfg.head.max_out, 7)
    assert np.isfinite(np.asarray(dets['boxes'])).all()
    assert (np.asarray(dets['boxes'])[..., 3:6] > 0).all()


def test_iou_loss_variant(vn_setup):
    """iou_loss_weight adds a finite, grad-carrying term
    (votenet_iouloss_8x8_scannet config)."""
    import dataclasses

    cfg, model, variables, inputs = vn_setup
    head = dataclasses.replace(cfg.head, iou_loss_weight=10.0 / 3.0)
    gt, labels, ovalid = _gt(cfg)
    preds = model.apply(variables, *inputs, train=False)
    targets = jax.vmap(lambda p, pv, ax, av, b, l, v: vh.build_targets(
        head, p, pv, ax, av, b, l, v))(
        preds['seed_xyz'], preds['seed_valid'], preds['agg_xyz'],
        preds['agg_valid'], gt, labels, ovalid)
    total, logs = vh.loss(head, preds, targets)
    assert 'iou_loss' in logs and np.isfinite(float(logs['iou_loss']))
    assert float(logs['iou_loss']) > 0
    base, _ = vh.loss(cfg.head, preds, targets)
    np.testing.assert_allclose(float(total),
                               float(base) + float(logs['iou_loss']),
                               rtol=1e-5)
