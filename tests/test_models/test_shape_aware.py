"""ShapeAwareHead (SSN): per-group resolutions, per-class anchors,
loss + decode."""
import jax
import jax.numpy as jnp
import numpy as np

from gga_tpu.models.dense_heads.shape_aware_head import (
    ShapeAwareConfig, ShapeAwareHead, ShapeTask, decode_shape_aware,
    shape_aware_anchors, shape_aware_loss)


def _cfg():
    return ShapeAwareConfig(
        num_classes=3,
        tasks=(ShapeTask(2, (8, 8), (1, 1)), ShapeTask(1, (8,), (2,))),
        bev_range=(0, -16, 32, 16), nms_pre=32, max_num=16)


def test_shape_aware_forward_and_anchor_resolutions():
    cfg = _cfg()
    model = ShapeAwareHead(cfg)
    x = jnp.zeros((2, 16, 16, 8))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    outs = model.apply(variables, x, train=False)
    assert len(outs) == 2
    assert outs[0]['cls'].shape == (2, 16, 16, 2 * 2)   # R * classes
    assert outs[1]['cls'].shape == (2, 8, 8, 2 * 1)     # strided group
    anchors = shape_aware_anchors(cfg, [(16, 16), (8, 8)])
    assert anchors[0].shape == (16 * 16 * 2, 7)
    assert anchors[2].shape == (8 * 8 * 2, 7)           # large class


def test_shape_aware_loss_and_decode():
    cfg = _cfg()
    model = ShapeAwareHead(cfg)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16, 8), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    # GTs sit on anchor centers (car grid 4 m cells at (2+4k, -14+4k);
    # ped grid 2 m cells at (1+2k, -15+2k))
    gt = jnp.asarray(np.tile(
        [[10.0, -2.0, -2.5, 3.9, 1.6, 1.56, 0.0],
         [21.0, 3.0, -1.2, 0.8, 0.6, 1.73, 0.0]], (2, 1, 1)),
        jnp.float32)
    gl = jnp.asarray([[2, 0]] * 2, jnp.int32)
    gv = jnp.ones((2, 2), bool)
    anchors = shape_aware_anchors(cfg, [(16, 16), (8, 8)])

    def loss_fn(params):
        outs, _ = model.apply(
            {'params': params,
             'batch_stats': variables['batch_stats']},
            x, train=True, mutable=['batch_stats'])
        return shape_aware_loss(cfg, outs, anchors, gt, gl, gv)

    (total, logs), grads = jax.jit(
        lambda p: jax.value_and_grad(loss_fn, has_aux=True)(p))(
        variables['params'])
    assert np.isfinite(float(total)), logs
    assert all(np.all(np.isfinite(np.asarray(g)))
               for g in jax.tree_util.tree_leaves(grads))
    assert float(logs['loss_bbox']) > 0

    outs = model.apply(variables, x, train=False)
    det = jax.jit(lambda o: decode_shape_aware(cfg, o, anchors))(outs)
    assert det['boxes'].shape == (2, 16, 7)
    assert det['labels'].max() <= 2
