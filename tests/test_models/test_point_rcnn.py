"""PointRCNN: roipoint pooling semantics, PointXYZWHLR coder, RPN
targets, train step with finite grads, decode — tiny config on CPU."""
import jax
import jax.numpy as jnp
import numpy as np

from gga_tpu.core.coders import (point_xyzwhlr_decode,
                                 point_xyzwhlr_encode)
from gga_tpu.models.dense_heads.point_rpn_head import (PointRPNConfig,
                                                       rpn_targets_single)
from gga_tpu.models.detectors.point_rcnn import (PointRCNNConfig,
                                                 PointRCNNDetector,
                                                 decode_point_rcnn,
                                                 point_rcnn_loss)
from gga_tpu.ops.roipoint_pool import roipoint_pool3d


def _scene(rng, B=2, P=512, G=4):
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
    gt[..., 3:6] = [3.9, 1.6, 1.56]
    gt[..., 6] = rng.uniform(-np.pi, np.pi, (B, G))
    # drop some in-box surface points so positives exist
    for b in range(B):
        for g in range(G):
            pts[b, g * 40:(g + 1) * 40, :3] = (
                gt[b, g, :3] + rng.uniform(-0.5, 0.5, (40, 3))
                * gt[b, g, 3:6] * 0.45 + [0, 0, gt[b, g, 5] / 2])
    gl = np.full((B, G), 0, np.int32)
    gv = np.ones((B, G), bool)
    return (jnp.asarray(pts), jnp.asarray(pv), jnp.asarray(gt),
            jnp.asarray(gl), jnp.asarray(gv))


def test_roipoint_pool3d_semantics():
    # one box at origin, 3 in-box points, 5 sampled slots -> cyclic dup
    rois = jnp.asarray([[0.0, 0.0, -1.0, 4.0, 2.0, 2.0, 0.0],
                        [50.0, 50.0, 0.0, 1.0, 1.0, 1.0, 0.0]])
    pts = jnp.asarray([[1.0, 0.5, 0.0], [-1.0, -0.5, -0.5],
                       [0.0, 0.0, 0.5], [30.0, 0.0, 0.0]])
    feats = jnp.arange(4, dtype=jnp.float32)[:, None]
    valid = jnp.ones(4, bool)
    pooled, empty = roipoint_pool3d(pts, feats, valid, rois,
                                    num_sampled=5)
    assert not bool(empty[0]) and bool(empty[1])
    # first 3 slots are the in-box points in order, then cyclic repeat
    np.testing.assert_allclose(pooled[0, :, 3], [0, 1, 2, 0, 1])
    # canonical xyz of point 0 relative to roi center
    np.testing.assert_allclose(pooled[0, 0, :3], [1.0, 0.5, 1.0],
                               atol=1e-6)
    assert float(jnp.abs(pooled[1]).max()) == 0.0


def test_roipoint_pool3d_rotated_canonical():
    yaw = np.pi / 2
    rois = jnp.asarray([[10.0, 0.0, 0.0, 4.0, 2.0, 2.0, yaw]])
    # a point 1m "ahead" of the box along its local x (world +y)
    pts = jnp.asarray([[10.0, 1.0, 0.5]])
    pooled, empty = roipoint_pool3d(pts, jnp.zeros((1, 1)),
                                    jnp.ones(1, bool), rois,
                                    num_sampled=2)
    assert not bool(empty[0])
    np.testing.assert_allclose(pooled[0, 0, :3], [1.0, 0.0, 0.5],
                               atol=1e-5)


def test_point_xyzwhlr_coder_roundtrip():
    rng = np.random.RandomState(0)
    ms = ((3.9, 1.6, 1.56), (0.8, 0.6, 1.73))
    gt = rng.uniform(0.5, 5, (16, 7)).astype(np.float32)
    gt[:, 6] = rng.uniform(-np.pi / 2, np.pi / 2, 16)
    pts = rng.uniform(-5, 5, (16, 3)).astype(np.float32)
    lab = rng.randint(0, 2, 16)
    enc = point_xyzwhlr_encode(jnp.asarray(gt), jnp.asarray(pts),
                               jnp.asarray(lab), ms)
    dec = point_xyzwhlr_decode(enc, jnp.asarray(pts), jnp.asarray(lab),
                               ms)
    np.testing.assert_allclose(np.asarray(dec), gt, atol=1e-4)


def test_rpn_targets_membership():
    cfg = PointRPNConfig()
    gt = jnp.asarray([[10.0, 0.0, -1.0, 4.0, 2.0, 2.0, 0.0]])
    pts = jnp.asarray([
        [10.0, 0.0, 0.0],     # inside
        [10.0, 1.04, 0.0],    # in enlarged margin only (0.1m)
        [30.0, 0.0, 0.0]])    # far away
    t = rpn_targets_single(cfg, pts, jnp.ones(3, bool), gt,
                           jnp.zeros(1, jnp.int32), jnp.ones(1, bool))
    assert list(np.asarray(t['positive'])) == [True, False, False]
    assert list(np.asarray(t['negative'])) == [False, False, True]
    # encoded target for the inside point decodes back to the gt box
    dec = point_xyzwhlr_decode(t['bbox_targets'][0], pts[0],
                               t['mask_targets'][0], cfg.mean_sizes)
    np.testing.assert_allclose(
        np.asarray(dec), [10.0, 0.0, 0.0, 4.0, 2.0, 2.0, 0.0], atol=1e-5)


def test_point_rcnn_train_step_and_decode():
    rng = np.random.RandomState(1)
    pts, pv, gt, gl, gv = _scene(rng)
    cfg = PointRCNNConfig.tiny()
    model = PointRCNNDetector(cfg)
    key = jax.random.PRNGKey(0)
    variables = model.init(key, pts, pv, rng=key, gt_boxes=gt,
                           gt_labels=gl, gt_valid=gv, train=True)

    def loss_fn(params):
        out, mutated = model.apply(
            {'params': params,
             'batch_stats': variables['batch_stats']},
            pts, pv, rng=key, gt_boxes=gt, gt_labels=gl, gt_valid=gv,
            train=True, mutable=['batch_stats'],
            rngs={'dropout': key})
        total, logs = point_rcnn_loss(cfg, out, gt, gl, gv)
        return total, logs

    (total, logs), grads = jax.jit(
        lambda p: jax.value_and_grad(loss_fn, has_aux=True)(p))(
        variables['params'])
    assert np.isfinite(float(total)), logs
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert float(logs['rpn_bbox_loss']) > 0

    out = model.apply(variables, pts, pv, train=False)
    det = jax.jit(lambda o: decode_point_rcnn(cfg, o))(out)
    assert det['boxes'].shape[-1] == 7
    assert det['valid'].dtype == bool
