"""3DSSD: F-FPS/FS sampling semantics, head targets, train step with
finite grads, decode — tiny config on CPU."""
import jax
import jax.numpy as jnp
import numpy as np

from gga_tpu.models.backbones.pointnet2 import sample_points_multi_mode
from gga_tpu.models.dense_heads.ssd_3d_head import (SSD3DConfig,
                                                    _angle2class,
                                                    ssd3d_targets_single)
from gga_tpu.models.detectors.ssd3d import (SSD3DNetConfig, SSD3DNet)
from gga_tpu.models.dense_heads.ssd_3d_head import (decode_ssd3d,
                                                    ssd3d_loss)


def test_fs_sampling_order_and_ranges():
    rng = np.random.RandomState(0)
    N = 64
    xyz = jnp.asarray(rng.randn(N, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(N, 8).astype(np.float32))
    valid = jnp.ones(N, bool)
    # FS: F-FPS half first, then D-FPS half, each npoint long
    idx = sample_points_multi_mode(xyz, feats, valid, (8,), ('FS',),
                                   (-1,))
    assert idx.shape == (16,)
    # two-segment F-FPS/D-FPS with ranges (32, -1): first 8 indices come
    # from [0, 32), last 8 from [32, 64)
    idx2 = sample_points_multi_mode(xyz, feats, valid, (8, 8),
                                    ('F-FPS', 'D-FPS'), (32, -1))
    assert idx2.shape == (16,)
    assert np.asarray(idx2[:8]).max() < 32
    assert np.asarray(idx2[8:]).min() >= 32


def test_angle2class_roundtrip():
    yaw = jnp.asarray(np.linspace(-np.pi + 0.01, np.pi - 0.01, 50))
    cls, res = _angle2class(yaw, 12)
    bin_w = 2 * np.pi / 12
    rec = cls * bin_w + res
    rec = jnp.where(rec > np.pi, rec - 2 * np.pi, rec)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(yaw),
                               atol=1e-5)


def test_ssd3d_targets_centerness():
    cfg = SSD3DConfig(num_classes=1)
    gt = jnp.asarray([[10.0, 0.0, -1.0, 4.0, 2.0, 2.0, 0.0]])
    # proposal exactly at the gravity center -> centerness 1
    agg = jnp.asarray([[10.0, 0.0, 0.0], [11.9, 0.9, 0.9],
                       [40.0, 0.0, 0.0]])
    t = ssd3d_targets_single(cfg, gt, jnp.zeros(1, jnp.int32),
                             jnp.ones(1, bool), agg, agg)
    ctr = np.asarray(t['centerness_targets'][:, 0])
    assert ctr[0] > 0.99
    assert ctr[1] < ctr[0]
    assert list(np.asarray(t['positive'])) == [True, True, False]
    assert list(np.asarray(t['negative'])) == [False, False, True]
    # vote target points at the gravity center
    np.testing.assert_allclose(np.asarray(t['vote_targets'][0]),
                               [0.0, 0.0, 0.0], atol=1e-6)


def test_ssd3d_train_step_and_decode():
    rng = np.random.RandomState(1)
    B, P, G = 2, 256, 3
    pts = rng.uniform(0, 40, (B, P, 4)).astype(np.float32)
    gt = np.zeros((B, G, 7), np.float32)
    gt[..., 0] = rng.uniform(10, 30, (B, G))
    gt[..., 1] = rng.uniform(-8, 8, (B, G))
    gt[..., 2] = -1.8
    gt[..., 3:6] = [3.9, 1.6, 1.56]
    gt[..., 6] = rng.uniform(-np.pi, np.pi, (B, G))
    for b in range(B):
        for g in range(G):
            pts[b, g * 30:(g + 1) * 30, :3] = (
                gt[b, g, :3] + rng.uniform(-0.45, 0.45, (30, 3))
                * gt[b, g, 3:6] + [0, 0, gt[b, g, 5] / 2])
    pts, pv = jnp.asarray(pts), jnp.ones((B, P), bool)
    gt, gl = jnp.asarray(gt), jnp.zeros((B, G), jnp.int32)
    gv = jnp.ones((B, G), bool)

    cfg = SSD3DNetConfig.tiny()
    model = SSD3DNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), pts, pv, train=True)

    def loss_fn(params):
        preds, _ = model.apply(
            {'params': params,
             'batch_stats': variables['batch_stats']},
            pts, pv, train=True, mutable=['batch_stats'])
        return ssd3d_loss(cfg.head, preds, gt, gl, gv)

    (total, logs), grads = jax.jit(
        lambda p: jax.value_and_grad(loss_fn, has_aux=True)(p))(
        variables['params'])
    assert np.isfinite(float(total)), logs
    assert all(np.all(np.isfinite(np.asarray(g)))
               for g in jax.tree_util.tree_leaves(grads))
    assert float(logs['vote_loss']) >= 0

    preds = model.apply(variables, pts, pv, train=False)
    det = jax.jit(lambda p: decode_ssd3d(cfg.head, p))(preds)
    assert det['boxes'].shape == (B, cfg.head.max_out, 7)
    assert bool(jnp.all(det['boxes'][..., 3:6] >= 0.1))
