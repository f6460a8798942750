"""End-to-end forward/loss smoke for the GGA detector (tiny config, CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gga_tpu.models.dense_heads import centerpoint_head_gga as gga
from gga_tpu.models.detectors.centerpoint_gga import (GGAModelConfig,
                                                      GGADetector,
                                                      decode_detections)


@pytest.fixture(scope='module')
def tiny_setup():
    cfg = GGAModelConfig.tiny()
    model = GGADetector(cfg)
    rng = np.random.RandomState(0)
    B, P = 2, 1024
    pts = np.concatenate([
        rng.uniform(0, 70, (B, P, 1)), rng.uniform(-40, 40, (B, P, 1)),
        rng.uniform(-3, 1, (B, P, 1)), rng.rand(B, P, 1)],
        axis=-1).astype(np.float32)
    valid = np.ones((B, P), bool)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                           jnp.asarray(valid), train=False)
    return cfg, model, variables, jnp.asarray(pts), jnp.asarray(valid)


def test_forward_shapes(tiny_setup):
    cfg, model, variables, pts, valid = tiny_setup
    preds = model.apply(variables, pts, valid, train=False)
    assert len(preds) == 3
    W, H = cfg.head.feature_map_size
    for tp in preds:
        assert tp['heatmap'].shape == (2, H, W, 1)
        assert tp['reg'].shape == (2, H, W, 2)
        assert tp['height'].shape == (2, H, W, 1)
        assert tp['dim'].shape == (2, H, W, 3)
        assert tp['rot'].shape == (2, H, W, 2)
        assert np.isfinite(np.asarray(tp['heatmap'])).all()


def _fake_gga_batch(cfg, B=2):
    M = cfg.head.max_objs
    rng = np.random.RandomState(1)
    labels = np.full((B, M), -1, np.int32)
    labels[:, :6] = rng.randint(0, 3, (B, 6))
    valid = np.zeros((B, M), bool)
    valid[:, :6] = True
    pseudo = np.zeros((B, M, 7), np.float32)
    pseudo[:, :6, 0] = rng.uniform(5, 60, (B, 6))
    pseudo[:, :6, 1] = rng.uniform(-30, 30, (B, 6))
    pseudo[:, :6, 2] = -1.0
    pseudo[:, :6, 3:6] = rng.uniform(8, 16, (B, 6, 3))  # big => radius > 0
    boxes_img = np.zeros((B, M, 4), np.float32)
    boxes_img[:, :6] = np.stack([
        rng.uniform(0, 500, (B, 6)), rng.uniform(0, 200, (B, 6)),
        rng.uniform(600, 1200, (B, 6)), rng.uniform(250, 370, (B, 6))], -1)
    bdry = np.zeros((B, M, 4), bool)
    l2i = np.broadcast_to(np.eye(4, dtype=np.float32), (B, M, 4, 4)).copy()
    l2i[..., 0, 0] = 700; l2i[..., 1, 1] = 700
    l2i[..., 0, 2] = 600; l2i[..., 1, 2] = 180
    ibp = rng.uniform(0, 60, (B, M, 32, 2)).astype(np.float32)
    ibp_valid = np.zeros((B, M, 32), bool)
    ibp_valid[:, :6, :8] = True
    return (jnp.asarray(labels), jnp.asarray(valid), jnp.asarray(pseudo),
            jnp.asarray(boxes_img), jnp.asarray(bdry), jnp.asarray(l2i),
            jnp.asarray(ibp), jnp.asarray(ibp_valid))


def test_targets_and_loss(tiny_setup):
    cfg, model, variables, pts, valid = tiny_setup
    (labels, ovalid, pseudo, boxes_img, bdry, l2i, ibp,
     ibp_valid) = _fake_gga_batch(cfg)
    targets = gga.build_targets(cfg.head, jax.random.PRNGKey(1), labels,
                                ovalid, pseudo, boxes_img, bdry, l2i)
    assert len(targets) == 3
    W, H = cfg.head.feature_map_size
    total_mask = sum(int(t['mask'].sum()) for t in targets)
    assert total_mask == 12  # 2 batches x 6 valid objects
    for t in targets:
        assert t['heatmap'].shape == (2, H, W, 1)
        npos = int((np.asarray(t['heatmap']) == 1.0).sum())
        assert npos == int(t['mask'].sum())  # one peak per valid object

    preds = model.apply(variables, pts, valid, train=False)
    total, logs = gga.loss(cfg.head, preds, targets, ibp, ibp_valid)
    assert np.isfinite(float(total))
    for k, v in logs.items():
        assert np.isfinite(float(v)), k
    # all three loss families present per task
    for t in range(3):
        for key in ('loss_heatmap', 'loss_bbox', 'loss_ratio',
                    'distancemin'):
            assert f'task{t}.{key}' in logs
    # PAL excluded from total by default (reference _parse_losses quirk)
    named = sum(float(logs[f'task{t}.{k}']) for t in range(3)
                for k in ('loss_heatmap', 'loss_bbox', 'loss_ratio'))
    np.testing.assert_allclose(float(total), named, rtol=1e-5)


def test_loss_grad_flows(tiny_setup):
    cfg, model, variables, pts, valid = tiny_setup
    batch = _fake_gga_batch(cfg)
    (labels, ovalid, pseudo, boxes_img, bdry, l2i, ibp, ibp_valid) = batch

    def loss_fn(params):
        preds, _ = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            pts, valid, train=True, mutable=['batch_stats'])
        targets = gga.build_targets(cfg.head, jax.random.PRNGKey(1), labels,
                                    ovalid, pseudo, boxes_img, bdry, l2i)
        total, _ = gga.loss(cfg.head, preds, targets, ibp, ibp_valid)
        return total

    grads = jax.grad(loss_fn)(variables['params'])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    gnorm = float(sum((np.asarray(g) ** 2).sum() for g in flat) ** 0.5)
    assert gnorm > 0


def test_decode_detections(tiny_setup):
    cfg, model, variables, pts, valid = tiny_setup
    preds = model.apply(variables, pts, valid, train=False)
    dets = decode_detections(cfg, preds)
    K = 3 * min(cfg.post_max_size, cfg.max_per_task)
    assert dets['boxes'].shape == (2, K, 7)
    assert dets['scores'].shape == (2, K)
    assert dets['labels'].shape == (2, K)
    assert np.isfinite(np.asarray(dets['boxes'])).all()
    lab = np.asarray(dets['labels'])
    assert lab.min() >= 0 and lab.max() <= 2
