"""Mask R-CNN (nuImages family): RoIAlign correctness, delta coder
round-trip, 2D NMS, train losses, and test-mode decode shapes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gga_tpu.core.nms import iou_2d, nms_2d
from gga_tpu.models.detectors.mask_rcnn import (MaskRCNN, MaskRCNNConfig,
                                                delta2d_decode,
                                                delta2d_encode)
from gga_tpu.ops.roi_align import multilevel_roi_align, roi_align


def test_roi_align_constant_map():
    """On a constant map every bin averages to the constant."""
    feat = jnp.full((16, 24, 3), 7.0)
    rois = jnp.asarray([[2.0, 2.0, 14.0, 10.0], [0.0, 0.0, 24.0, 16.0]])
    out = roi_align(feat, rois, 7)
    np.testing.assert_allclose(np.asarray(out), 7.0, atol=1e-5)


def test_roi_align_linear_ramp_exact():
    """Bilinear interpolation reproduces a linear ramp exactly at bin
    centers (the defining property of RoIAlign vs RoIPool)."""
    H, W = 20, 20
    ramp = (jnp.arange(W, dtype=jnp.float32)[None, :]
            + jnp.zeros((H, 1)))[..., None]         # f(x, y) = x
    roi = jnp.asarray([[4.0, 4.0, 12.0, 12.0]])
    out = roi_align(ramp, roi, 4, samples=2, spatial_scale=1.0)
    # bin centers along x at 5, 7, 9, 11 in image coords -> feature
    # coords minus the half-pixel alignment offset
    expect = np.array([5.0, 7.0, 9.0, 11.0]) - 0.5
    np.testing.assert_allclose(np.asarray(out[0, 2, :, 0]), expect,
                               atol=1e-4)


def test_multilevel_routing():
    """Small RoIs read the fine level, large RoIs the coarse level."""
    feats = [jnp.full((32 // s, 32 // s, 1), float(i))
             for i, s in enumerate((1, 2, 4, 8))]
    rois = jnp.asarray([[0.0, 0.0, 2.0, 2.0],       # tiny -> level 0
                        [0.0, 0.0, 32.0, 32.0]])    # full -> level 3
    out = multilevel_roi_align(feats, rois, 2, (1, 2, 4, 8),
                               finest_scale=4.0)
    assert float(out[0].mean()) == 0.0
    assert float(out[1].mean()) == 3.0


def test_delta2d_roundtrip():
    rng = np.random.RandomState(0)
    anchors = rng.uniform(0, 50, (20, 4)).astype(np.float32)
    anchors[:, 2:] = anchors[:, :2] + rng.uniform(4, 30, (20, 2))
    gt = rng.uniform(0, 50, (20, 4)).astype(np.float32)
    gt[:, 2:] = gt[:, :2] + rng.uniform(4, 30, (20, 2))
    stds = (0.1, 0.1, 0.2, 0.2)
    dec = delta2d_decode(delta2d_encode(gt, anchors, stds), anchors, stds)
    np.testing.assert_allclose(np.asarray(dec), gt, atol=1e-3)


def test_nms_2d_suppresses_overlaps():
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30]],
                        jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    idx, keep = nms_2d(boxes, scores, 0.5)
    assert np.asarray(keep).tolist() == [True, False, True]
    assert np.asarray(idx)[:2].tolist() == [0, 2]
    assert float(iou_2d(boxes[:1], boxes[1:2])[0, 0]) > 0.5


@pytest.fixture(scope='module')
def tiny_batch():
    rng = np.random.RandomState(0)
    B, H, W, G = 2, 64, 96, 6
    img = rng.randn(B, H, W, 3).astype(np.float32)
    gt = np.zeros((B, G, 4), np.float32)
    gt[..., 0] = rng.uniform(0, 60, (B, G))
    gt[..., 1] = rng.uniform(0, 40, (B, G))
    gt[..., 2] = gt[..., 0] + rng.uniform(8, 30, (B, G))
    gt[..., 3] = gt[..., 1] + rng.uniform(8, 20, (B, G))
    labels = rng.randint(0, 3, (B, G)).astype(np.int32)
    valid = np.zeros((B, G), bool)
    valid[:, :4] = True
    masks = np.zeros((B, G, H, W), np.float32)
    for b in range(B):
        for g in range(G):
            x1, y1, x2, y2 = gt[b, g].astype(int)
            masks[b, g, y1:y2, x1:x2] = 1.0
    return img, gt, labels, valid, masks


def test_train_losses_finite(tiny_batch):
    img, gt, labels, valid, masks = tiny_batch
    cfg = MaskRCNNConfig.tiny()
    cfg = cfg.__class__(**{**cfg.__dict__, 'num_classes': 3})
    model = MaskRCNN(cfg)
    variables = model.init(
        {'params': jax.random.PRNGKey(0),
         'sampler': jax.random.PRNGKey(1)},
        img, gt, labels, valid, masks, train=True)

    @jax.jit
    def losses(v):
        out, _ = model.apply(
            v, img, gt, labels, valid, masks, train=True,
            rngs={'sampler': jax.random.PRNGKey(2)},
            mutable=['batch_stats'])
        return out

    out = losses(variables)
    for k in ('loss_rpn_cls', 'loss_rpn_bbox', 'loss_cls', 'loss_bbox',
              'loss_mask'):
        v = float(out[k])
        assert np.isfinite(v), (k, v)
    # cls loss near log(C+1) at init (uniform softmax over 4 classes)
    assert 0.2 < float(out['loss_cls']) < 5.0

    # gradients flow to every parameter collection
    def total(v):
        out, _ = model.apply(
            v, img, gt, labels, valid, masks, train=True,
            rngs={'sampler': jax.random.PRNGKey(2)},
            mutable=['batch_stats'])
        return sum(out.values())
    g = jax.grad(lambda p: total({'params': p,
                                  'batch_stats': variables['batch_stats']}))(
        variables['params'])
    norms = [float(jnp.abs(x).sum())
             for x in jax.tree_util.tree_leaves(g)]
    assert np.isfinite(norms).all()
    assert sum(n > 0 for n in norms) > len(norms) // 2


def test_eval_decode_shapes(tiny_batch):
    img, gt, labels, valid, masks = tiny_batch
    cfg = MaskRCNNConfig.tiny()
    cfg = cfg.__class__(**{**cfg.__dict__, 'num_classes': 3})
    model = MaskRCNN(cfg)
    variables = model.init(
        {'params': jax.random.PRNGKey(0),
         'sampler': jax.random.PRNGKey(1)},
        img, gt, labels, valid, masks, train=True)

    @jax.jit
    def infer(v):
        return model.apply(v, img, train=False)

    det = infer(variables)
    B = img.shape[0]
    K = cfg.max_per_img
    m = 2 * cfg.mask_roi_size
    assert det['boxes'].shape == (B, K, 4)
    assert det['scores'].shape == (B, K)
    assert det['labels'].shape == (B, K)
    assert det['masks'].shape == (B, K, m, m)
    assert np.isfinite(np.asarray(det['boxes'])).all()
    s = np.asarray(det['scores'])
    assert ((s >= 0) & (s <= 1)).all()
