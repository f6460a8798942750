"""SMOKE mono detector: coder round-trip, loss, decode."""
import jax
import jax.numpy as jnp
import numpy as np

from gga_tpu.models.dense_heads.smoke_head import (SMOKEConfig,
                                                   decode_dimension,
                                                   decode_location,
                                                   decode_orientation)
from gga_tpu.models.detectors.smoke import SMOKEDetector, SMOKEModelConfig


def _cam2img(f=50.0, cx=48.0, cy=32.0):
    k = np.eye(4, dtype=np.float32)
    k[0, 0] = f; k[1, 1] = f; k[0, 2] = cx; k[1, 2] = cy
    return k


def test_decode_location_roundtrip():
    """Project a camera point, decode it back."""
    k = _cam2img()
    loc = np.array([[1.0, 0.5, 20.0]], np.float32)
    uvw = k @ np.concatenate([loc[0], [1.0]])
    uv = uvw[:2] / uvw[2]
    trans = np.eye(3, dtype=np.float32) * 0.25  # image -> feat (stride 4)
    trans[2, 2] = 1.0
    feat_pt = (trans @ np.array([uv[0], uv[1], 1.0]))[:2]
    got = decode_location(jnp.asarray(feat_pt[None]),
                          jnp.zeros((1, 2)), jnp.asarray([20.0]),
                          jnp.linalg.inv(jnp.asarray(k)),
                          jnp.linalg.inv(jnp.asarray(trans)))
    np.testing.assert_allclose(np.asarray(got[0]), loc[0], atol=1e-3)


def test_decode_dimension_and_orientation():
    base = ((0.9, 1.7, 0.7), (1.8, 1.7, 0.6), (3.9, 1.6, 1.5))
    dims = decode_dimension(jnp.asarray([2]), jnp.zeros((1, 3)), base)
    np.testing.assert_allclose(np.asarray(dims[0]), base[2], atol=1e-6)
    # object dead ahead with alpha-vector (sin=0, cos=1) -> yaw = -pi/2
    yaw = decode_orientation(jnp.asarray([[0.0, 1.0]]),
                             jnp.asarray([[0.0, 1.0, 20.0]]))
    np.testing.assert_allclose(float(yaw[0]), -np.pi / 2, atol=1e-3)


def test_smoke_forward_loss_decode():
    cfg = SMOKEModelConfig.tiny()
    model = SMOKEDetector(cfg)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), img, train=False)
    preds = model.apply(variables, img, train=False)
    assert preds['heatmap'].shape == (1, 16, 24, 3)
    assert preds['reg'].shape == (1, 16, 24, 8)

    M = cfg.head.max_objs
    boxes = np.zeros((1, M, 7), np.float32)
    boxes[0, 0] = [1.0, 1.2, 20.0, 3.9, 1.6, 1.5, 0.3]
    labels = np.zeros((1, M), np.int32)
    centers2d = np.zeros((1, M, 2), np.float32)
    k = _cam2img()
    gc = boxes[0, 0, :3].copy(); gc[1] -= boxes[0, 0, 4] / 2
    uvw = k @ np.concatenate([gc, [1.0]])
    centers2d[0, 0] = uvw[:2] / uvw[2]
    ok = np.zeros((1, M), bool); ok[0, 0] = True
    trans = np.eye(3, dtype=np.float32) * 0.25; trans[2, 2] = 1.0

    def loss_fn(params):
        p = model.apply({'params': params, **{kk: v for kk, v in
                                              variables.items()
                                              if kk != 'params'}},
                        img, train=False)
        losses = model.loss(p, jnp.asarray(boxes), jnp.asarray(labels),
                            jnp.asarray(centers2d), jnp.asarray(ok),
                            jnp.asarray(k[None]), jnp.asarray(trans[None]))
        return losses['loss'], losses

    (total, losses), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(variables['params'])
    assert np.isfinite(float(total)) and float(total) > 0
    gn = float(jnp.sqrt(sum(jnp.sum(g ** 2) for g in
                            jax.tree_util.tree_leaves(grads))))
    assert np.isfinite(gn) and gn > 0

    dets = model.decode(preds, jnp.asarray(k[None]),
                        jnp.asarray(trans[None]))
    assert dets['boxes'].shape == (1, cfg.head.topk, 7)
    assert bool(jnp.isfinite(dets['boxes']).all())


def test_smoke_loss_zero_objects():
    cfg = SMOKEModelConfig.tiny()
    model = SMOKEDetector(cfg)
    img = jnp.zeros((1, 64, 96, 3))
    variables = model.init(jax.random.PRNGKey(0), img, train=False)
    preds = model.apply(variables, img, train=False)
    M = cfg.head.max_objs
    k = _cam2img()
    trans = np.eye(3, dtype=np.float32) * 0.25; trans[2, 2] = 1.0
    losses = model.loss(preds, jnp.zeros((1, M, 7)),
                        jnp.zeros((1, M), jnp.int32),
                        jnp.zeros((1, M, 2)), jnp.zeros((1, M), bool),
                        jnp.asarray(k[None]), jnp.asarray(trans[None]))
    assert np.isfinite(float(losses['loss']))


def test_smoke_dla_backbone_forward():
    """Reference-parity backbone path: DLA34 (tiny channels) + DLANeck
    produce the stride-4 map the head consumes."""
    cfg = SMOKEModelConfig.tiny_dla()
    model = SMOKEDetector(cfg)
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, train=False)
    preds = model.apply(variables, img, train=False)
    assert preds['heatmap'].shape[1:3] == (16, 24)  # stride 4
