"""MonoFlex: orientation coder roundtrip, keypoint-depth geometry,
edge-fusion shape, train step with finite grads, decode."""
import jax
import jax.numpy as jnp
import numpy as np

from gga_tpu.models.dense_heads.monoflex_head import (
    MonoFlexConfig, combine_depths, decode_orientation,
    edge_indices, encode_orientation, keypoints2depth, monoflex_decode,
    monoflex_loss)
from gga_tpu.models.detectors.monoflex import (MonoFlexDetector,
                                               MonoFlexModelConfig)


def _cam2img(f=60.0, cx=64.0, cy=32.0):
    k = np.eye(4, dtype=np.float32)
    k[0, 0] = f; k[1, 1] = f; k[0, 2] = cx; k[1, 2] = cy
    return k


def test_orientation_multibin_roundtrip():
    cfg = MonoFlexConfig()
    yaws = jnp.asarray(np.linspace(-3.0, 3.0, 16))
    enc = encode_orientation(cfg, yaws)
    assert enc.shape == (16, 8)
    # build a fake perfect prediction: logits favor the encoded bins,
    # offsets = (sin, cos) of the residual
    nb = cfg.num_dir_bins
    cls_logits = np.zeros((16, nb, 2), np.float32)
    cls_logits[..., 1] = np.asarray(enc[:, :nb]) * 10 - 5
    offs = np.zeros((16, nb, 2), np.float32)
    res = np.asarray(enc[:, nb:])
    offs[..., 0] = np.sin(res)
    offs[..., 1] = np.cos(res)
    ori = jnp.concatenate([jnp.asarray(cls_logits.reshape(16, -1)),
                           jnp.asarray(offs.reshape(16, -1))], -1)
    locs = jnp.tile(jnp.asarray([[0.0, 1.0, 10.0]]), (16, 1))  # ray 0
    yaw, local = decode_orientation(cfg, ori, locs)
    np.testing.assert_allclose(np.asarray(local), np.asarray(yaws),
                               atol=1e-4)


def test_keypoints2depth_geometry():
    """A box of height h at depth z projects keypoints whose height
    recovers z via f*h/height."""
    cfg = MonoFlexConfig()
    f, z, h3d = 60.0, 20.0, 1.5
    k = _cam2img(f=f)
    # top/bottom center y at feature scale (stride 4)
    y_top = (-h3d / 2) * f / z
    y_bot = (h3d / 2) * f / z
    kpts = np.zeros((1, 10, 2), np.float32)
    kpts[0, :, 1] = y_bot / 4
    kpts[0, (0, 1, 4, 5), 1] = y_top / 4
    kpts[0, 8, 1] = y_top / 4
    kpts[0, 9, 1] = y_bot / 4
    dims = jnp.asarray([[1.6, h3d, 3.9]])
    d = keypoints2depth(cfg, jnp.asarray(kpts), dims, jnp.asarray(k))
    np.testing.assert_allclose(np.asarray(d[0]), [z, z, z], rtol=1e-3)


def test_combine_depths_weighting():
    d = jnp.asarray([[10.0, 20.0]])
    unc = jnp.asarray([[1.0, 1e6]])   # second estimate untrusted
    out = combine_depths(d, unc)
    assert abs(float(out[0]) - 10.0) < 0.01


def test_edge_indices_cover_border():
    idx = edge_indices(8, 12)
    assert idx.shape == (2 * 7 + 2 * 11, 2)
    assert idx[:, 0].min() == 0 and idx[:, 0].max() == 11
    assert idx[:, 1].min() == 0 and idx[:, 1].max() == 7


def _batch(rng, B=2, M=4, img_hw=(64, 128)):
    H, W = img_hw
    k = _cam2img()
    boxes = np.zeros((B, M, 7), np.float32)
    boxes[..., 0] = rng.uniform(-4, 4, (B, M))      # x
    boxes[..., 1] = 1.2                             # y bottom (cam down)
    boxes[..., 2] = rng.uniform(10, 35, (B, M))     # z
    boxes[..., 3:6] = [3.9, 1.5, 1.6]
    boxes[..., 6] = rng.uniform(-np.pi, np.pi, (B, M))
    labels = np.zeros((B, M), np.int32)
    valid = np.ones((B, M), bool)
    grav_y = boxes[..., 1] - boxes[..., 4] / 2
    u = k[0, 0] * boxes[..., 0] / boxes[..., 2] + k[0, 2]
    v = k[1, 1] * grav_y / boxes[..., 2] + k[1, 2]
    centers2d = np.stack([u, v], -1).astype(np.float32)
    depths = boxes[..., 2].copy()
    wpix = k[0, 0] * boxes[..., 3] / boxes[..., 2]
    hpix = k[1, 1] * boxes[..., 4] / boxes[..., 2]
    bb = np.stack([u - wpix / 2, v - hpix / 2,
                   u + wpix / 2, v + hpix / 2], -1).astype(np.float32)
    img = rng.rand(B, H, W, 3).astype(np.float32)
    cam2img = np.tile(k, (B, 1, 1))
    return (jnp.asarray(img), jnp.asarray(boxes), jnp.asarray(labels),
            jnp.asarray(bb), jnp.asarray(centers2d), jnp.asarray(depths),
            jnp.asarray(valid), jnp.asarray(cam2img))


def test_monoflex_train_step_and_decode():
    rng = np.random.RandomState(0)
    img, boxes, labels, bb, c2d, dep, valid, k = _batch(rng)
    cfg = MonoFlexModelConfig.tiny()
    model = MonoFlexDetector(cfg)
    variables = model.init(jax.random.PRNGKey(0), img, train=False)

    def loss_fn(params):
        preds, _ = model.apply(
            {'params': params,
             'batch_stats': variables.get('batch_stats', {})},
            img, train=True, mutable=['batch_stats'])
        return monoflex_loss(cfg.head, preds, boxes, labels, bb, c2d,
                             dep, valid, k, (64, 128))

    (total, logs), grads = jax.jit(
        lambda p: jax.value_and_grad(loss_fn, has_aux=True)(p))(
        variables['params'])
    assert np.isfinite(float(total)), {m: float(v)
                                       for m, v in logs.items()}
    assert all(np.all(np.isfinite(np.asarray(g)))
               for g in jax.tree_util.tree_leaves(grads))
    assert float(logs['loss_cls']) > 0

    preds = model.apply(variables, img, train=False)
    det = jax.jit(lambda p: monoflex_decode(cfg.head, p, k))(preds)
    assert det['boxes'].shape == (2, cfg.head.topk, 7)
    assert np.all(np.asarray(det['boxes'][..., 2]) >= cfg.head.depth_range[0])
