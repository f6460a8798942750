"""H3DNet: primitive target geometry, surface/line centers, full
two-stage train step with finite grads, decode."""
import jax
import jax.numpy as jnp
import numpy as np

from gga_tpu.models.detectors.h3dnet import (H3DNet, H3DNetConfig,
                                             decode_h3dnet, h3dnet_loss)
from gga_tpu.models.roi_heads.h3d_head import (PrimitiveConfig,
                                               _primitive_targets_single,
                                               box_surface_line_centers)


def test_primitive_targets_z_mode():
    cfg = PrimitiveConfig(mode='z', num_classes=2, dist_thresh=0.2)
    gt = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 2.0, 1.0, 0.0]])  # z 0..1
    pts = jnp.asarray([[0.3, 0.2, 0.95],    # near top face
                       [0.0, 0.0, 0.5],     # mid box -> no primitive
                       [5.0, 5.0, 5.0]])    # far away
    m, off, sem, size = _primitive_targets_single(
        cfg, pts, jnp.ones(3, bool), gt, jnp.asarray([1]),
        jnp.asarray([True]))
    assert list(np.asarray(m)) == [True, False, False]
    # vote goes to the TOP face center (0, 0, 1)
    np.testing.assert_allclose(np.asarray(pts[0] + off[0]),
                               [0.0, 0.0, 1.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(size[0]), [2.0, 2.0],
                               atol=1e-6)
    assert int(sem[0]) == 1


def test_primitive_targets_xy_and_line():
    gt = jnp.asarray([[0.0, 0.0, 0.0, 2.0, 2.0, 1.0, 0.0]])
    xy = PrimitiveConfig(mode='xy', num_classes=2, dist_thresh=0.2)
    pts = jnp.asarray([[0.95, 0.1, 0.5]])   # near +x face
    m, off, _, size = _primitive_targets_single(
        xy, pts, jnp.ones(1, bool), gt, jnp.asarray([0]),
        jnp.asarray([True]))
    assert bool(m[0])
    np.testing.assert_allclose(np.asarray(pts[0] + off[0]),
                               [1.0, 0.0, 0.5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(size[0]), [1.0], atol=1e-6)

    line = PrimitiveConfig(mode='line', num_classes=2, dist_thresh=0.2)
    pts = jnp.asarray([[0.95, 0.9, 0.4]])   # near the (+x, +y) edge
    m, off, _, _ = _primitive_targets_single(
        line, pts, jnp.ones(1, bool), gt, jnp.asarray([0]),
        jnp.asarray([True]))
    assert bool(m[0])
    np.testing.assert_allclose(np.asarray(pts[0] + off[0]),
                               [1.0, 1.0, 0.5], atol=1e-6)


def test_surface_line_centers():
    boxes = jnp.asarray([[1.0, 2.0, 0.0, 2.0, 4.0, 2.0, 0.0]])
    surf, line = box_surface_line_centers(boxes)
    assert surf.shape == (6, 3) and line.shape == (12, 3)
    surf = np.asarray(surf)
    assert [1.0, 2.0, 2.0] in surf.tolist()     # top
    assert [2.0, 2.0, 1.0] in surf.tolist()     # +x face
    line = np.asarray(line)
    assert [2.0, 4.0, 1.0] in line.tolist()     # (+x, +y) vertical edge


def test_h3dnet_train_step_and_decode():
    rng = np.random.RandomState(0)
    B, P, G = 2, 256, 3
    pts = rng.uniform(-4, 4, (B, P, 4)).astype(np.float32)
    gt = np.zeros((B, G, 7), np.float32)
    gt[..., 0] = rng.uniform(-3, 3, (B, G))
    gt[..., 1] = rng.uniform(-3, 3, (B, G))
    gt[..., 2] = -0.5
    gt[..., 3:6] = 1.2
    for b in range(B):
        for g in range(G):
            pts[b, g * 40:(g + 1) * 40, :3] = (
                gt[b, g, :3] + rng.uniform(-0.5, 0.5, (40, 3))
                + [0, 0, 0.6])
    pts, pv = jnp.asarray(pts), jnp.ones((B, P), bool)
    gt = jnp.asarray(gt)
    gl = jnp.asarray(rng.randint(0, 4, (B, G)), jnp.int32)
    gv = jnp.ones((B, G), bool)

    cfg = H3DNetConfig.tiny()
    model = H3DNet(cfg)
    variables = model.init(jax.random.PRNGKey(0), pts, pv, train=False)

    def loss_fn(params):
        out, _ = model.apply(
            {'params': params,
             'batch_stats': variables['batch_stats']},
            pts, pv, train=True, mutable=['batch_stats'])
        return h3dnet_loss(cfg, out, gt, gl, gv)

    (total, logs), grads = jax.jit(
        lambda p: jax.value_and_grad(loss_fn, has_aux=True)(p))(
        variables['params'])
    assert np.isfinite(float(total)), {k: float(v)
                                       for k, v in logs.items()}
    assert all(np.all(np.isfinite(np.asarray(g)))
               for g in jax.tree_util.tree_leaves(grads))
    assert float(logs['flag_loss_z']) > 0
    assert float(logs['loss_refined']) > 0

    out = model.apply(variables, pts, pv, train=False)
    det = jax.jit(lambda o: decode_h3dnet(cfg, o))(out)
    assert det['boxes'].shape[-1] == 7
