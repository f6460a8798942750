"""SASSD: forward, aux branch semantics, aux loss gradients."""
import jax
import jax.numpy as jnp
import numpy as np

from gga_tpu.models.detectors.sassd import (SASSD, SASSDConfig,
                                            sassd_aux_loss)


def _points(B=1, P=1500, seed=0):
    rng = np.random.RandomState(seed)
    pts = np.concatenate([
        rng.uniform(0, 70, (B, P, 1)), rng.uniform(-38, 38, (B, P, 1)),
        rng.uniform(-2.5, 0.5, (B, P, 1)), rng.rand(B, P, 1)],
        -1).astype(np.float32)
    valid = np.ones((B, P), bool)
    return jnp.asarray(pts), jnp.asarray(valid)


def test_sassd_forward_and_aux_shapes():
    cfg = SASSDConfig.tiny()
    model = SASSD(cfg)
    pts, valid = _points()
    variables = model.init(jax.random.PRNGKey(0), pts, valid, train=True)
    ((cls_scores, bbox_preds, dir_preds), aux), _ = model.apply(
        variables, pts, valid, train=True, mutable=['batch_stats'])
    pts_xyz, pts_valid, point_cls, point_reg = aux
    V = cfg.max_voxels
    assert pts_xyz.shape == (1, V, 3)
    assert point_cls.shape == (1, V, 1)
    assert point_reg.shape == (1, V, 3)
    # test mode: no aux
    preds = model.apply(variables, pts, valid, train=False)
    assert len(preds) == 3


def test_sassd_aux_loss_targets_and_grads():
    cfg = SASSDConfig.tiny()
    model = SASSD(cfg)
    pts, valid = _points(seed=1)
    # put a cluster of points inside one box
    box = np.array([[20.0, 5.0, -1.6, 4.0, 1.8, 1.6, 0.3]], np.float32)
    inner = box[0, :3] + np.random.RandomState(2).uniform(
        -0.3, 0.3, (200, 3)).astype(np.float32)
    inner[:, 2] = -1.2  # inside z range [z, z+h]
    p = np.array(pts)
    p[0, :200, :3] = inner
    pts = jnp.asarray(p)
    gt = jnp.asarray(np.concatenate(
        [box, np.zeros((7, 7), np.float32)])[None])
    gtv = jnp.asarray(np.arange(8)[None] < 1)

    variables = model.init(jax.random.PRNGKey(0), pts, valid, train=True)

    def loss_fn(params):
        (_, aux), _ = model.apply({'params': params, **{
            k: v for k, v in variables.items() if k != 'params'}},
            pts, valid, train=True, mutable=['batch_stats'])
        losses = sassd_aux_loss(aux, gt, gtv)
        return losses['aux_loss_cls'] + losses['aux_loss_reg'], losses

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables['params'])
    assert np.isfinite(float(total))
    assert float(losses['aux_loss_cls']) > 0
    gnorm = jnp.sqrt(sum(jnp.sum(g ** 2) for g in
                         jax.tree_util.tree_leaves(grads)))
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0
    # the aux branch params must receive gradient
    assert float(jnp.abs(grads['point_fc']['kernel']).max()) > 0


def test_sassd_aux_targets_offsets():
    """Points inside the box regress to the gravity center."""
    from gga_tpu.models.detectors.sassd import sassd_aux_loss  # noqa
    from gga_tpu.core.geometry import points_in_rbbox
    box = jnp.asarray([[10.0, 0.0, -1.8, 4.0, 2.0, 1.6, 0.0]])
    q = jnp.asarray([[10.5, 0.2, -1.2], [50.0, 30.0, -1.0]])
    inside = points_in_rbbox(q, box)
    assert bool(inside[0, 0]) and not bool(inside[1, 0])
