"""GroupFree3D: target semantics, multi-stage train step with finite
grads, decode."""
import jax
import jax.numpy as jnp
import numpy as np

from gga_tpu.models.dense_heads.groupfree3d_head import (
    GroupFree3DConfig, decode_groupfree3d, groupfree3d_loss,
    groupfree3d_targets_single)
from gga_tpu.models.detectors.groupfree3d import (GroupFree3DNet,
                                                  GroupFree3DNetConfig)


def test_targets_sampling_topk():
    cfg = GroupFree3DConfig(num_classes=2, mean_sizes=((1., 1., 1.),) * 2,
                            seed_points_obj_topk=2)
    gt = jnp.asarray([[0.0, 0.0, -0.5, 2.0, 2.0, 1.0, 0.0]])
    gv = jnp.asarray([True])
    gl = jnp.asarray([1])
    # 4 seeds inside, increasingly far from the center; 1 outside
    seeds = jnp.asarray([[0.0, 0.0, 0.0], [0.2, 0.0, 0.0],
                         [0.5, 0.0, 0.0], [0.8, 0.0, 0.0],
                         [5.0, 0.0, 0.0]])
    sv = jnp.ones(5, bool)
    cand = jnp.asarray([0, 4])
    t = groupfree3d_targets_single(cfg, gt, gl, gv, seeds, sv, cand)
    samp = np.asarray(t['sampling_targets'])
    # only the 2 closest in-box seeds are sampling positives
    assert list(samp) == [True, True, False, False, False]
    obj = np.asarray(t['objectness_targets'])
    assert list(obj) == [True, False]
    np.testing.assert_allclose(np.asarray(t['center_targets'][0]),
                               [0, 0, 0], atol=1e-6)
    assert int(t['mask_targets'][0]) == 1
    # normalized size residual: (2 - 1) / 1 = 1 on x/y, 0 on z
    np.testing.assert_allclose(np.asarray(t['size_res_targets'][0]),
                               [1.0, 1.0, 0.0], atol=1e-6)


def test_groupfree3d_train_step_and_decode():
    rng = np.random.RandomState(0)
    B, P, G = 2, 256, 3
    pts = rng.uniform(-4, 4, (B, P, 3)).astype(np.float32)
    gt = np.zeros((B, G, 7), np.float32)
    gt[..., 0] = rng.uniform(-3, 3, (B, G))
    gt[..., 1] = rng.uniform(-3, 3, (B, G))
    gt[..., 2] = -0.5
    gt[..., 3:6] = 1.2
    for b in range(B):
        for g in range(G):
            pts[b, g * 40:(g + 1) * 40] = (
                gt[b, g, :3] + rng.uniform(-0.5, 0.5, (40, 3))
                + [0, 0, 0.6])
    pts, pv = jnp.asarray(pts), jnp.ones((B, P), bool)
    gt = jnp.asarray(gt)
    gl = jnp.asarray(rng.randint(0, 4, (B, G)), jnp.int32)
    gv = jnp.ones((B, G), bool)

    cfg = GroupFree3DNetConfig.tiny()
    model = GroupFree3DNet(cfg)
    key = jax.random.PRNGKey(0)
    variables = model.init(key, pts, pv, train=False)

    def loss_fn(params):
        preds, _ = model.apply(
            {'params': params,
             'batch_stats': variables['batch_stats']},
            pts, pv, train=True, mutable=['batch_stats'],
            rngs={'dropout': key})
        assert len(preds['stages']) == cfg.head.num_decoder_layers + 1
        return groupfree3d_loss(cfg.head, preds, gt, gl, gv)

    (total, logs), grads = jax.jit(
        lambda p: jax.value_and_grad(loss_fn, has_aux=True)(p))(
        variables['params'])
    assert np.isfinite(float(total)), {k: float(v)
                                       for k, v in logs.items()}
    assert all(np.all(np.isfinite(np.asarray(g)))
               for g in jax.tree_util.tree_leaves(grads))
    assert float(logs['sampling_objectness_loss']) > 0
    assert float(logs['s1.loss']) > 0

    preds = model.apply(variables, pts, pv, train=False)
    det = jax.jit(lambda p: decode_groupfree3d(cfg.head, p))(preds)
    assert det['boxes'].shape == (B, cfg.head.max_out, 7)
    assert bool(jnp.all(det['boxes'][..., 3:6] >= 0.1))
