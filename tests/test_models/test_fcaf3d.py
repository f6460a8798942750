"""FCAF3D indoor detector: sparse ops, forward, targets, loss, decode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gga_tpu.models.dense_heads import fcaf3d_head as fh
from gga_tpu.models.detectors.fcaf3d import (FCAF3DModelConfig,
                                             FCAF3DDetector)
from gga_tpu.ops import sparse as sp


def test_generative_transpose_conv():
    st = sp.SparseTensor(
        features=jnp.asarray([[1.0, 2.0]]),
        coords=jnp.asarray([[1, 2, 3]], jnp.int32),
        valid=jnp.asarray([True]), grid=(4, 4, 4))
    w = jnp.asarray(np.random.RandomState(0).randn(8, 2, 3), jnp.float32)
    out = sp.generative_transpose_conv(st, w)
    assert out.grid == (8, 8, 8)
    v = np.asarray(out.valid)
    assert v.sum() == 8
    oc = np.asarray(out.coords)[v]
    # all 8 children of (1,2,3): coords in {2,3}x{4,5}x{6,7}
    assert set(map(tuple, oc)) == {
        (z, y, x) for z in (2, 3) for y in (4, 5) for x in (6, 7)}
    # each child = in @ W[offset]
    feats = np.asarray(out.features)[v]
    want = np.asarray(jnp.einsum('c,kcd->kd', st.features[0], w))
    got_sorted = feats[np.lexsort(oc.T[::-1])]
    # offsets row-major over (z,y,x) match child coords sorted the same way
    np.testing.assert_allclose(got_sorted, want, atol=1e-5)


def test_sparse_add_union():
    a = sp.SparseTensor(
        features=jnp.asarray([[1.0], [2.0]]),
        coords=jnp.asarray([[0, 0, 0], [0, 0, 1]], jnp.int32),
        valid=jnp.asarray([True, True]), grid=(2, 2, 2))
    b = sp.SparseTensor(
        features=jnp.asarray([[10.0], [20.0]]),
        coords=jnp.asarray([[0, 0, 1], [1, 1, 1]], jnp.int32),
        valid=jnp.asarray([True, True]), grid=(2, 2, 2))
    out = sp.sparse_add(a, b, out_budget=4)
    v = np.asarray(out.valid)
    assert v.sum() == 3
    coords = [tuple(c) for c in np.asarray(out.coords)[v]]
    feats = np.asarray(out.features)[v][:, 0]
    d = dict(zip(coords, feats))
    assert d[(0, 0, 0)] == 1.0
    assert d[(0, 0, 1)] == 12.0  # summed at shared site
    assert d[(1, 1, 1)] == 20.0


def test_sparse_max_pool():
    st = sp.SparseTensor(
        features=jnp.asarray([[1.0], [5.0], [3.0]]),
        coords=jnp.asarray([[0, 0, 0], [0, 0, 1], [2, 2, 2]], jnp.int32),
        valid=jnp.asarray([True, True, True]), grid=(4, 4, 4))
    out = sp.sparse_max_pool(st)
    v = np.asarray(out.valid)
    d = {tuple(c): f for c, f in zip(np.asarray(out.coords)[v],
                                     np.asarray(out.features)[v][:, 0])}
    assert d[(0, 0, 0)] == 5.0  # max of 1 and 5
    assert d[(1, 1, 1)] == 3.0


def test_bbox_pred_to_bbox_roundtrip():
    pts = jnp.asarray([[1.0, 2.0, 0.5]])
    # distances to faces of a box centered at point with dims (2, 4, 1),
    # yaw 0: q = 1 => sin/cos channels 0
    pred = jnp.asarray([[1.0, 1.0, 2.0, 2.0, 0.5, 0.5, 0.0, 0.0]])
    box = np.asarray(fh.bbox_pred_to_bbox(pts, pred))
    np.testing.assert_allclose(box[0, :3], [1, 2, 0.5], atol=1e-5)
    np.testing.assert_allclose(box[0, 5], 1.0, atol=1e-5)
    # dx+dy scale split by q=1: w = scale/2 = 3, l = 3
    np.testing.assert_allclose(box[0, 3:5], [3, 3], atol=1e-5)


@pytest.fixture(scope='module')
def fcaf_setup():
    cfg = FCAF3DModelConfig.tiny()
    model = FCAF3DDetector(cfg)
    rng = np.random.RandomState(0)
    # P kept below the voxel/site budgets: overflow truncates in coordinate
    # order (documented bias), which would push all actives into a corner
    B, P = 2, 512
    bg = np.stack([rng.uniform(-4, 4, (B, P - 200)),
                   rng.uniform(-4, 4, (B, P - 200)),
                   rng.uniform(-2, 2, (B, P - 200))], -1)
    c1 = np.array([1.0, 1.0, 0.0]) + rng.randn(B, 100, 3) * 0.3
    c2 = np.array([-2.0, -2.0, 0.0]) + rng.randn(B, 100, 3) * 0.3
    pts = np.concatenate([bg, c1, c2], 1).astype(np.float32)
    colors = rng.rand(B, P, 3).astype(np.float32)
    valid = np.ones((B, P), bool)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                           jnp.asarray(colors), jnp.asarray(valid),
                           train=False)
    return cfg, model, variables, (jnp.asarray(pts), jnp.asarray(colors),
                                   jnp.asarray(valid))


def _fake_boxes(cfg, B=2):
    M = cfg.head.max_objs
    gt = np.zeros((B, M, 7), np.float32)
    gt[:, 0] = [1.0, 1.0, 0.0, 2.0, 1.5, 1.0, 0.3]
    gt[:, 1] = [-2.0, -2.0, 0.0, 1.0, 1.0, 2.0, -0.5]
    labels = np.full((B, M), -1, np.int32)
    labels[:, :2] = [0, 2]
    valid = np.zeros((B, M), bool)
    valid[:, :2] = True
    return jnp.asarray(gt), jnp.asarray(labels), jnp.asarray(valid)


def test_fcaf3d_forward_and_loss(fcaf_setup):
    cfg, model, variables, inputs = fcaf_setup
    outs = model.apply(variables, *inputs, train=False)
    assert len(outs) == 4
    for o, budget in zip(outs, cfg.head.level_budgets):
        assert o['center'].shape[1] == budget
        assert o['bbox'].shape[-1] == cfg.head.n_reg_outs
        assert o['cls'].shape[-1] == cfg.head.n_classes
        assert np.isfinite(np.asarray(o['bbox'])).all()

    gt, labels, ovalid = _fake_boxes(cfg)
    total, logs = fh.loss(cfg.head, outs, gt, labels, ovalid)
    assert np.isfinite(float(total))
    assert int(logs['num_pos']) > 0
    for k in ('center_loss', 'bbox_loss', 'cls_loss'):
        assert np.isfinite(float(logs[k])), k


def test_fcaf3d_grads(fcaf_setup):
    cfg, model, variables, inputs = fcaf_setup
    gt, labels, ovalid = _fake_boxes(cfg)

    def loss_fn(params):
        outs, _ = model.apply(
            {'params': params, 'batch_stats': variables['batch_stats']},
            *inputs, train=True, mutable=['batch_stats'])
        total, _ = fh.loss(cfg.head, outs, gt, labels, ovalid)
        return total

    grads = jax.grad(loss_fn)(variables['params'])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    gn = float(sum((np.asarray(g) ** 2).sum() for g in flat) ** 0.5)
    assert gn > 0


def test_fcaf3d_decode(fcaf_setup):
    cfg, model, variables, inputs = fcaf_setup
    outs = model.apply(variables, *inputs, train=False)
    dets = fh.decode(cfg.head, outs)
    K = cfg.head.n_classes * cfg.head.max_out
    assert dets['boxes'].shape == (2, K, 7)
    assert np.isfinite(np.asarray(dets['boxes'])).all()
