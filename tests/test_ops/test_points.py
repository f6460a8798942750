import jax.numpy as jnp
import numpy as np

from gga_tpu.ops import points as po


def test_fps_spread():
    rng = np.random.RandomState(0)
    pts = rng.randn(256, 3).astype(np.float32)
    idx = np.asarray(po.furthest_point_sample(jnp.asarray(pts),
                                              jnp.ones(256, bool), 16))
    assert len(set(idx.tolist())) == 16  # distinct points
    # FPS picks the two extremes early: max pairwise distance among the
    # first few samples should be close to the global max
    d_all = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
    d_sel = np.linalg.norm(pts[idx][:, None] - pts[idx][None], axis=-1)
    assert d_sel.max() > 0.95 * d_all.max()


def test_fps_respects_validity():
    pts = np.zeros((8, 3), np.float32)
    pts[:4] = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [5, 5, 5]])
    pts[4:] = 100.0  # invalid decoys
    valid = np.array([1, 1, 1, 1, 0, 0, 0, 0], bool)
    idx = np.asarray(po.furthest_point_sample(jnp.asarray(pts),
                                              jnp.asarray(valid), 4))
    assert set(idx.tolist()) <= {0, 1, 2, 3}


def test_knn():
    pts = np.array([[0, 0, 0], [1, 0, 0], [0, 2, 0], [9, 9, 9]],
                   np.float32)
    q = np.array([[0.1, 0, 0]], np.float32)
    idx, d = po.knn(jnp.asarray(q), jnp.asarray(pts), 2)
    assert np.asarray(idx)[0].tolist() == [0, 1]
    np.testing.assert_allclose(np.asarray(d)[0], [0.01, 0.81], atol=1e-5)


def test_ball_query():
    pts = np.array([[0, 0, 0], [0.5, 0, 0], [3, 0, 0], [0.2, 0, 0]],
                   np.float32)
    q = np.array([[0, 0, 0], [10, 10, 10]], np.float32)
    idx, cnt = po.ball_query(jnp.asarray(q), jnp.asarray(pts), 1.0, 3)
    assert np.asarray(cnt).tolist() == [3, 0]
    # first-found order: 0, 1, 3
    assert np.asarray(idx)[0].tolist() == [0, 1, 3]


def test_three_interpolate():
    sup = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    feats = np.eye(3, dtype=np.float32)
    q = np.array([[0, 0, 0]], np.float32)
    d, idx = po.three_nn(jnp.asarray(q), jnp.asarray(sup))
    out = np.asarray(po.three_interpolate(jnp.asarray(feats), idx, d))
    # query sits exactly on support 0 -> weight ~1 for feature 0
    assert out[0, 0] > 0.99


def test_query_and_group():
    pts = np.array([[0, 0, 0], [0.5, 0, 0], [5, 5, 5]], np.float32)
    feats = np.array([[1.0], [2.0], [3.0]], np.float32)
    centers = np.array([[0, 0, 0]], np.float32)
    out, mask = po.query_and_group(jnp.asarray(pts), jnp.asarray(feats),
                                   jnp.asarray(centers), 1.0, 4)
    assert out.shape == (1, 4, 4)  # rel-xyz(3) + feat(1)
    assert np.asarray(mask)[0].tolist() == [True, True, False, False]
    np.testing.assert_allclose(np.asarray(out)[0, 1],
                               [0.5, 0, 0, 2.0], atol=1e-6)
