import jax.numpy as jnp
import numpy as np

from gga_tpu.core.rotated_iou import (rotated_iou_bev, rotated_iou_3d,
                                      rotated_overlap)


def _iou_np(b1, b2):
    return np.asarray(rotated_iou_bev(np.asarray(b1, np.float64),
                                      np.asarray(b2, np.float64), np))


def test_identical_boxes():
    b = np.array([[0.0, 0.0, 2.0, 4.0, 0.3]])
    np.testing.assert_allclose(_iou_np(b, b), [[1.0]], atol=1e-5)


def test_disjoint_boxes():
    b1 = np.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
    b2 = np.array([[10.0, 10.0, 2.0, 2.0, 1.0]])
    np.testing.assert_allclose(_iou_np(b1, b2), [[0.0]], atol=1e-8)


def test_axis_aligned_half_overlap():
    b1 = np.array([[0.0, 0.0, 2.0, 2.0, 0.0]])
    b2 = np.array([[1.0, 0.0, 2.0, 2.0, 0.0]])
    # inter = 1*2 = 2, union = 4 + 4 - 2 = 6
    np.testing.assert_allclose(_iou_np(b1, b2), [[2 / 6]], atol=1e-6)


def test_rotated_45_square():
    # unit squares, one rotated 45 deg about the same center:
    # intersection is a regular octagon with area 8*(sqrt(2)-1)/2 ~ 0.8284
    b1 = np.array([[0.0, 0.0, 1.0, 1.0, 0.0]])
    b2 = np.array([[0.0, 0.0, 1.0, 1.0, np.pi / 4]])
    inter = np.asarray(rotated_overlap(b1, b2, np))[0, 0]
    np.testing.assert_allclose(inter, 2 * (np.sqrt(2) - 1), atol=1e-5)


def test_contained_box():
    b1 = np.array([[0.0, 0.0, 4.0, 4.0, 0.2]])
    b2 = np.array([[0.0, 0.0, 1.0, 1.0, 1.1]])
    inter = np.asarray(rotated_overlap(b1, b2, np))[0, 0]
    np.testing.assert_allclose(inter, 1.0, atol=1e-5)
    iou = _iou_np(b1, b2)[0, 0]
    np.testing.assert_allclose(iou, 1.0 / 16.0, atol=1e-5)


def test_jnp_matches_numpy():
    rng = np.random.RandomState(0)
    b1 = np.concatenate([rng.randn(8, 2) * 2, rng.rand(8, 2) * 3 + 0.5,
                         rng.randn(8, 1)], axis=1)
    b2 = np.concatenate([rng.randn(6, 2) * 2, rng.rand(6, 2) * 3 + 0.5,
                         rng.randn(6, 1)], axis=1)
    iou_np = _iou_np(b1, b2)
    iou_j = np.asarray(rotated_iou_bev(jnp.asarray(b1, jnp.float32),
                                       jnp.asarray(b2, jnp.float32)))
    np.testing.assert_allclose(iou_np, iou_j, atol=2e-3)


def test_iou_3d():
    b1 = np.array([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]])
    b2 = np.array([[0.0, 0.0, 1.0, 2.0, 2.0, 2.0, 0.0]])
    # bev inter 4, z overlap 1 -> inter 4; union 8 + 8 - 4 = 12
    iou = np.asarray(rotated_iou_3d(np.asarray(b1), np.asarray(b2), np))
    np.testing.assert_allclose(iou, [[4 / 12]], atol=1e-5)
