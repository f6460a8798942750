import jax.numpy as jnp
import numpy as np

from gga_tpu.core.points import LiDARPoints
from gga_tpu.models import losses as L


def test_chamfer_distance():
    src = jnp.asarray([[0.0, 0, 0], [1, 0, 0]])
    dst = jnp.asarray([[0.1, 0, 0]])
    ls, ld, is_, id_ = L.chamfer_distance(src, dst, mode='l2')
    np.testing.assert_allclose(np.asarray(ls), [0.01, 0.81], atol=1e-5)
    np.testing.assert_allclose(np.asarray(ld), [0.01], atol=1e-5)
    assert int(id_[0]) == 0


def test_axis_aligned_iou_loss():
    b = jnp.asarray([[0.0, 0, 0, 2, 2, 2]])
    assert float(L.axis_aligned_iou_loss(b, b)[0]) < 1e-6
    b2 = jnp.asarray([[10.0, 10, 10, 12, 12, 12]])
    assert float(L.axis_aligned_iou_loss(b, b2)[0]) == 1.0


def test_rotated_iou_3d_loss():
    b = jnp.asarray([[0.0, 0, 0, 2, 3, 2, 0.4]])
    assert float(L.rotated_iou_3d_loss(b, b)[0]) < 1e-4


def test_uncertain_smooth_l1():
    out = L.uncertain_smooth_l1_loss(jnp.asarray([1.0]), jnp.asarray([3.0]),
                                     jnp.asarray([0.0]), alpha=1.0,
                                     beta=1.0)
    np.testing.assert_allclose(np.asarray(out), [1.5], atol=1e-6)


def test_lidar_points_ops():
    p = LiDARPoints(np.array([[1.0, 2.0, 3.0, 0.5]]))
    p.flip('horizontal')
    np.testing.assert_allclose(p.coord[0], [1, -2, 3], atol=1e-6)
    p.rotate(np.pi / 2)
    np.testing.assert_allclose(p.coord[0], [2, 1, 3], atol=1e-5)
    p.translate([1, 1, 1])
    assert p.in_range_3d([0, 0, 0, 10, 10, 10]).all()
