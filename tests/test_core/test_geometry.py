import jax.numpy as jnp
import numpy as np
import pytest

from gga_tpu.core import geometry as g
from gga_tpu.core import np_geometry as ng
from gga_tpu.core.boxes import CameraBoxes3D, LiDARBoxes3D


def test_rotation_ccw():
    # yaw=+90deg about z must map +x to +y (reference CCW convention)
    pts = jnp.array([[[1.0, 0.0, 0.0]]])
    out = g.rotate_points(pts, jnp.array([np.pi / 2]), axis=2)
    np.testing.assert_allclose(np.asarray(out[0, 0]), [0, 1, 0], atol=1e-6)
    # clockwise flag inverts
    out_cw = g.rotate_points(pts, jnp.array([np.pi / 2]), axis=2,
                             clockwise=True)
    np.testing.assert_allclose(np.asarray(out_cw[0, 0]), [0, -1, 0],
                               atol=1e-6)


def test_rotation_2d_matches_3d():
    pts3 = np.random.RandomState(0).randn(4, 6, 3).astype(np.float32)
    ang = np.random.RandomState(1).randn(4).astype(np.float32)
    out3 = np.asarray(g.rotate_points(jnp.asarray(pts3), jnp.asarray(ang)))
    out2 = np.asarray(
        g.rotate_points(jnp.asarray(pts3[..., :2]), jnp.asarray(ang)))
    np.testing.assert_allclose(out3[..., :2], out2, atol=1e-5)
    # numpy impl agrees with jnp impl
    np.testing.assert_allclose(ng.rotate_points(pts3, ang), out3, atol=1e-5)


def test_corners_axis_aligned_lidar():
    boxes = jnp.array([[0.0, 0.0, 0.0, 2.0, 4.0, 1.0, 0.0]])
    corners = np.asarray(g.boxes7_to_corners(boxes))[0]
    assert corners.shape == (8, 3)
    # bottom-center origin: z in {0, 1}
    assert set(np.round(corners[:, 2], 5)) == {0.0, 1.0}
    assert corners[:, 0].min() == -1.0 and corners[:, 0].max() == 1.0
    assert corners[:, 1].min() == -2.0 and corners[:, 1].max() == 2.0
    # reference corner order: corner 0 is (x0, y0, z0)
    np.testing.assert_allclose(corners[0], [-1, -2, 0], atol=1e-6)
    np.testing.assert_allclose(corners[6], [1, 2, 1], atol=1e-6)


def test_corners_np_jnp_agree():
    rng = np.random.RandomState(2)
    boxes = np.concatenate(
        [rng.randn(5, 3), rng.rand(5, 3) + 0.5, rng.randn(5, 1)],
        axis=1).astype(np.float32)
    cj = np.asarray(g.boxes7_to_corners(jnp.asarray(boxes)))
    cn = ng.center_to_corner_box3d(boxes[:, :3], boxes[:, 3:6], boxes[:, 6])
    np.testing.assert_allclose(cj, cn, atol=1e-4)


def test_gravity_center():
    boxes = jnp.array([[1.0, 2.0, 3.0, 1.0, 1.0, 2.0, 0.3]])
    gc = np.asarray(g.gravity_center(boxes))
    np.testing.assert_allclose(gc, [[1, 2, 4]], atol=1e-6)


def test_points_in_rbbox():
    boxes = jnp.array([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, np.pi / 4]])
    pts = jnp.array([
        [0.0, 0.0, 1.0],   # center -> in
        [1.2, 1.2, 1.0],   # on the rotated diagonal, dist ~1.7 > 1 -> out
        [0.0, 1.3, 1.0],   # along rotated y axis corner region -> in
        [0.0, 0.0, 2.5],   # above -> out
    ])
    m = np.asarray(g.points_in_rbbox(pts, boxes))[:, 0]
    assert m.tolist() == [True, False, True, False]
    mn = ng.points_in_rbbox(np.asarray(pts), np.asarray(boxes))
    np.testing.assert_array_equal(m, mn[:, 0])


def test_camera_lidar_roundtrip():
    rng = np.random.RandomState(3)
    rect = np.eye(4)
    Trv2c = np.eye(4)
    # KITTI-like velo->cam: x_cam = -y_velo, y_cam = -z_velo, z_cam = x_velo
    Trv2c[:3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], float)
    cam_boxes = np.concatenate(
        [rng.randn(4, 3), rng.rand(4, 3) + 0.5, rng.randn(4, 1)],
        axis=1)
    lidar = ng.box_camera_to_lidar(cam_boxes, rect, Trv2c)
    cam_back = ng.box_lidar_to_camera(lidar, rect, Trv2c)
    np.testing.assert_allclose(cam_back[:, :6], cam_boxes[:, :6], atol=1e-6)
    d = ng.limit_period(cam_back[:, 6] - cam_boxes[:, 6], 0.5, 2 * np.pi)
    np.testing.assert_allclose(d, 0, atol=1e-6)
    # class wrappers do the same thing
    lb = CameraBoxes3D(cam_boxes).convert_to_lidar(rect, Trv2c)
    np.testing.assert_allclose(lb.tensor, lidar, atol=1e-5)


def test_project_to_image():
    P = np.eye(4)
    P[0, 0] = P[1, 1] = 100.0  # focal
    P[0, 2] = 50.0
    P[1, 2] = 40.0
    pts = jnp.array([[0.0, 0.0, 2.0]])
    pix, depth = g.project_to_image(pts, jnp.asarray(P))
    np.testing.assert_allclose(np.asarray(pix), [[50, 40]], atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth), [2.0], atol=1e-6)


def test_limit_period():
    v = jnp.array([3 * np.pi / 2])
    out = np.asarray(g.limit_period(v, 0.5, np.pi))
    np.testing.assert_allclose(out, [-np.pi / 2], atol=1e-6)


def test_frustum_points():
    # A synthetic pinhole camera looking down +z (camera coords), identity
    # extrinsics: points in front and inside the image box must be kept.
    P2 = np.eye(4)
    P2[0, 0] = P2[1, 1] = 100.0
    P2[0, 2], P2[1, 2] = 64.0, 48.0
    rect = np.eye(4)
    Trv2c = np.eye(4)
    pts = np.array([
        [0.0, 0.0, 10.0],    # center of image
        [0.0, 0.0, -10.0],   # behind camera
        [100.0, 0.0, 10.0],  # far outside image
    ])
    kept = ng.remove_outside_points(pts, rect, Trv2c, P2, (96, 128))
    assert kept.shape[0] == 1
    np.testing.assert_allclose(kept[0], pts[0])


def test_bev_corners_matches_corners3d():
    boxes = jnp.array([[1.0, -2.0, 0.0, 3.0, 1.5, 1.0, 0.7]])
    bev = np.asarray(g.bev_corners(boxes[:, [0, 1, 3, 4, 6]]))[0]
    c3d = np.asarray(g.boxes7_to_corners(boxes))[0]
    # the 4 unique BEV xy coords must match the bottom corners' xy
    got = {tuple(np.round(p, 4)) for p in bev}
    want = {tuple(np.round(p, 4)) for p in c3d[:, :2]}
    assert got == want


def test_lidar_box_flip_rotate():
    b = LiDARBoxes3D(np.array([[1.0, 2.0, 0.0, 4.0, 2.0, 1.5, 0.3]]))
    pts = np.array([[1.0, 2.0, 0.5]], dtype=np.float32)
    b2 = b.copy()
    pts2 = b2.flip('horizontal', pts.copy())
    np.testing.assert_allclose(b2.tensor[0, :3], [1, -2, 0], atol=1e-6)
    np.testing.assert_allclose(b2.tensor[0, 6], -0.3, atol=1e-6)
    np.testing.assert_allclose(pts2[0], [1, -2, 0.5], atol=1e-6)
    b3 = b.copy()
    b3.rotate(np.pi / 2)
    np.testing.assert_allclose(b3.tensor[0, :2], [-2, 1], atol=1e-5)
    np.testing.assert_allclose(b3.tensor[0, 6], 0.3 + np.pi / 2, atol=1e-5)


def test_iou_2d():
    a = np.array([[0.0, 0.0, 10.0, 10.0]])
    b = np.array([[0.0, 0.0, 10.0, 10.0], [20.0, 20.0, 30.0, 30.0]])
    iou = ng.iou_2d(a, b, eps=0.0)
    np.testing.assert_allclose(iou[0], [1.0, 0.0], atol=1e-6)
