"""Supervised KITTI/Waymo datasets: GT conversion, aug determinism,
padding."""
import numpy as np

from gga_tpu.data.kitti_det import KittiDetDataset, WaymoDataset


def _make(tmp_path, point_dim=4):
    import pickle, sys
    sys.path.insert(0, '/root/repo')
    from tests.test_data.fixtures import make_scene, write_kitti_scene
    rng = np.random.RandomState(0)
    boxes = np.array([[15.0, -2.0, -1.73, 4.0, 1.7, 1.5, 0.3]])
    pts = make_scene(rng, boxes, ['Car'], n_ground=2000, n_clutter=100,
                     pts_per_box=200)
    write_kitti_scene(str(tmp_path), 0, pts, boxes, ['Car'])
    from gga_tpu.data.kitti import io as kio
    info = kio.create_scene_info(str(tmp_path), 'train', 0)
    with open(tmp_path / 'infos.pkl', 'wb') as f:
        pickle.dump([info], f)
    return str(tmp_path / 'infos.pkl')


def test_kitti_det_sample(tmp_path):
    info_path = _make(tmp_path)
    ds = KittiDetDataset(str(tmp_path), info_path, max_points=2048,
                         max_objs=8, pts_prefix='velodyne',
                         test_mode=True)
    s = ds.get_sample(0)
    assert s['points'].shape == (2048, 4)
    assert s['gt_valid'].sum() == 1
    box = s['gt_boxes'][0]
    # lidar bottom-center box matches what we wrote
    np.testing.assert_allclose(box[:3], [15.0, -2.0, -1.73], atol=0.05)
    np.testing.assert_allclose(box[3:6], [4.0, 1.7, 1.5], atol=1e-3)
    assert int(s['gt_labels'][0]) == 2     # Car


def test_kitti_det_aug_deterministic(tmp_path):
    info_path = _make(tmp_path)
    ds = KittiDetDataset(str(tmp_path), info_path, max_points=1024,
                         max_objs=8, pts_prefix='velodyne')
    a = ds.get_sample(0)
    b = ds.get_sample(0)
    np.testing.assert_array_equal(a['points'], b['points'])
    ds.epoch = 1
    c = ds.get_sample(0)
    assert not np.allclose(a['gt_boxes'][0], c['gt_boxes'][0])


def test_waymo_class_order_and_dims():
    assert WaymoDataset.CLASSES == ('Car', 'Cyclist', 'Pedestrian')
    assert WaymoDataset.POINT_DIM == 6


def test_object_noise_moves_box_and_points():
    from gga_tpu.data.kitti_det import object_noise
    rng = np.random.RandomState(0)
    boxes = np.array([[10.0, 0.0, -1.5, 4.0, 1.8, 1.5, 0.0]])
    pts = np.concatenate(
        [boxes[0, :3] + np.random.RandomState(1).uniform(
            -0.4, 0.4, (50, 3)) * boxes[0, 3:6] + [0, 0, 0.75],
         np.random.RandomState(2).uniform(30, 40, (20, 3))]).astype(
        np.float32)
    pts4 = np.concatenate([pts, np.zeros((70, 1), np.float32)], -1)
    new_pts, new_boxes = object_noise(pts4, boxes, np.array([2]), rng)
    # box moved, far background points untouched
    assert not np.allclose(new_boxes[0], boxes[0])
    np.testing.assert_array_equal(new_pts[50:], pts4[50:])
    # interior points moved rigidly with the box center
    delta = new_boxes[0, :3] - boxes[0, :3]
    if abs(new_boxes[0, 6] - boxes[0, 6]) < 1e-6:
        np.testing.assert_allclose(new_pts[:50, :3] - pts4[:50, :3],
                                   np.tile(delta, (50, 1)), atol=1e-5)
    # in-box point count preserved (rigid transform)
    from gga_tpu.core import np_geometry as ng
    assert ng.points_in_rbbox(new_pts[:, :3], new_boxes[:1])[:, 0].sum() \
        == ng.points_in_rbbox(pts4[:, :3], boxes[:1])[:, 0].sum()


def test_kitti2d_dataset(tmp_path):
    from gga_tpu.data.kitti_det import Kitti2DDataset
    info_path = _make(tmp_path)
    ds = Kitti2DDataset(str(tmp_path), info_path, max_objs=8)
    assert len(ds) == 1
    item = ds[0]
    assert item['gt_bboxes'].shape == (8, 4)
    assert item['gt_valid'].sum() == 1
    assert int(item['gt_labels'][0]) == 0      # car
    x0, y0, x1, y1 = item['gt_bboxes'][0]
    assert x1 > x0 and y1 > y0                 # a real projected box
    assert item['img_path'].endswith('000000.png')
