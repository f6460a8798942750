import numpy as np
import pytest

from gga_tpu.data.kitti import io as kio
from gga_tpu.data.kitti.gga_labels import (calculate_gga_labels,
                                           min_area_bev_box,
                                           post_process_coords, region_grow)

from .fixtures import (IMG_SHAPE, P2, RECT, VELO2CAM, make_scene,
                       write_kitti_scene)


@pytest.fixture(scope='module')
def mini_kitti(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('kitti'))
    rng = np.random.RandomState(0)
    boxes = np.array([
        [12.0, 2.0, -1.7, 3.9, 1.6, 1.55, 0.3],    # car
        [20.0, -4.0, -1.7, 0.8, 0.6, 1.75, -0.2],  # pedestrian
    ])
    names = ['Car', 'Pedestrian']
    pts = make_scene(rng, boxes, names)
    write_kitti_scene(root, 0, pts, boxes, names)
    write_kitti_scene(root, 1, pts, boxes, names)
    return root, boxes, names


def test_create_scene_info(mini_kitti):
    root, boxes, names = mini_kitti
    info = kio.create_scene_info(root, 'train', 0)
    assert info['image']['image_shape'].tolist() == list(IMG_SHAPE)
    np.testing.assert_allclose(info['calib']['P2'], P2, atol=1e-6)
    np.testing.assert_allclose(info['calib']['Tr_velo_to_cam'], VELO2CAM,
                               atol=1e-6)
    annos = info['annos']
    assert list(annos['name']) == names
    assert 'difficulty' in annos
    # label roundtrip: camera-frame dims survive the lhw convention
    assert annos['dimensions'][0] == pytest.approx([3.9, 1.55, 1.6],
                                                   abs=0.01)


def test_num_points_in_gt(mini_kitti):
    root, boxes, names = mini_kitti
    info = kio.create_scene_info(root, 'train', 0)
    kio.compute_num_points_in_gt(root, info)
    n = info['annos']['num_points_in_gt']
    assert n.shape == (2,)
    assert (n > 200).all()  # 400 points/box minus edge effects


def test_region_grow_separates_clusters():
    rng = np.random.RandomState(1)
    a = rng.randn(80, 3) * 0.2
    b = rng.randn(60, 3) * 0.2 + np.array([10.0, 0, 0])
    pc = np.concatenate([a, b])
    search = np.ones(140)
    origin = np.zeros(140)
    origin[:80] = 1   # seeds only in cluster a
    out = region_grow(pc, search, origin, thresh=0.5, ratio=0.8)
    assert out[:80].sum() > 70 and out[80:].sum() == 0


def test_region_grow_truncation_mode():
    rng = np.random.RandomState(2)
    a = rng.randn(50, 3) * 0.2
    b = rng.randn(50, 3) * 0.2 + np.array([0.6, 0, 0])  # touching cluster
    pc = np.concatenate([a, b])
    origin = np.zeros(100)
    origin[:50] = 1
    out = region_grow(pc, np.ones(100), origin, thresh=0.5, ratio=None)
    # ratio=None grows beyond the origin mask
    assert out.sum() > 60


def test_min_area_bev_box_recovers_rotation():
    rng = np.random.RandomState(3)
    rot_true = 0.4
    local = rng.uniform(-0.5, 0.5, (500, 2)) * np.array([4.0, 1.6])
    c, s = np.cos(rot_true), np.sin(rot_true)
    pts = np.stack([local[:, 0] * c - local[:, 1] * s + 7.0,
                    local[:, 0] * s + local[:, 1] * c - 3.0], 1)
    center, edge, rot = min_area_bev_box(pts)
    np.testing.assert_allclose(center, [7.0, -3.0], atol=0.1)
    np.testing.assert_allclose(edge, [4.0, 1.6], atol=0.15)
    assert abs((rot - rot_true + np.pi / 4) % (np.pi / 2)
               - np.pi / 4) < 0.05


def test_post_process_coords():
    # fully inside
    out = post_process_coords([[10, 10], [50, 10], [50, 40], [10, 40]],
                              (100, 80))
    np.testing.assert_allclose(out, (10, 10, 50, 40))
    # partially outside -> clipped
    out = post_process_coords([[-20, 10], [50, 10], [50, 40], [-20, 40]],
                              (100, 80))
    np.testing.assert_allclose(out, (0, 10, 50, 40))
    # fully outside -> None
    assert post_process_coords([[-50, -50], [-10, -50], [-10, -10],
                                [-50, -10]], (100, 80)) is None


def test_calculate_gga_labels_end_to_end(mini_kitti):
    root, boxes, names = mini_kitti
    info = kio.create_scene_info(root, 'train', 0)
    kio.compute_num_points_in_gt(root, info)
    pts = kio.load_velodyne(
        f'{root}/training/velodyne/000000.bin')
    calculate_gga_labels(pts, info, rng=np.random.RandomState(0))
    annos = info['annos']
    for key in ('GGA_boxes_img', 'GGA_mask_depth', 'GGA_mask2d',
                'GGA_mask_boundary', 'GGA_bdry_masks', 'GGA_mask_valid',
                'GGA_in_box_points', 'GGA_init_pseudo_label',
                'GGA_num_points_in_box2d'):
        assert key in annos, key
    assert annos['GGA_mask_valid'].all()
    assert annos['GGA_mask2d'].all()
    # pseudo boxes approximate the ground truth
    pseudo = annos['GGA_init_pseudo_label']
    for k, gt in enumerate(boxes):
        # center xy within 0.5 m
        assert np.linalg.norm(pseudo[k, :2] - gt[:2]) < 0.5, (k, pseudo[k])
        # BEV dims close to gt (l, w) up to axis swap
        got = sorted(pseudo[k, 3:5])
        want = sorted(gt[3:5])
        np.testing.assert_allclose(got, want, atol=0.4)
        # clusters: plenty of in-box points
        assert annos['GGA_in_box_points'][k].shape[0] > 150
    # 2D boxes match the projected GT
    from .fixtures import lidar_to_cam_box, project_box_to_2d
    cams = lidar_to_cam_box(boxes)
    for k in range(2):
        want2d = project_box_to_2d(cams[k])
        np.testing.assert_allclose(annos['GGA_boxes_img'][k], want2d,
                                   atol=2.0)
