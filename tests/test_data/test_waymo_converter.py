"""Waymo converter: frame dict -> KITTI-format tree -> info pkl ->
WaymoDataset sample (the devkit-free path; TFRecord parsing is gated).
"""
import os
import pickle

import numpy as np
import pytest

from gga_tpu.data.waymo_converter import (build_calib, convert_frame,
                                          create_waymo_infos,
                                          laser_label_line)


def _fake_calibs():
    calibs = []
    for i in range(5):
        ext = np.eye(4)
        ext[:3, 3] = [1.5, 0.1 * i, 2.0]  # cam -> vehicle
        calibs.append(dict(extrinsic=ext,
                           intrinsic=[2000.0, 2000.0, 960.0, 640.0]))
    return calibs


def test_build_calib_front_transform():
    text, t_front = build_calib(_fake_calibs())
    assert text.count('\n') == 11  # P0..P4, R0_rect, Tr_velo_to_cam_0..4
    # vehicle origin in front-cam frame: -R_ref @ t (extrinsic is
    # cam->vehicle with identity rotation)
    pt = t_front @ np.array([1.5, 0.0, 2.0, 1.0])
    np.testing.assert_allclose(pt[:3], [0, 0, 0], atol=1e-9)


def test_laser_label_line_geometry():
    _, t_front = build_calib(_fake_calibs())
    obj = dict(type='VEHICLE',
               box=[10.0, 2.0, 1.0, 4.0, 1.8, 1.6, 0.3])
    line = laser_label_line(obj, (5, 6, 7, 8), t_front)
    f = line.split(' ')
    assert f[0] == 'Car'
    # kitti dims h, w, l
    assert [float(f[8]), float(f[9]), float(f[10])] == [1.6, 1.8, 4.0]
    # bottom center (10, 2, 0.2) vehicle -> front cam (identity rot) is
    # (8.5, 2-0=1.9? no: -0.1*0? cam0 offset y=0) -> (8.5, 2, -1.8),
    # then axis swap to ref cam: x=-y, y=-z, z=x
    np.testing.assert_allclose(
        [float(f[11]), float(f[12]), float(f[13])],
        [-2.0, 1.8, 8.5], atol=1e-6)
    assert float(f[14]) == round(-0.3 - np.pi / 2, 2)


@pytest.fixture()
def waymo_tree(tmp_path):
    root = str(tmp_path)
    kroot = os.path.join(root, 'kitti_format')
    rng = np.random.RandomState(0)
    import io

    from PIL import Image
    buf = io.BytesIO()
    Image.new('RGB', (1920, 1280)).save(buf, format='JPEG')
    jpeg = buf.getvalue()
    for i, sample in enumerate(('0000000', '0000001')):
        pts = np.concatenate([
            rng.uniform(-40, 40, (3000, 3)),
            rng.rand(3000, 3)], 1).astype(np.float32)
        # a cluster inside the labelled box
        pts[:200, :3] = np.array([10.0, 2.0, 1.0]) + \
            rng.randn(200, 3).astype(np.float32) * 0.3
        frame = dict(
            points=pts,
            camera_calibs=_fake_calibs(),
            images={0: jpeg},
            pose=np.eye(4) + 0.001 * i,
            timestamp=1000000 + i,
            labels=[
                dict(type='VEHICLE',
                     box=[10.0, 2.0, 1.0, 4.0, 1.8, 1.6, 0.3],
                     num_points=200, camera_id=0, bbox2d=(5, 6, 7, 8)),
                dict(type='SIGN',
                     box=[5.0, 5.0, 1.0, 0.5, 0.5, 1.0, 0.0],
                     num_points=10, camera_id=None, bbox2d=None),
                dict(type='PEDESTRIAN',
                     box=[8.0, -3.0, 0.9, 0.8, 0.8, 1.7, -0.5],
                     num_points=0, camera_id=1, bbox2d=(1, 2, 3, 4)),
            ])
        convert_frame(frame, kroot, sample)
    os.makedirs(os.path.join(kroot, 'ImageSets'))
    with open(os.path.join(kroot, 'ImageSets', 'train.txt'), 'w') as f:
        f.write('0000000\n0000001\n')
    return root, kroot


def test_convert_and_gather_infos(waymo_tree):
    root, kroot = waymo_tree
    paths = create_waymo_infos(root, root, max_sweeps=5)
    with open(paths['train'], 'rb') as f:
        infos = pickle.load(f)
    assert len(infos) == 2
    info = infos[0]
    assert info['point_cloud']['num_features'] == 6
    assert info['calib']['P4'].shape == (4, 4)
    a = info['annos']
    # SIGN filtered (not a selected class), 0-point pedestrian filtered
    np.testing.assert_array_equal(a['name'], ['Car'])
    assert a['camera_id'][0] == 0.0
    assert a['num_points_in_gt'][0] > 150
    # first frame has no prior -> no sweeps; second chains to the first
    assert infos[0]['sweeps'] == []
    assert len(infos[1]['sweeps']) == 1
    assert infos[1]['sweeps'][0]['timestamp'] == 1000000

    from gga_tpu.data.kitti_det import WaymoDataset
    ds = WaymoDataset(kroot, paths['train'], max_points=4096,
                      test_mode=True)
    s = ds.get_sample(0)
    assert s['points'].shape == (4096, 6)
    assert s['gt_valid'].sum() == 1
    box = s['gt_boxes'][0]
    # camera-frame label round-trips back to the vehicle-frame box
    np.testing.assert_allclose(box[:3], [10.0, 2.0, 0.2], atol=0.02)
    np.testing.assert_allclose(box[3:6], [4.0, 1.8, 1.6], atol=1e-5)
