"""Waymo submission path: the kitti->waymo transform must exactly invert
the waymo->kitti converter (round-trip through real files)."""
import io
import os

import numpy as np

from gga_tpu.data.waymo_converter import convert_frame, create_waymo_infos
from gga_tpu.eval.waymo_eval import (create_waymo_submission,
                                     kitti_anno_to_waymo_objects,
                                     t_k2w_from_calib, waymo_official_eval)


def _tree(tmp_path):
    from PIL import Image
    root = str(tmp_path)
    kroot = os.path.join(root, 'kitti_format')
    buf = io.BytesIO()
    Image.new('RGB', (640, 480)).save(buf, format='JPEG')
    ext = np.eye(4)
    ext[:3, :3] = np.array([[0.99875, -0.0499792, 0],
                            [0.0499792, 0.99875, 0], [0, 0, 1]])
    ext[:3, 3] = [1.5, 0.02, 2.1]  # a realistic front-cam mount
    calibs = [dict(extrinsic=ext if i == 0 else np.eye(4),
                   intrinsic=[2000., 2000., 960., 640.])
              for i in range(5)]
    box_vehicle = [12.0, -3.0, 1.1, 4.6, 1.9, 1.7, 0.8]
    frame = dict(
        points=np.zeros((100, 6), np.float32),
        camera_calibs=calibs,
        images={0: buf.getvalue()},
        pose=np.eye(4), timestamp=777,
        labels=[dict(type='VEHICLE', box=box_vehicle, num_points=9,
                     camera_id=0, bbox2d=(1, 2, 3, 4))])
    convert_frame(frame, kroot, '0000000')
    os.makedirs(os.path.join(kroot, 'ImageSets'))
    with open(os.path.join(kroot, 'ImageSets', 'train.txt'), 'w') as f:
        f.write('0000000\n')
    return root, kroot, np.asarray(box_vehicle)


def test_kitti_to_waymo_roundtrip(tmp_path):
    import pickle
    root, kroot, box_vehicle = _tree(tmp_path)
    paths = create_waymo_infos(root, root)
    with open(paths['train'], 'rb') as f:
        infos = pickle.load(f)
    anno = dict(infos[0]['annos'])
    anno['score'] = np.array([0.9])

    t_k2w = t_k2w_from_calib(infos[0]['calib'])
    objs = kitti_anno_to_waymo_objects(anno, t_k2w, timestamp=777)
    assert len(objs) == 1
    got = objs[0]['box']
    # center/dims round-trip through label rounding (2 decimals)
    np.testing.assert_allclose(got[:3], box_vehicle[:3], atol=0.02)
    np.testing.assert_allclose(got[3:6], box_vehicle[3:6], atol=0.01)
    # heading wraps to [-pi, pi]
    dh = (got[6] - box_vehicle[6] + np.pi) % (2 * np.pi) - np.pi
    assert abs(dh) < 0.02
    assert objs[0]['type'] == 1  # TYPE_VEHICLE
    assert objs[0]['frame_timestamp_micros'] == 777

    # submission writer (devkit absent here -> pickle fallback)
    out = os.path.join(root, 'sub', 'pred.bin')
    all_objs = create_waymo_submission([anno], infos, out)
    assert len(all_objs) == 1
    assert os.path.exists(out) or os.path.exists(out + '.pkl')


def test_official_eval_gated():
    import pytest
    with pytest.raises(RuntimeError, match='waymo-open-dataset'):
        waymo_official_eval('p.bin', 'g.bin',
                            binary='definitely_not_installed_xyz')
