"""update_data_coords migration math (tools/update_data_coords.py)."""
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), '..', '..', 'tools'))

from update_data_coords import (update_lidar_boxes,  # noqa: E402
                                update_nuscenes_or_lyft_infos,
                                update_sunrgbd_infos)


def test_update_lidar_boxes_swaps_and_flips():
    box = np.array([[1.0, 2.0, 3.0, 3.9, 1.6, 1.5, 0.3]])
    out = update_lidar_boxes(box)
    np.testing.assert_allclose(out[0, 3:6], [1.6, 3.9, 1.5])
    np.testing.assert_allclose(out[0, 6],
                               (-0.3 - np.pi / 2) % (2 * np.pi))
    # involution up to the yaw wrap: applying twice restores dims
    twice = update_lidar_boxes(out)
    np.testing.assert_allclose(twice[0, 3:6], box[0, 3:6])


def test_update_infos_files(tmp_path):
    root = str(tmp_path)
    infos = dict(infos=[dict(gt_boxes=np.array(
        [[0.0, 0, 0, 4.0, 2.0, 1.5, 0.5]]))])
    with open(os.path.join(root, 'nuscenes_infos_val.pkl'), 'wb') as f:
        pickle.dump(infos, f)
    update_nuscenes_or_lyft_infos(root, root, ['nuscenes_infos_val.pkl'])
    with open(os.path.join(root, 'nuscenes_infos_val.pkl'), 'rb') as f:
        out = pickle.load(f)
    np.testing.assert_allclose(out['infos'][0]['gt_boxes'][0, 3:5],
                               [2.0, 4.0])

    sr = [dict(annos=dict(
        rotation_y=np.array([0.4]),
        gt_boxes_upright_depth=np.array([[0, 0, 0, 1, 1, 1, 0.4]],
                                        np.float64)))]
    with open(os.path.join(root, 'sunrgbd_infos_train.pkl'), 'wb') as f:
        pickle.dump(sr, f)
    update_sunrgbd_infos(root, root, ['sunrgbd_infos_train.pkl'])
    with open(os.path.join(root, 'sunrgbd_infos_train.pkl'), 'rb') as f:
        out = pickle.load(f)
    assert out[0]['annos']['rotation_y'][0] == -0.4
    assert out[0]['annos']['gt_boxes_upright_depth'][0, 6] == -0.4
