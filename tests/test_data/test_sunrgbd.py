import os
import pickle

import numpy as np
import pytest

from gga_tpu.data.sunrgbd import CLASSES, SunRgbdDataset
from gga_tpu.eval.indoor_eval import indoor_eval, iou_3d_depth


@pytest.fixture(scope='module')
def sunrgbd_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('sunrgbd'))
    os.makedirs(os.path.join(root, 'points'), exist_ok=True)
    rng = np.random.RandomState(0)
    infos = []
    boxes = np.array([
        [1.0, 2.0, 0.4, 2.0, 1.5, 0.8, 0.3],    # bed
        [-1.0, 1.5, 0.3, 0.9, 0.9, 0.6, -0.2],  # table
    ], np.float32)
    for idx in range(2):
        pts = np.concatenate([
            rng.uniform(-3, 3, (1500, 3)) * [1, 1, 0.5],
            boxes[0, :3] + rng.randn(300, 3).astype(np.float32) * 0.3,
            boxes[1, :3] + rng.randn(200, 3).astype(np.float32) * 0.2,
        ]).astype(np.float32)
        xyzrgb = np.concatenate([pts, rng.rand(len(pts), 3)],
                                1).astype(np.float32)
        rel = f'points/{idx:06d}.bin'
        xyzrgb.tofile(os.path.join(root, rel))
        infos.append(dict(
            pts_path=rel,
            annos=dict(gt_num=2, gt_boxes_upright_depth=boxes,
                       class_=None, **{'class': np.array([0, 1])}),
        ))
    info_path = os.path.join(root, 'sunrgbd_infos_train.pkl')
    with open(info_path, 'wb') as f:
        pickle.dump(infos, f)
    return root, info_path, boxes


def test_dataset_item_and_augment(sunrgbd_root):
    root, info_path, boxes = sunrgbd_root
    ds = SunRgbdDataset(root, info_path, num_points=1024, max_objs=8)
    item = ds[0]
    assert item['points'].shape == (1024, 3)
    assert item['colors'].shape == (1024, 3)
    assert item['obj_valid'].sum() == 2
    # augmentation moved boxes but kept plausible scale
    assert 0.5 < item['gt_boxes'][0, 3] < 3.5
    # test mode: boxes untouched
    ds_t = SunRgbdDataset(root, info_path, num_points=1024, max_objs=8,
                          test_mode=True)
    np.testing.assert_allclose(ds_t[0]['gt_boxes'][:2], boxes, atol=1e-5)
    batch = next(ds.epoch_batches(2, shuffle=False))
    assert batch['points'].shape == (2, 1024, 3)


def test_indoor_eval_perfect():
    boxes = np.array([[1.0, 2.0, 0.4, 2.0, 1.5, 0.8, 0.3],
                      [-1.0, 1.5, 0.3, 0.9, 0.9, 0.6, -0.2]])
    gts = [dict(gt_boxes=boxes, labels=np.array([0, 1]))] * 3
    dts = [dict(boxes=boxes, labels=np.array([0, 1]),
                scores=np.array([0.9, 0.8]))] * 3
    res, ret = indoor_eval(gts, dts, classes=list(CLASSES))
    assert ret['mAP_0.25'] == pytest.approx(
        100 * 2 / len(CLASSES), abs=1e-4)  # only 2 of 10 classes present
    assert ret['bed_AP_0.25'] == pytest.approx(100.0, abs=1e-4)
    assert ret['table_AP_0.50'] == pytest.approx(100.0, abs=1e-4)


def test_indoor_eval_misses():
    boxes = np.array([[1.0, 2.0, 0.4, 2.0, 1.5, 0.8, 0.3]])
    gts = [dict(gt_boxes=boxes, labels=np.array([0]))]
    shifted = boxes.copy()
    shifted[0, 0] += 3.0  # far off
    dts = [dict(boxes=shifted, labels=np.array([0]),
                scores=np.array([0.9]))]
    _, ret = indoor_eval(gts, dts, classes=list(CLASSES))
    assert ret['bed_AP_0.25'] == 0.0


def test_iou_3d_depth():
    b = np.array([[0.0, 0, 0, 2, 2, 2, 0.3]])
    np.testing.assert_allclose(iou_3d_depth(b, b), [[1.0]], atol=1e-5)
