"""Mono dataset + COCO export tests."""
import json
import os
import pickle

import numpy as np
import pytest

from gga_tpu.data.kitti import io as kio
from gga_tpu.data.kitti.mono_dataset import IMG_H, IMG_W, KittiMonoDataset
from gga_tpu.data.kitti.mono_export import export_mono3d_coco

from .fixtures import P2, make_scene, write_kitti_scene


@pytest.fixture(scope='module')
def mono_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('kitti_mono'))
    rng = np.random.RandomState(0)
    boxes = np.array([
        [12.0, 2.0, -1.7, 3.9, 1.6, 1.55, 0.3],
        [20.0, -4.0, -1.7, 0.8, 0.6, 1.75, -0.2],
    ])
    names = ['Car', 'Pedestrian']
    infos = []
    for idx in range(2):
        pts = make_scene(rng, boxes, names, n_ground=500, n_clutter=50,
                         pts_per_box=50)
        write_kitti_scene(root, idx, pts, boxes, names)
        infos.append(kio.create_scene_info(root, 'train', idx))
    info_path = os.path.join(root, 'infos.pkl')
    with open(info_path, 'wb') as f:
        pickle.dump(infos, f)
    return root, info_path, infos


def test_mono_dataset_item(mono_root):
    root, info_path, infos = mono_root
    ds = KittiMonoDataset(root, info_path, max_objs=16)
    item = ds[0]
    assert item['image'].shape == (IMG_H, IMG_W, 3)
    assert item['cam2img'].shape == (4, 4)
    n = int(item['obj_valid'].sum())
    assert n == 2
    # depth targets = camera-frame gravity z
    assert (item['depths'][:n] > 5).all()
    # centers2d inside the image
    c = item['centers2d'][:n]
    assert (c[:, 0] > 0).all() and (c[:, 0] < 1242).all()
    # centers2d approximately inside the 2D boxes
    b = item['gt_bboxes'][:n]
    assert ((c[:, 0] > b[:, 0]) & (c[:, 0] < b[:, 2])).all()
    # dims are (l, h, w)
    np.testing.assert_allclose(item['gt_cam3d'][0, 3:6],
                               [3.9, 1.55, 1.6], atol=0.02)
    # batches stack
    batch = next(ds.epoch_batches(2, shuffle=False))
    assert batch['image'].shape == (2, IMG_H, IMG_W, 3)


def test_mono_export_coco(mono_root, tmp_path):
    root, info_path, infos = mono_root
    out = str(tmp_path / 'mono3d.coco.json')
    export_mono3d_coco(infos, out)
    with open(out) as f:
        coco = json.load(f)
    assert len(coco['images']) == 2
    assert len(coco['annotations']) == 4
    ann = coco['annotations'][0]
    for key in ('bbox', 'bbox_cam3d', 'center2d', 'category_id'):
        assert key in ann
    assert len(ann['bbox_cam3d']) == 7
    assert ann['center2d'][2] > 5  # depth
    np.testing.assert_allclose(coco['images'][0]['cam_intrinsic'], P2,
                               atol=1e-6)
