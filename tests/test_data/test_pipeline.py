"""Pipeline + dataset + GT database + pseudo matching integration tests."""
import os
import pickle

import numpy as np
import pytest

from gga_tpu.data.dataset import KittiGGADataset
from gga_tpu.data.kitti import io as kio
from gga_tpu.data.kitti.gga_labels import calculate_gga_labels
from gga_tpu.data.kitti.gt_database import (create_gga_gt_database,
                                            create_reduced_point_clouds)
from gga_tpu.data.kitti.pseudo_labels import pseudo_label_matching
from gga_tpu.data.sampler import GGADataBaseSampler
from gga_tpu.eval.submission import (detections_to_kitti_annos,
                                     write_kitti_submission)

from .fixtures import make_scene, write_kitti_scene


@pytest.fixture(scope='module')
def gga_kitti(tmp_path_factory):
    """Mini KITTI with GGA fields + GT database + info pkl."""
    root = str(tmp_path_factory.mktemp('kitti_gga'))
    rng = np.random.RandomState(0)
    boxes = np.array([
        [12.0, 2.0, -1.7, 3.9, 1.6, 1.55, 0.3],
        [20.0, -4.0, -1.7, 0.8, 0.6, 1.75, -0.2],
        [30.0, 6.0, -1.7, 1.8, 0.6, 1.75, 1.0],
    ])
    names = ['Car', 'Pedestrian', 'Cyclist']
    infos = []
    for idx in range(3):
        pts = make_scene(rng, boxes, names)
        write_kitti_scene(root, idx, pts, boxes, names)
    for idx in range(3):
        info = kio.create_scene_info(root, 'train', idx)
        kio.compute_num_points_in_gt(root, info)
        pts = kio.load_velodyne(
            os.path.join(root, f'training/velodyne/{idx:06d}.bin'))
        calculate_gga_labels(pts, info, rng=np.random.RandomState(idx))
        infos.append(info)
    create_reduced_point_clouds(root, infos)
    create_gga_gt_database(root, infos)
    info_path = os.path.join(root, 'kitti_infos_train_GGA.pkl')
    with open(info_path, 'wb') as f:
        pickle.dump(infos, f)
    return root, info_path, infos, boxes


def test_gt_database(gga_kitti):
    root, info_path, infos, boxes = gga_kitti
    with open(os.path.join(root, 'kitti_dbinfos_train_GGA.pkl'),
              'rb') as f:
        db = pickle.load(f)
    assert set(db) == {'Car', 'Pedestrian', 'Cyclist'}
    car = db['Car'][0]
    assert os.path.exists(os.path.join(root, car['path']))
    pts = np.fromfile(os.path.join(root, car['path']),
                      np.float32).reshape(-1, 4)
    assert pts.shape[0] > 100  # frustum crop has points
    assert car['num_points_in_gt'] > 100
    assert car['GGA_init_pseudo_label'].shape == (7,)


def test_dataset_train_batch(gga_kitti):
    root, info_path, infos, boxes = gga_kitti
    sampler = GGADataBaseSampler(
        os.path.join(root, 'kitti_dbinfos_train_GGA.pkl'), root,
        classes=KittiGGADataset.CLASSES,
        sample_groups=dict(Car=6, Pedestrian=4, Cyclist=4),
        prepare=dict(filter_by_difficulty=[-1],
                     filter_by_min_points=dict(Car=5, Pedestrian=10,
                                               Cyclist=10)))
    ds = KittiGGADataset(root, info_path, db_sampler=sampler,
                         max_points=8000, max_objs=32, max_cluster_pts=128)
    assert len(ds) == 3
    item = ds[0]
    assert item['points'].shape == (8000, 4)
    assert item['labels'].shape == (32,)
    n_obj = int(item['obj_valid'].sum())
    assert n_obj >= 3  # originals (+ possibly sampled)
    assert item['ibp_xy'].shape == (32, 128, 2)
    assert item['ibp_valid'][:n_obj].any(axis=-1).all()
    # batch iterator
    batches = list(ds.epoch_batches(2, seed=1))
    assert len(batches) == 1
    assert batches[0]['points'].shape == (2, 8000, 4)


def test_sampler_collision_avoidance(gga_kitti):
    root, info_path, infos, boxes = gga_kitti
    sampler = GGADataBaseSampler(
        os.path.join(root, 'kitti_dbinfos_train_GGA.pkl'), root,
        classes=KittiGGADataset.CLASSES,
        sample_groups=dict(Car=10))
    pseudo = infos[0]['annos']['GGA_init_pseudo_label'][:3]
    ret = sampler.sample_all(pseudo, np.array([0, 1, 2]),
                             np.ones(3, bool), min_distance=5.0)
    if ret is not None:
        d = np.linalg.norm(
            ret['GGA_init_pseudo_labels'][:, None, :2]
            - pseudo[None, :, :2], axis=-1)
        assert (d.min(axis=-1) >= 5.0).all()


def test_pseudo_label_matching(gga_kitti):
    root, info_path, infos, boxes = gga_kitti
    # build "perfect" detections from the GT
    dets = []
    for info in infos:
        from gga_tpu.core import np_geometry as ng
        calib = info['calib']
        annos = info['annos']
        loc, dims = annos['location'], annos['dimensions']
        rots = annos['rotation_y']
        cam = np.concatenate([loc, dims, rots[..., None]], 1)
        lidar = ng.box_camera_to_lidar(cam, calib['R0_rect'],
                                       calib['Tr_velo_to_cam'])
        dets.append(dict(boxes_3d=lidar, scores_3d=np.ones(len(lidar)),
                         labels_3d=np.array([2, 0, 1])))
    det_annos = detections_to_kitti_annos(
        dets, infos, class_names=('Pedestrian', 'Cyclist', 'Car'))
    assert len(det_annos) == 3
    assert set(det_annos[0]['name']) == {'Car', 'Pedestrian', 'Cyclist'}
    # 2D projections should be close to the GT bbox
    np.testing.assert_allclose(det_annos[0]['bbox'][0],
                               infos[0]['annos']['bbox'][0], atol=2.0)

    out = os.path.join(root, 'pseudo', 'infos_pseudo.pkl')
    pseudo_infos, _ = pseudo_label_matching(infos, det_annos,
                                            out_path=out)
    assert os.path.exists(out)
    pa = pseudo_infos[0]['annos']
    assert len(pa['name']) == 3
    # geometry replaced by detections, GGA fields carried from matched GT
    assert 'GGA_init_pseudo_label' in pa and 'score' in pa
    # dims canonicalized: l >= w
    assert (pa['dimensions'][:, 0] >= pa['dimensions'][:, 2] - 1e-6).all()


def test_submission_writer(gga_kitti, tmp_path):
    root, info_path, infos, boxes = gga_kitti
    from gga_tpu.core import np_geometry as ng
    annos = infos[0]['annos']
    cam = np.concatenate([annos['location'], annos['dimensions'],
                          annos['rotation_y'][..., None]], 1)
    lidar = ng.box_camera_to_lidar(cam, infos[0]['calib']['R0_rect'],
                                   infos[0]['calib']['Tr_velo_to_cam'])
    dets = [dict(boxes_3d=lidar, scores_3d=np.array([0.9, 0.8, 0.7]),
                 labels_3d=np.array([2, 0, 1]))]
    det_annos = detections_to_kitti_annos(
        dets, infos[:1], class_names=('Pedestrian', 'Cyclist', 'Car'))
    write_kitti_submission(det_annos, infos[:1], str(tmp_path))
    txt = (tmp_path / '000000.txt').read_text().strip().split('\n')
    assert len(txt) == 3
    fields = txt[0].split(' ')
    assert fields[0] == 'Car' and len(fields) == 16


def test_prefetch_loader_deterministic(gga_kitti):
    from gga_tpu.data.dataset import PrefetchLoader
    root, info_path, infos, boxes = gga_kitti
    ds = KittiGGADataset(root, info_path, max_points=4096, max_objs=16,
                         max_cluster_pts=64)
    loader = PrefetchLoader(ds, batch_size=1, num_workers=2, seed=3)
    e1 = list(loader.epoch(0))
    e2 = list(loader.epoch(0))
    assert len(e1) == 3
    # same epoch index -> same order AND same contents (per-item rng)
    for a, b in zip(e1, e2):
        np.testing.assert_allclose(a['points'], b['points'])
        assert a['sample_idx'] == b['sample_idx']
    # worker count does not change the data
    serial = PrefetchLoader(ds, batch_size=1, num_workers=1, seed=3)
    for a, b in zip(e1, serial.epoch(0)):
        np.testing.assert_allclose(a['points'], b['points'])
