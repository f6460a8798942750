"""Data-path smoke test against REFERENCE-format info pkls.

Every accuracy number in this repo comes from the synthetic proxy; real
KITTI data is absent from this host. This test pins the one seam a real
run would cross: an info pkl structured EXACTLY as the reference's
converter emits it (tools/data_converter/kitti_converter_gga.py:214-517
— float64 calib, lhw camera dims, DontCare padding rows appended to the
GGA arrays, ragged ``GGA_in_box_points`` python lists) must flow through
KittiGGADataset -> pipeline -> batch formatting, then through the
stage-3 matcher and the stage-4 mono export, without touching real data.
With this green, running on real KITTI is one scp + the README runbook.
"""
import json
import os
import pickle

import numpy as np
import pytest

from .fixtures import P2, RECT, VELO2CAM, make_scene


def _reference_format_info(root, idx, boxes_lidar, names, rng):
    """One scene info in the reference's on-disk format.

    Mirrors get_kitti_image_info (kitti_data_utils.py:166) +
    _calculate_rga output (kitti_converter_gga.py:316-514), including
    the DontCare padding appended AFTER the real objects.
    """
    from gga_tpu.core import np_geometry as ng

    n = len(names)
    pts = make_scene(rng, boxes_lidar, names)
    vdir = os.path.join(root, 'training', 'velodyne_reduced')
    os.makedirs(vdir, exist_ok=True)
    vpath = f'training/velodyne_reduced/{idx:06d}.bin'
    pts.astype(np.float32).tofile(os.path.join(root, vpath))

    boxes_cam = ng.box_lidar_to_camera(boxes_lidar, RECT, VELO2CAM)
    bbox2d = ng.boxes3d_to_image_bbox(boxes_cam, P2, (375, 1242))

    # per-object point clusters: in-box lidar points (ragged list, the
    # reference stores plain python lists of float arrays)
    clusters = []
    for b in boxes_lidar:
        d = np.linalg.norm(pts[:, :2] - b[None, :2], axis=1)
        clusters.append(pts[d < max(b[3], b[4])][:, :3].astype(
            np.float64))

    n_dc = 2  # DontCare rows (reference pads its GGA arrays with zeros)
    annos = {
        'name': np.array(list(names) + ['DontCare'] * n_dc),
        'truncated': np.zeros(n + n_dc),
        'occluded': np.zeros(n + n_dc, np.int64),
        'alpha': np.concatenate([
            -np.arctan2(boxes_cam[:, 0], boxes_cam[:, 2])
            + boxes_cam[:, 6], np.full(n_dc, -10.0)]),
        'bbox': np.concatenate(
            [bbox2d, np.array([[500., 150., 520., 160.]] * n_dc)]),
        # camera (l, h, w) like kitti_data_utils reorders the label hwl
        'dimensions': np.concatenate(
            [boxes_cam[:, 3:6], -np.ones((n_dc, 3))]).astype(np.float64),
        'location': np.concatenate(
            [boxes_cam[:, :3], -1000 * np.ones((n_dc, 3))]),
        'rotation_y': np.concatenate(
            [boxes_cam[:, 6], np.full(n_dc, -10.0)]),
        'score': np.zeros(n + n_dc),
        'index': np.concatenate(
            [np.arange(n, dtype=np.int32), np.full(n_dc, -1, np.int32)]),
        'group_ids': np.arange(n + n_dc, dtype=np.int64),
        'difficulty': np.concatenate(
            [np.zeros(n, np.int32), np.full(n_dc, -1, np.int32)]),
        'num_points_in_gt': np.concatenate(
            [np.full(n, 400, np.int32), np.full(n_dc, -1, np.int32)]),
        # GGA fields (kitti_converter_gga.py:493-514; DontCare rows are
        # zero-padded AFTER the real objects)
        'GGA_boxes_img': np.concatenate(
            [bbox2d.astype(np.float64), -np.zeros((n_dc, 4))]),
        'GGA_mask2d': np.concatenate(
            [np.ones(n, bool), np.zeros(n_dc, bool)]),
        'GGA_mask_depth': np.concatenate(
            [np.ones(n, bool), np.zeros(n_dc, bool)]),
        'GGA_mask_boundary': np.zeros(n + n_dc, bool),
        'GGA_mask_valid': np.concatenate(
            [np.ones(n, bool), np.zeros(n_dc, bool)]),
        'GGA_bdry_masks': np.zeros((n + n_dc, 4), bool),
        'GGA_in_box_points': clusters + [np.zeros((0, 3))] * n_dc,
        'GGA_init_pseudo_label': np.concatenate(
            [boxes_lidar.astype(np.float64), np.zeros((n_dc, 7))]),
        'GGA_num_points_in_box2d': np.concatenate(
            [np.array([len(c) for c in clusters], np.float64),
             np.zeros(n_dc)]),
    }
    calib = {
        'P0': np.asarray(P2, np.float64), 'P1': np.asarray(P2, np.float64),
        'P2': np.asarray(P2, np.float64), 'P3': np.asarray(P2, np.float64),
        'R0_rect': np.asarray(RECT, np.float64),
        'Tr_velo_to_cam': np.asarray(VELO2CAM, np.float64),
        'Tr_imu_to_velo': np.eye(4),
    }
    return {
        'image': {'image_idx': idx,
                  'image_path': f'training/image_2/{idx:06d}.png',
                  'image_shape': np.array([375, 1242], np.int32)},
        'point_cloud': {'num_features': 4,
                        'velodyne_path': f'training/velodyne/{idx:06d}.bin'},
        'calib': calib,
        'annos': annos,
    }


@pytest.fixture(scope='module')
def reference_pkl(tmp_path_factory):
    root = str(tmp_path_factory.mktemp('ref_kitti'))
    rng = np.random.RandomState(3)
    boxes = np.array([
        [14.0, 3.0, -1.7, 3.9, 1.6, 1.55, 0.3],     # car
        [22.0, -5.0, -1.7, 0.8, 0.6, 1.75, -0.2],   # pedestrian
        [30.0, 6.0, -1.7, 1.8, 0.6, 1.75, 1.2],     # cyclist
    ])
    names = ['Car', 'Pedestrian', 'Cyclist']
    infos = [_reference_format_info(root, i, boxes, names, rng)
             for i in range(2)]
    info_path = os.path.join(root, 'kitti_infos_train_GGA.pkl')
    with open(info_path, 'wb') as f:
        pickle.dump(infos, f)
    return root, info_path, boxes, names


def test_dataset_consumes_reference_pkl(reference_pkl):
    from gga_tpu.data.dataset import KittiGGADataset

    root, info_path, boxes, names = reference_pkl
    ds = KittiGGADataset(root, info_path, max_points=8192, max_objs=16,
                         max_cluster_pts=64)
    assert len(ds) == 2
    item = ds[0]
    P, M, Pc = 8192, 16, 64
    assert item['points'].shape == (P, 4)
    assert item['init_pseudo'].shape == (M, 7)
    assert item['ibp_xy'].shape == (M, Pc, 2)
    # DontCare rows were dropped; 3 real objects survive the filters
    assert int(item['obj_valid'].sum()) == 3
    assert np.isfinite(item['points'][item['points_valid']]).all()
    # init pseudo labels came through in lidar frame
    got = np.sort(item['init_pseudo'][item['obj_valid']][:, 0])
    np.testing.assert_allclose(got, np.sort(boxes[:, 0]), atol=1e-4)

    # batch formatting (what the train loop consumes)
    from gga_tpu.data import pipelines as pl
    batch = pl.collate([ds[0], ds[1]])
    assert batch['points'].shape == (2, P, 4)
    assert batch['lidar2img'].shape == (2, M, 4, 4)


def test_dataset_test_mode(reference_pkl):
    from gga_tpu.data.dataset import KittiGGADataset

    root, info_path, _, _ = reference_pkl
    ds = KittiGGADataset(root, info_path, max_points=8192, max_objs=16,
                         max_cluster_pts=64, test_mode=True)
    item = ds[0]
    assert item['points'].shape == (8192, 4)


def test_stage3_matcher_on_reference_pkl(reference_pkl, tmp_path):
    """Stage-3 plumbing: detections -> matched pseudo infos pkl."""
    from gga_tpu.data.kitti.pseudo_labels import pseudo_label_matching

    root, info_path, boxes, names = reference_pkl
    with open(info_path, 'rb') as f:
        infos = pickle.load(f)

    # fake per-scene detections: the GT boxes nudged, KITTI-anno format
    from gga_tpu.core import np_geometry as ng
    cam = ng.box_lidar_to_camera(boxes, RECT, VELO2CAM)
    bbox2d = ng.boxes3d_to_image_bbox(cam, P2, (375, 1242))
    dt = dict(
        name=np.array(names),
        bbox=bbox2d + 1.0,
        dimensions=cam[:, 3:6] * 1.02,
        location=cam[:, :3] + 0.05,
        rotation_y=cam[:, 6] + 0.01,
        alpha=cam[:, 6],
        score=np.array([0.9, 0.8, 0.7]),
    )
    out = str(tmp_path / 'pseudo.pkl')
    pseudo_infos, _ = pseudo_label_matching(
        infos, [dt] * len(infos), out_path=out)
    assert os.path.exists(out)
    a = pseudo_infos[0]['annos']
    assert len(a['name']) == 3
    # geometry came from the detections, GGA fields from the GT info
    np.testing.assert_allclose(a['score'], dt['score'])
    assert 'GGA_init_pseudo_label' in a
    # canonicalization kept l >= w
    assert (a['dimensions'][:, 0] >= a['dimensions'][:, 2] - 1e-6).all()


def test_stage4_mono_export_on_reference_pkl(reference_pkl, tmp_path):
    """Stage-4 plumbing: pseudo infos -> mono3d coco json."""
    from gga_tpu.data.kitti.mono_export import export_mono3d_coco

    root, info_path, _, _ = reference_pkl
    with open(info_path, 'rb') as f:
        infos = pickle.load(f)
    out = str(tmp_path / 'pseudo_mono3d.coco.json')
    export_mono3d_coco(infos, out)
    with open(out) as f:
        coco = json.load(f)
    assert len(coco['images']) == 2
    assert len(coco['annotations']) > 0
    ann = coco['annotations'][0]
    for k in ('bbox', 'bbox_cam3d', 'center2d', 'category_id'):
        assert k in ann
