"""nuScenes backend: dataset loading (sweep transform, z convention,
padding), devkit-free NDS/mAP protocol."""
import os
import pickle

import numpy as np
import pytest

from gga_tpu.data.nuscenes import NuScenesDataset
from gga_tpu.eval.nuscenes_eval import nuscenes_eval


def _write_fixture(root, n_samples=3):
    os.makedirs(f'{root}/sweeps', exist_ok=True)
    rng = np.random.RandomState(0)
    infos = []
    for i in range(n_samples):
        pts = rng.uniform(-40, 40, (500, 5)).astype(np.float32)
        path = f'{root}/sample_{i}.bin'
        pts.tofile(path)
        # one sweep shifted by a known translation
        sw_pts = rng.uniform(-40, 40, (300, 5)).astype(np.float32)
        sw_path = f'{root}/sweeps/sweep_{i}.bin'
        sw_pts.tofile(sw_path)
        boxes = np.array([[5.0, 2.0, 0.25, 4.0, 1.8, 1.5, 0.3],
                          [-8.0, -3.0, 0.4, 0.6, 0.6, 1.8, 0.0]])
        infos.append(dict(
            token=f'tok{i}', lidar_path=path,
            timestamp=1_000_000 * (i + 1),
            sweeps=[dict(data_path=sw_path,
                         timestamp=1_000_000 * (i + 1) - 50_000,
                         sensor2lidar_rotation=np.eye(3),
                         sensor2lidar_translation=np.array([1., 0., 0.]))],
            gt_boxes=boxes,
            gt_names=np.array(['car', 'pedestrian']),
            gt_velocity=np.array([[1.0, 0.5], [np.nan, np.nan]]),
            num_lidar_pts=np.array([50, 12]),
            valid_flag=np.array([True, True])))
    info_path = f'{root}/nuscenes_infos_val.pkl'
    with open(info_path, 'wb') as f:
        pickle.dump(dict(infos=infos,
                         metadata=dict(version='v1.0-mini')), f)
    return info_path


def test_dataset_sample_shapes_and_conventions(tmp_path):
    info_path = _write_fixture(str(tmp_path))
    ds = NuScenesDataset(str(tmp_path), info_path, max_points=2048,
                         max_objs=8, sweeps_num=10)
    assert len(ds) == 3
    s = ds.get_sample(0)
    assert s['points'].shape == (2048, 5)
    assert s['gt_boxes'].shape == (8, 9)      # velocity channels
    # gravity -> bottom z: 0.25 - 1.5/2 = -0.5
    assert abs(s['gt_boxes'][0, 2] - (-0.5)) < 1e-6
    # NaN velocity zeroed
    np.testing.assert_allclose(s['gt_boxes'][1, 7:9], 0.0)
    assert s['gt_valid'][:2].all() and not s['gt_valid'][2:].any()
    # sweep time-lag channel present (dt = 0.05 s)
    dts = np.unique(np.round(s['points'][s['points_valid']][:, 4], 3))
    assert 0.05 in dts and 0.0 in dts


def test_format_results_submission(tmp_path):
    info_path = _write_fixture(str(tmp_path))
    ds = NuScenesDataset(str(tmp_path), info_path, max_points=512,
                         max_objs=8)
    dets = [dict(boxes_3d=np.array([[5.0, 2.0, -0.5, 4.0, 1.8, 1.5,
                                     0.3, 1.0, 0.5]]),
                 scores_3d=np.array([0.9]),
                 labels_3d=np.array([0]))] * 3
    sub = ds.format_results(dets, out_path=str(tmp_path / 'res.json'))
    assert set(sub['results']) == {'tok0', 'tok1', 'tok2'}
    anno = sub['results']['tok0'][0]
    assert anno['detection_name'] == 'car'
    # size is (w, l, h) in the submission format
    assert anno['size'] == [1.8, 4.0, 1.5]
    assert anno['translation'][2] == 0.25     # back to gravity center
    assert os.path.exists(tmp_path / 'res.json')


def _perfect_preds(gts):
    return [dict(boxes=g['boxes'], names=g['names'],
                 scores=np.linspace(0.9, 0.5, len(g['names'])))
            for g in gts]


def test_nuscenes_eval_perfect_predictions():
    gts = [dict(boxes=np.array([[5.0, 2.0, -0.5, 4.0, 1.8, 1.5, 0.3,
                                 1.0, 0.0],
                                [-8.0, -3.0, -0.5, 0.6, 0.6, 1.8, 0.0,
                                 0.0, 0.0]]),
                names=np.array(['car', 'pedestrian']))
           for _ in range(4)]
    m = nuscenes_eval(gts, _perfect_preds(gts),
                      classes=('car', 'pedestrian'))
    assert m['car_AP_0.5'] == pytest.approx(1.0, abs=1e-6)
    assert m['mAP'] == pytest.approx(1.0, abs=1e-6)
    assert m['mtrans_err'] == pytest.approx(0.0, abs=1e-9)
    assert m['mscale_err'] == pytest.approx(0.0, abs=1e-9)
    assert m['morient_err'] == pytest.approx(0.0, abs=1e-9)
    assert m['mvel_err'] == pytest.approx(0.0, abs=1e-9)
    # NDS: attr_err defaults to 1 (no attrs given) -> (5 + 4) / 10
    assert m['NDS'] == pytest.approx(0.9, abs=1e-6)


def test_nuscenes_eval_distance_thresholds():
    """A 1.5 m center error fails the 0.5/1.0 thresholds, passes 2/4."""
    gts = [dict(boxes=np.array([[0.0, 0.0, 0.0, 4.0, 1.8, 1.5, 0.0]]),
                names=np.array(['car']))]
    preds = [dict(boxes=np.array([[1.5, 0.0, 0.0, 4.0, 1.8, 1.5, 0.0]]),
                  names=np.array(['car']), scores=np.array([0.9]))]
    m = nuscenes_eval(gts, preds, classes=('car',))
    assert m['car_AP_0.5'] == pytest.approx(0.0, abs=1e-6)
    assert m['car_AP_1.0'] == pytest.approx(0.0, abs=1e-6)
    assert m['car_AP_2.0'] > 0.9
    assert m['car_AP_4.0'] > 0.9
    assert m['mtrans_err'] == pytest.approx(1.5, abs=1e-6)


def test_nuscenes_eval_false_positive_hurts():
    gts = [dict(boxes=np.array([[0.0, 0.0, 0.0, 4.0, 1.8, 1.5, 0.0]]),
                names=np.array(['car']))]
    # a high-confidence far-away FP ranked above the TP
    preds = [dict(boxes=np.array([[30.0, 30.0, 0.0, 4.0, 1.8, 1.5, 0.0],
                                  [0.1, 0.0, 0.0, 4.0, 1.8, 1.5, 0.0]]),
                  names=np.array(['car', 'car']),
                  scores=np.array([0.95, 0.6]))]
    m = nuscenes_eval(gts, preds, classes=('car',))
    clean = nuscenes_eval(gts, [dict(
        boxes=preds[0]['boxes'][1:], names=preds[0]['names'][1:],
        scores=preds[0]['scores'][1:])], classes=('car',))
    assert m['car_AP_2.0'] < clean['car_AP_2.0']
