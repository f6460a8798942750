import numpy as np
import pytest

from gga_tpu.eval.kitti_eval import (clean_data, d3_box_overlap,
                                     get_thresholds, image_box_overlap,
                                     kitti_eval)


def _anno(names, bboxes, locs, dims, rots, scores=None, alphas=None,
          occluded=None, truncated=None):
    n = len(names)
    a = dict(
        name=np.array(names),
        truncated=np.array(truncated if truncated is not None
                           else [0.0] * n),
        occluded=np.array(occluded if occluded is not None else [0] * n),
        alpha=np.array(alphas if alphas is not None else [0.5] * n),
        bbox=np.array(bboxes, np.float64).reshape(-1, 4),
        dimensions=np.array(dims, np.float64).reshape(-1, 3),
        location=np.array(locs, np.float64).reshape(-1, 3),
        rotation_y=np.array(rots, np.float64),
    )
    if scores is not None:
        a['score'] = np.array(scores, np.float64)
    return a


def _gt_dt_perfect(n_img=21):
    # 21 images x 2 boxes = 42 GT >= 41 recall sample points, so a perfect
    # detector fills every threshold slot and reaches AP 100 (with fewer GT
    # the reference evaluator also caps AP below 100 by construction).
    gts, dts = [], []
    for i in range(n_img):
        names = ['Car', 'Car']
        bboxes = [[100, 100, 300, 250], [400, 120, 560, 240]]
        locs = [[2.0, 1.5, 10.0], [-3.0, 1.5, 15.0]]
        dims = [[3.9, 1.6, 1.55], [4.2, 1.7, 1.6]]
        rots = [0.2, -0.4]
        gts.append(_anno(names, bboxes, locs, dims, rots))
        dts.append(_anno(names, bboxes, locs, dims, rots,
                         scores=[0.9 - i * 0.01, 0.8 - i * 0.01]))
    return gts, dts


def test_perfect_detections_ap100():
    gts, dts = _gt_dt_perfect()
    result, ret = kitti_eval(gts, dts, ['Car'])
    for key in ('KITTI/Car_3D_AP11_moderate_strict',
                'KITTI/Car_BEV_AP11_moderate_strict',
                'KITTI/Car_2D_AP11_moderate_strict',
                'KITTI/Car_3D_AP40_moderate_strict'):
        assert ret[key] == pytest.approx(100.0, abs=1e-6), key
    assert 'AP11 Results' in result and 'AP40 Results' in result


def test_missing_detection_lowers_ap():
    gts, dts = _gt_dt_perfect()
    for d in dts:  # drop the second detection everywhere
        for k in d:
            d[k] = d[k][:1]
    _, ret = kitti_eval(gts, dts, ['Car'])
    ap = ret['KITTI/Car_3D_AP11_moderate_strict']
    assert 30 < ap < 60  # recall capped at 0.5


def test_false_positive_lowers_precision():
    gts, dts = _gt_dt_perfect()
    for d in dts:
        for k in d:
            if k == 'name':
                d[k] = np.concatenate([d[k], ['Car']])
            elif k == 'bbox':
                d[k] = np.concatenate([d[k], [[700, 100, 900, 260]]])
            elif k == 'location':
                d[k] = np.concatenate([d[k], [[8.0, 1.5, 30.0]]])
            elif k == 'dimensions':
                d[k] = np.concatenate([d[k], [[4.0, 1.6, 1.6]]])
            elif k == 'score':
                d[k] = np.concatenate([d[k], [0.95]])  # high-scoring FP
            else:
                d[k] = np.concatenate([d[k], [0.0]])
    _, ret = kitti_eval(gts, dts, ['Car'])
    assert ret['KITTI/Car_3D_AP11_moderate_strict'] < 100.0


def test_clean_data_difficulty():
    gt = _anno(['Car', 'Car'], [[0, 0, 50, 30], [0, 0, 100, 60]],
               [[0, 0, 10]] * 2, [[4, 1.6, 1.6]] * 2, [0, 0])
    dt = _anno(['Car'], [[0, 0, 100, 60]], [[0, 0, 10]], [[4, 1.6, 1.6]],
               [0], scores=[0.9])
    # easy (min height 40): first gt (h=30) ignored
    nv, ig, idt, dc = clean_data(gt, dt, 0, 0)
    assert nv == 1 and ig == [1, 0]
    # moderate (min height 25): both valid
    nv, ig, _, _ = clean_data(gt, dt, 0, 1)
    assert nv == 2 and ig == [0, 0]


def test_van_is_neighbor_class():
    gt = _anno(['Van'], [[0, 0, 100, 60]], [[0, 0, 10]], [[4, 1.6, 1.6]],
               [0])
    dt = _anno([], np.zeros((0, 4)), np.zeros((0, 3)), np.zeros((0, 3)),
               [])
    dt['score'] = np.array([])
    nv, ig, _, _ = clean_data(gt, dt, 0, 1)
    assert nv == 0 and ig == [1]  # neighbor class: ignored, not fn


def test_image_box_overlap_matches_manual():
    b = np.array([[0.0, 0, 10, 10]])
    q = np.array([[5.0, 0, 15, 10], [20, 20, 30, 30]])
    ov = image_box_overlap(b, q)
    np.testing.assert_allclose(ov, [[50 / 150, 0.0]], atol=1e-9)


def test_d3_box_overlap_identical():
    b = np.array([[0.0, 1.5, 10.0, 4.0, 1.6, 1.8, 0.3]])
    ov = d3_box_overlap(b, b)
    np.testing.assert_allclose(ov, [[1.0]], atol=1e-4)


def test_get_thresholds_spacing():
    scores = np.linspace(0.9, 0.1, 20)
    th = get_thresholds(scores.copy(), num_gt=20)
    assert len(th) >= 10
    assert (np.diff(th) < 0).all()
