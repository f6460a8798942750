"""Golden KITTI-eval fixtures ported from the reference test suite
(/root/reference/tests/test_metrics/test_kitti_eval.py:1) so the
evaluator is pinned numerically against the reference's hand-computed
AP expectations, not just behaviorally. The reference skips do_eval /
kitti_eval without CUDA (its rotated IoU is a numba.cuda kernel); the
rebuild's rotated IoU is host numpy, so all three run everywhere.
"""
import numpy as np

from gga_tpu.eval.kitti_eval import do_eval, eval_class, kitti_eval


def _fixture_annos(with_3d=True):
    gt_anno = dict(
        name=np.array(['Pedestrian', 'Cyclist', 'Car', 'Car', 'Car',
                       'DontCare', 'DontCare']),
        truncated=np.array([0., 0., 0., -1., -1., -1., -1.]),
        occluded=np.array([0, 0, 3, -1, -1, -1, -1]),
        alpha=np.array([-1.57, 1.85, -1.65, -10., -10., -10., -10.]),
        bbox=np.array([[674.9179, 165.48549, 693.23694, 193.42134],
                       [676.21954, 165.70988, 691.63745, 193.83748],
                       [389.4093, 182.48041, 421.49072, 202.13422],
                       [232.0577, 186.16724, 301.94623, 217.4024],
                       [758.6537, 172.98509, 816.32434, 212.76743],
                       [532.37, 176.35, 542.68, 185.27],
                       [559.62, 175.83, 575.4, 183.15]]))
    dt_anno = dict(
        name=np.array(['Pedestrian', 'Cyclist', 'Car', 'Car', 'Car']),
        truncated=np.zeros(5),
        occluded=np.zeros(5, int),
        alpha=np.array([1.0744612, 1.2775835, 1.82563, 2.1145396,
                        -1.7676563]),
        bbox=np.array([[674.9179, 165.48549, 693.23694, 193.42134],
                       [676.21954, 165.70988, 691.63745, 193.83748],
                       [389.4093, 182.48041, 421.49072, 202.13422],
                       [232.0577, 186.16724, 301.94623, 217.4024],
                       [758.6537, 172.98509, 816.32434, 212.76743]]),
        score=np.array([0.18151495, 0.57920843, 0.27795696, 0.23100418,
                        0.21541929]))
    if with_3d:
        gt_anno.update(
            dimensions=np.array([[12.34, 2.85, 2.63], [3.69, 1.67, 1.87],
                                 [2.02, 1.86, 0.6], [-1., -1., -1.],
                                 [-1., -1., -1.], [-1., -1., -1.],
                                 [-1., -1., -1.]]),
            location=np.array([[4.700e-01, 1.490e+00, 6.944e+01],
                               [-1.653e+01, 2.390e+00, 5.849e+01],
                               [4.590e+00, 1.320e+00, 4.584e+01],
                               [-1.000e+03, -1.000e+03, -1.000e+03],
                               [-1.000e+03, -1.000e+03, -1.000e+03],
                               [-1.000e+03, -1.000e+03, -1.000e+03],
                               [-1.000e+03, -1.000e+03, -1.000e+03]]),
            rotation_y=np.array([-1.56, 1.57, -1.55, -10., -10., -10.,
                                 -10.]))
        dt_anno.update(
            dimensions=np.array([[1.4441837, 1.7450154, 0.53160036],
                                 [1.6501029, 1.7540325, 0.5162356],
                                 [3.9313498, 1.4899347, 1.5655756],
                                 [4.0111866, 1.5350999, 1.585221],
                                 [3.7337692, 1.5117968, 1.5515774]]),
            location=np.array([[4.6671643, 1.285098, 45.836895],
                               [4.658241, 1.3088846, 45.85148],
                               [-16.598526, 2.298814, 58.618088],
                               [-18.629122, 2.2990575, 39.305355],
                               [7.0964046, 1.5178275, 29.32426]]),
            rotation_y=np.array([1.174933, 1.3778262, 1.550529,
                                 1.6742425, -1.5330327]))
    return gt_anno, dt_anno


MIN_OVERLAPS = np.array([[[0.5, 0.5, 0.7], [0.5, 0.5, 0.7],
                          [0.5, 0.5, 0.7]],
                         [[0.5, 0.5, 0.7], [0.25, 0.25, 0.5],
                          [0.25, 0.25, 0.5]]])


def test_do_eval_golden():
    gt_anno, dt_anno = _fixture_annos()
    (mAP11_bbox, mAP11_bev, mAP11_3d, mAP11_aos, mAP40_bbox, mAP40_bev,
     mAP40_3d, mAP40_aos) = do_eval(
         [gt_anno], [dt_anno], [1, 2, 0], MIN_OVERLAPS,
         eval_types=('bbox', 'bev', '3d', 'aos'))

    e11 = 9.09090909
    expected_mAP11_bbox = np.array(
        [[[0., 0.], [e11, e11], [e11, e11]]] * 3)
    expected_mAP40_bbox = np.zeros((3, 3, 2))
    expected_mAP40_bbox[2, 1:] = 2.5
    expected_mAP11_aos = np.array(
        [[[0., 0.], [0.55020816, 0.55020816], [0.55020816, 0.55020816]],
         [[0., 0.], [8.36633862, 8.36633862], [8.36633862, 8.36633862]],
         [[0., 0.], [8.63476893, 8.63476893], [8.63476893, 8.63476893]]])
    expected_mAP40_aos = np.zeros((3, 3, 2))
    expected_mAP40_aos[2, 1:] = 1.58140643

    np.testing.assert_allclose(mAP11_bbox, expected_mAP11_bbox)
    np.testing.assert_allclose(mAP11_bev, np.zeros((3, 3, 2)))
    np.testing.assert_allclose(mAP11_3d, np.zeros((3, 3, 2)))
    np.testing.assert_allclose(mAP11_aos, expected_mAP11_aos, rtol=1e-6)
    np.testing.assert_allclose(mAP40_bbox, expected_mAP40_bbox)
    np.testing.assert_allclose(mAP40_bev, np.zeros((3, 3, 2)))
    np.testing.assert_allclose(mAP40_3d, np.zeros((3, 3, 2)))
    np.testing.assert_allclose(mAP40_aos, expected_mAP40_aos, rtol=1e-6)


def test_kitti_eval_golden():
    gt_anno, dt_anno = _fixture_annos()
    _, ret_dict = kitti_eval([gt_anno], [dt_anno], [1, 2, 0])
    assert np.isclose(ret_dict['KITTI/Overall_2D_AP11_moderate'],
                      9.090909090909092)
    assert np.isclose(ret_dict['KITTI/Overall_2D_AP11_hard'],
                      9.090909090909092)
    assert np.isclose(ret_dict['KITTI/Overall_2D_AP40_moderate'],
                      0.8333333333333334)
    assert np.isclose(ret_dict['KITTI/Overall_2D_AP40_hard'],
                      0.8333333333333334)


def test_eval_class_golden():
    gt_anno, dt_anno = _fixture_annos(with_3d=False)
    ret_dict = eval_class([gt_anno], [dt_anno], [1, 2, 0], [0, 1, 2],
                          0, MIN_OVERLAPS, compute_aos=True)
    assert np.isclose(np.sum(ret_dict['recall']), 16)
    assert np.isclose(np.sum(ret_dict['precision']), 16)
    assert np.isclose(np.sum(ret_dict['orientation']), 10.252829201850309)
