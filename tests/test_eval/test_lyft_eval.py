"""Lyft kaggle-protocol mAP (3D-IoU thresholds)."""
import numpy as np
import pytest

from gga_tpu.eval.lyft_eval import IOU_THRESHOLDS, lyft_eval


def _gt():
    return [dict(boxes=np.array([[5.0, 2.0, -0.5, 4.0, 1.8, 1.5, 0.3]]),
                 names=np.array(['car']))]


def test_perfect_prediction():
    preds = [dict(boxes=_gt()[0]['boxes'], names=np.array(['car']),
                  scores=np.array([0.9]))]
    m = lyft_eval(_gt(), preds, classes=('car', 'pedestrian'))
    assert m['car_AP'] == pytest.approx(1.0, abs=1e-6)
    assert m['mAP'] == pytest.approx(1.0, abs=1e-6)   # ped has no GT


def test_partial_overlap_passes_low_thresholds_only():
    import jax
    jax.config.update('jax_platforms', 'cpu')
    from gga_tpu.core.rotated_iou import rotated_iou_3d
    boxes = _gt()[0]['boxes'].copy()
    boxes[0, 0] += 0.5
    iou = float(np.asarray(rotated_iou_3d(boxes, _gt()[0]['boxes'],
                                          xp=np))[0, 0])
    assert 0.5 < iou < 0.95     # a genuinely partial overlap
    preds = [dict(boxes=boxes, names=np.array(['car']),
                  scores=np.array([0.9]))]
    m = lyft_eval(_gt(), preds, classes=('car',))
    expect = sum(1 for t in IOU_THRESHOLDS if t <= iou) / len(
        IOU_THRESHOLDS)
    assert m['car_AP'] == pytest.approx(expect, abs=1e-6)


def test_wrong_class_no_credit():
    preds = [dict(boxes=_gt()[0]['boxes'], names=np.array(['bus']),
                  scores=np.array([0.9]))]
    m = lyft_eval(_gt(), preds, classes=('car', 'bus'))
    assert m['car_AP'] == 0.0
