"""Semantic + instance segmentation metrics."""
import numpy as np
import pytest

from gga_tpu.eval.seg_eval import instance_seg_eval, seg_eval


def test_seg_eval_perfect_and_ignore():
    gt = [np.array([0, 1, 2, 1, 255, 0])]
    pred = [np.array([0, 1, 2, 1, 2, 0])]     # ignored point mispredicted
    m = seg_eval(gt, pred, {0: 'a', 1: 'b', 2: 'c'}, ignore_index=255)
    assert m['miou'] == pytest.approx(1.0)
    assert m['acc'] == pytest.approx(1.0)


def test_seg_eval_partial():
    gt = [np.array([0, 0, 1, 1])]
    pred = [np.array([0, 1, 1, 1])]
    m = seg_eval(gt, pred, {0: 'a', 1: 'b'}, ignore_index=255)
    # class a: inter 1, union 2 -> 0.5 ; class b: inter 2, union 3
    assert m['a'] == pytest.approx(0.5)
    assert m['b'] == pytest.approx(2 / 3)
    assert m['acc'] == pytest.approx(0.75)


def _scene():
    # 12 points: gt instance 0 = class 0 (pts 0-3), inst 1 = class 1
    # (pts 4-7), rest background (class 2 = ignored semantic)
    sem = np.array([0] * 4 + [1] * 4 + [5] * 4)
    inst = np.array([0] * 4 + [1] * 4 + [2] * 4)
    return sem, inst


def test_instance_seg_eval_perfect():
    sem, inst = _scene()
    pred_masks = np.zeros((2, 12), bool)
    pred_masks[0, :4] = True
    pred_masks[1, 4:8] = True
    m = instance_seg_eval(
        [sem], [inst], [pred_masks], [np.array([0, 1])],
        [np.array([0.9, 0.8])], valid_class_ids=(3, 8),
        class_labels=('chair', 'table'), min_region_size=1)
    assert m['all_ap_50%'] == pytest.approx(1.0)
    assert m['all_ap_25%'] == pytest.approx(1.0)
    assert m['chair_AP'] == pytest.approx(1.0)


def test_instance_seg_eval_iou_threshold():
    sem, inst = _scene()
    # prediction covers half of gt instance 0 (IoU 0.5) -> passes 0.25
    # and 0.50 exactly, fails higher thresholds
    pred_masks = np.zeros((1, 12), bool)
    pred_masks[0, :2] = True
    m = instance_seg_eval(
        [sem], [inst], [pred_masks], [np.array([0])],
        [np.array([0.9])], valid_class_ids=(3, 8),
        class_labels=('chair', 'table'), min_region_size=1)
    assert m['chair_AP_0.25'] == pytest.approx(1.0)
    assert m['chair_AP_0.50'] == pytest.approx(1.0)
    assert m['chair_AP'] < 0.2                  # mean over 0.5:0.95
    # table has a GT instance but no predictions -> AP 0
    assert m['table_AP_0.50'] == pytest.approx(0.0)


def test_instance_seg_eval_false_positive_ranking():
    sem, inst = _scene()
    good = np.zeros(12, bool); good[:4] = True
    junk = np.zeros(12, bool); junk[8:] = True
    masks = np.stack([junk, good])
    m = instance_seg_eval(
        [sem], [inst], [masks], [np.array([0, 0])],
        [np.array([0.95, 0.5])], valid_class_ids=(3, 8),
        class_labels=('chair', 'table'), min_region_size=1)
    # high-confidence FP halves the interpolated AP
    assert m['chair_AP_0.50'] == pytest.approx(0.5)
