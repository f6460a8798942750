"""TTA merging: transform/map-back roundtrip and multi-variant NMS
(merge_aug_bboxes_3d, /root/reference/mmdet3d/core/post_processing/
merge_augs.py:8)."""
import jax.numpy as jnp
import numpy as np

from gga_tpu.core.merge_augs import (augment_points, boxes_mapping_back,
                                     merge_aug_detections, tta_transforms)


def test_tta_transforms_enumeration():
    ts = tta_transforms(scales=(0.95, 1.05), flip=True)
    assert len(ts) == 4  # 2 scales x (no-flip, h-flip)
    assert ts[0] == dict(scale=0.95, h_flip=False, v_flip=False)
    ts1 = tta_transforms()
    assert ts1 == [dict(scale=1.0, h_flip=False, v_flip=False)]


def test_mapping_back_roundtrip():
    """A box detected in the augmented frame maps back to the original:
    augment gt points -> the augmented-frame gt box -> mapping_back."""
    rng = np.random.RandomState(0)
    box = jnp.asarray([[10.0, -3.0, -1.5, 4.0, 1.6, 1.5, 0.7]])
    for t in tta_transforms(scales=(0.9, 1.1), flip=True,
                            pcd_vertical_flip=True):
        # the gt box in the augmented frame (forward transform)
        b = box.at[:, :6].multiply(t['scale'])
        if t['h_flip']:
            b = b.at[:, 1].multiply(-1).at[:, 6].multiply(-1)
        if t['v_flip']:
            b = b.at[:, 0].multiply(-1)
            b = b.at[:, 6].set(-(b[:, 6] + np.pi))
        back = boxes_mapping_back(b, t)
        np.testing.assert_allclose(np.asarray(back[:, :6]),
                                   np.asarray(box[:, :6]), atol=1e-5)
        # yaw equal modulo 2pi
        d = np.asarray(back[:, 6] - box[:, 6])
        np.testing.assert_allclose(np.abs(((d + np.pi) % (2 * np.pi))
                                          - np.pi), 0, atol=1e-5)


def test_augment_points_matches_box_frame():
    t = dict(scale=1.1, h_flip=True, v_flip=False)
    pts = jnp.asarray([[10.0, -3.0, -1.5, 0.5]])
    out = augment_points(pts, t)
    np.testing.assert_allclose(np.asarray(out[0]),
                               [11.0, 3.3, -1.65, 0.5], atol=1e-5)


def test_merge_dedupes_same_object_across_variants():
    transforms = tta_transforms(scales=(1.0,), flip=True)
    box = jnp.asarray([[10.0, -3.0, -1.5, 4.0, 1.6, 1.5, 0.3]])
    dets = []
    for i, t in enumerate(transforms):
        b = box.at[:, :6].multiply(t['scale'])
        if t['h_flip']:
            b = b.at[:, 1].multiply(-1).at[:, 6].multiply(-1)
        pad = jnp.zeros((3, 7))
        dets.append(dict(
            boxes=jnp.concatenate([b, pad]),
            scores=jnp.asarray([0.9 - 0.1 * i, 0, 0, 0]),
            labels=jnp.zeros(4, jnp.int32),
            valid=jnp.asarray([True, False, False, False])))
    merged = merge_aug_detections(dets, transforms, num_classes=3,
                                  nms_thr=0.2, max_num=8)
    kept = np.asarray(merged['valid'])
    assert kept.sum() == 1          # duplicates suppressed
    np.testing.assert_allclose(np.asarray(merged['boxes'][0]),
                               np.asarray(box[0]), atol=1e-5)
    assert abs(float(merged["scores"][0]) - 0.9) < 1e-6
