import jax.numpy as jnp
import numpy as np

from gga_tpu.core.nms import aligned_3d_nms, circle_nms, nms_bev


def test_nms_bev_basic():
    boxes = jnp.array([
        [0.0, 0.0, 2.0, 2.0, 0.0],
        [0.1, 0.0, 2.0, 2.0, 0.0],   # heavy overlap with 0
        [10.0, 0.0, 2.0, 2.0, 0.0],  # far away
    ])
    scores = jnp.array([0.9, 0.8, 0.7])
    idx, keep = nms_bev(boxes, scores, thresh=0.5)
    assert np.asarray(keep).tolist() == [True, False, True]
    assert np.asarray(idx)[:2].tolist() == [0, 2]
    assert np.asarray(idx)[2] == -1


def test_nms_bev_score_order():
    # the lower-index box has lower score; suppression must favor score
    boxes = jnp.array([
        [0.0, 0.0, 2.0, 2.0, 0.0],
        [0.1, 0.0, 2.0, 2.0, 0.0],
    ])
    scores = jnp.array([0.5, 0.9])
    _, keep = nms_bev(boxes, scores, thresh=0.3)
    assert np.asarray(keep).tolist() == [False, True]


def test_nms_bev_valid_mask():
    boxes = jnp.zeros((4, 5)).at[:, 2:4].set(1.0)
    scores = jnp.array([0.9, 0.8, 0.7, 0.6])
    valid = jnp.array([False, True, False, False])
    _, keep = nms_bev(boxes, scores, thresh=0.5, valid=valid)
    assert np.asarray(keep).tolist() == [False, True, False, False]


def test_circle_nms():
    centers = jnp.array([[0.0, 0.0], [0.5, 0.0], [5.0, 5.0]])
    scores = jnp.array([0.9, 0.8, 0.7])
    _, keep = circle_nms(centers, scores, min_radius=1.0)
    assert np.asarray(keep).tolist() == [True, False, True]


def test_aligned_3d_nms_class_aware():
    boxes = jnp.array([
        [0.0, 0.0, 0.0, 1.0, 1.0, 1.0],
        [0.0, 0.0, 0.0, 1.0, 1.0, 1.0],
    ])
    scores = jnp.array([0.9, 0.8])
    # different classes -> both kept
    keep = aligned_3d_nms(boxes, scores, jnp.array([0, 1]), 0.5)
    assert np.asarray(keep).tolist() == [True, True]
    # same class -> one suppressed
    keep = aligned_3d_nms(boxes, scores, jnp.array([0, 0]), 0.5)
    assert np.asarray(keep).tolist() == [True, False]
