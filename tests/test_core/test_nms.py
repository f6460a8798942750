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


def test_fixpoint_suppress_matches_serial_greedy():
    """_greedy_suppress's self-suppression fixpoint must equal the
    textbook serial greedy on random overlap structures, including long
    suppression chains (A kills B, dead B spares C, C kills D, ...)."""
    from gga_tpu.core.nms import _greedy_suppress

    rng = np.random.RandomState(0)
    for trial in range(20):
        n = rng.randint(3, 60)
        iou = rng.rand(n, n).astype(np.float32)
        iou = (iou + iou.T) / 2
        np.fill_diagonal(iou, 1.0)
        scores = rng.rand(n).astype(np.float32)
        scores[rng.rand(n) < 0.2] = -np.inf    # padding rows
        thresh = float(rng.uniform(0.3, 0.7))

        # reference: serial greedy
        order = np.argsort(-scores)
        keep_ref = np.isfinite(scores[order])
        for i in range(n):
            if not keep_ref[i]:
                continue
            for j in range(i + 1, n):
                if iou[order[i], order[j]] > thresh:
                    keep_ref[j] = False
        ref = np.zeros(n, bool)
        ref[order] = keep_ref

        got = np.asarray(_greedy_suppress(
            jnp.asarray(iou), jnp.asarray(scores), thresh))
        np.testing.assert_array_equal(got, ref, err_msg=f'trial {trial}')


def test_fixpoint_suppress_long_chain():
    """Worst-case alternating chain: box i overlaps only box i+1, so
    kept boxes are exactly the even ranks — max suppression depth."""
    from gga_tpu.core.nms import _greedy_suppress

    n = 64
    iou = np.zeros((n, n), np.float32)
    for i in range(n - 1):
        iou[i, i + 1] = iou[i + 1, i] = 0.9
    scores = np.linspace(1.0, 0.5, n).astype(np.float32)
    keep = np.asarray(_greedy_suppress(
        jnp.asarray(iou), jnp.asarray(scores), 0.5))
    assert keep.tolist() == [i % 2 == 0 for i in range(n)]
