import jax.numpy as jnp
import numpy as np

from gga_tpu.core.gaussian import (clip_sigmoid, gaussian_focal_loss,
                                   gaussian_radius, render_heatmap)


def _radius_ref(height, width, min_overlap):
    """Scalar port of the reference formula (core/utils/gaussian.py:57)."""
    a1 = 1
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 + np.sqrt(b1 ** 2 - 4 * a1 * c1)) / 2
    a2 = 4
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    r2 = (b2 + np.sqrt(b2 ** 2 - 4 * a2 * c2)) / 2
    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    r3 = (b3 + np.sqrt(b3 ** 2 - 4 * a3 * c3)) / 2
    return min(r1, r2, r3)


def test_gaussian_radius_matches_reference():
    for h, w, ov in [(10.0, 4.0, 0.1), (3.0, 3.0, 0.5), (40.0, 16.0, 0.7)]:
        got = float(gaussian_radius((jnp.float32(h), jnp.float32(w)), ov))
        np.testing.assert_allclose(got, _radius_ref(h, w, ov), rtol=1e-5)


def test_render_heatmap_peak_and_window():
    centers = jnp.array([[10, 8]], jnp.int32)
    radii = jnp.array([3], jnp.int32)
    valid = jnp.array([True])
    hm = np.asarray(render_heatmap(centers, radii, valid, (16, 32)))
    assert hm.shape == (16, 32)
    np.testing.assert_allclose(hm[8, 10], 1.0, atol=1e-6)
    # outside the square radius window -> exactly 0
    assert hm[8, 14] == 0.0 and hm[12, 10] == 0.0
    # sigma = (2r+1)/6; value one cell away = exp(-1/(2 sigma^2))
    sigma = 7.0 / 6.0
    np.testing.assert_allclose(hm[8, 11], np.exp(-1 / (2 * sigma ** 2)),
                               rtol=1e-5)


def test_render_heatmap_max_combine_and_mask():
    centers = jnp.array([[5, 5], [6, 5], [20, 5]], jnp.int32)
    radii = jnp.array([2, 2, 2], jnp.int32)
    valid = jnp.array([True, True, False])
    hm = np.asarray(render_heatmap(centers, radii, valid, (16, 32)))
    assert hm[5, 5] == 1.0 and hm[5, 6] == 1.0  # both peaks survive (max)
    assert hm[5, 20] == 0.0  # masked object renders nothing


def test_gaussian_focal_loss_positions():
    pred = jnp.array([[0.9, 0.1]])
    target = jnp.array([[1.0, 0.0]])
    loss = np.asarray(gaussian_focal_loss(pred, target, alpha=0.0))
    np.testing.assert_allclose(loss[0, 0], -np.log(0.9), rtol=1e-5)
    np.testing.assert_allclose(loss[0, 1], -np.log(0.9), rtol=1e-4)


def test_clip_sigmoid_bounds():
    x = jnp.array([-100.0, 0.0, 100.0])
    out = np.asarray(clip_sigmoid(x))
    assert out[0] == 1e-4 and out[2] == 1 - 1e-4


def test_render_heatmap_dyn_matches_static():
    """render_heatmap_dyn (while_loop over live chunks after prefix
    compaction) must be bit-identical to the static-scan render,
    including all-invalid and scattered-validity inputs, and must not
    break reverse-mode differentiation of a loss consuming it."""
    import jax

    from gga_tpu.core.gaussian import render_heatmap, render_heatmap_dyn

    rng = np.random.RandomState(0)
    K, H, W = 96, 40, 36
    for live in (0, 1, 20, 96):
        centers = np.stack([rng.randint(0, W, K),
                            rng.randint(0, H, K)], -1).astype(np.int32)
        radii = rng.randint(1, 7, K).astype(np.int32)
        valid = np.zeros(K, bool)
        pick = rng.choice(K, live, replace=False)
        valid[pick] = True
        a = render_heatmap(jnp.asarray(centers), jnp.asarray(radii),
                           jnp.asarray(valid), (H, W))
        b = render_heatmap_dyn(jnp.asarray(centers), jnp.asarray(radii),
                               jnp.asarray(valid), (H, W))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def loss(x):
        hm = render_heatmap_dyn(jnp.asarray(centers), jnp.asarray(radii),
                                jnp.asarray(valid), (H, W))
        return jnp.sum((x - hm) ** 2)
    g = jax.grad(loss)(jnp.ones((H, W)))
    assert np.isfinite(np.asarray(g)).all()
