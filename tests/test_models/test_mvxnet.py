"""MVXNet fusion detector + PointFusion/bilinear_sample unit semantics."""
import jax
import jax.numpy as jnp
import numpy as np

from gga_tpu.models.fusion_layers import bilinear_sample, point_sample


def test_bilinear_sample_exact_and_interp():
    feat = jnp.arange(12, dtype=jnp.float32).reshape(3, 4, 1)
    uv = jnp.asarray([[1.0, 1.0],   # exact grid point -> feat[1,1] = 5
                      [1.5, 1.0],   # midpoint of 5 and 6
                      [0.0, 0.0],
                      [3.0, 2.0],   # last pixel
                      [10.0, 0.0]])  # out of bounds -> 0
    valid = jnp.ones(5, bool)
    out = bilinear_sample(feat, uv, valid)
    np.testing.assert_allclose(np.asarray(out[:, 0]),
                               [5.0, 5.5, 0.0, 11.0, 0.0], atol=1e-5)
    # invalid points sample zero even in-bounds
    out2 = bilinear_sample(feat, uv, jnp.zeros(5, bool))
    assert float(jnp.abs(out2).max()) == 0.0


def test_point_sample_behind_camera_is_zero():
    feat = jnp.ones((8, 8, 2))
    l2i = jnp.eye(4)
    pts = jnp.asarray([[4.0, 4.0, 2.0],    # in front (depth=2)
                       [4.0, 4.0, -2.0]])  # behind
    out = point_sample(feat, pts, l2i, (8, 8), jnp.ones(2, bool))
    assert float(out[0, 0]) > 0
    assert float(jnp.abs(out[1]).max()) == 0.0


def test_mvxnet_forward():
    from gga_tpu.models.detectors.mvxnet import MVXNet, MVXNetConfig
    cfg = MVXNetConfig.tiny()
    model = MVXNet(cfg)
    rng = np.random.RandomState(0)
    P = 1024
    pts = np.concatenate([
        rng.uniform(0, 70, (1, P, 1)), rng.uniform(-38, 38, (1, P, 1)),
        rng.uniform(-2.5, 0.5, (1, P, 1)), rng.rand(1, P, 1)],
        -1).astype(np.float32)
    valid = np.ones((1, P), bool)
    img = rng.rand(1, 64, 96, 3).astype(np.float32)
    # KITTI-ish projection: lidar x is depth, u <- -y, v <- -z
    l2i = np.zeros((1, 4, 4), np.float32)
    l2i[:, 0, 1] = -50; l2i[:, 0, 0] = 48   # u_h = -50*y + 48*x
    l2i[:, 1, 2] = -50; l2i[:, 1, 0] = 32   # v_h = -50*z + 32*x
    l2i[:, 2, 0] = 1; l2i[:, 3, 3] = 1      # depth = x

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                           jnp.asarray(valid), jnp.asarray(img),
                           jnp.asarray(l2i), train=False)
    preds = model.apply(variables, jnp.asarray(pts), jnp.asarray(valid),
                        jnp.asarray(img), jnp.asarray(l2i), train=False)
    cls = preds['cls'] if isinstance(preds, dict) else preds[0]
    assert cls.shape[1:3] == (32, 28)
    assert bool(jnp.isfinite(cls).all())
    # image features reach the fused point features (at the detector
    # surface, zeroing the image changes the fusion output; the untrained
    # tiny encoder attenuates the perturbation below f32 resolution by the
    # final head, so assert at the fusion layer)
    def fused(im):
        _, inter = model.apply(
            variables, jnp.asarray(pts), jnp.asarray(valid),
            jnp.asarray(im), jnp.asarray(l2i), train=False,
            capture_intermediates=lambda mdl, name: mdl.name == 'fusion')
        return jax.tree_util.tree_leaves(inter['intermediates'])[0]
    d = float(jnp.abs(fused(img) - fused(np.zeros_like(img))).max())
    assert d > 1e-4
