

def test_pointnet2_samsg_levels_and_masking():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gga_tpu.models.backbones.pointnet2 import PointNet2SAMSG

    m = PointNet2SAMSG(num_points=(128, 32), radii=((0.2, 0.4), (0.4, 0.8)),
                       num_samples=((8, 16), (8, 16)),
                       sa_channels=(((8, 8), (8, 8)), ((16, 16), (16, 16))),
                       aggregation_channels=(16, 32))
    rng = np.random.RandomState(0)
    pts = np.asarray(rng.rand(1, 512, 4), np.float32) * 4
    valid = np.ones((1, 512), bool)
    valid[:, 256:] = False
    pts[0, 256:, :3] = 1e3  # far-away garbage in the padded tail
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(pts), jnp.asarray(valid),
               train=False)
    out = m.apply(v, jnp.asarray(pts), jnp.asarray(valid), train=False)
    assert out['sa_features'][1].shape == (1, 128, 16)
    assert out['sa_features'][2].shape == (1, 32, 32)
    # FPS must never pick padded points: all sampled centers in range
    assert float(jnp.abs(out['sa_xyz'][1]).max()) < 100.0
    assert bool(jnp.isfinite(out['fp_features']).all())
