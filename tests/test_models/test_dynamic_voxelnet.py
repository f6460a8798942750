import jax
import jax.numpy as jnp
import numpy as np

from gga_tpu.models.detectors.dynamic_voxelnet import (DynamicVoxelNet,
                                                       DynamicVoxelNetConfig)


def test_dynamic_voxelnet_forward():
    cfg = DynamicVoxelNetConfig.tiny()
    model = DynamicVoxelNet(cfg)
    rng = np.random.RandomState(0)
    pts = np.concatenate([
        rng.uniform(0, 69, (1, 1024, 1)), rng.uniform(-39, 39, (1, 1024, 1)),
        rng.uniform(-2.5, 0.5, (1, 1024, 1)), rng.rand(1, 1024, 1)],
        -1).astype(np.float32)
    valid = np.ones((1, 1024), bool)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                           jnp.asarray(valid), train=False)
    preds = model.apply(variables, jnp.asarray(pts), jnp.asarray(valid),
                        train=False)
    assert preds['cls'].shape[-1] == 6 * 3
    assert np.isfinite(np.asarray(preds['cls'])).all()
