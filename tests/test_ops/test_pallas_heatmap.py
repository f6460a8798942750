"""Pallas heatmap kernel vs the jnp renderer (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np

from gga_tpu.core.gaussian import render_heatmap
from gga_tpu.ops.pallas.heatmap import render_heatmap_pallas


def test_pallas_matches_jnp():
    rng = np.random.RandomState(0)
    M, H, W = 32, 48, 176
    centers = np.stack([rng.randint(0, W, M), rng.randint(0, H, M)],
                       -1).astype(np.int32)
    radii = rng.randint(1, 8, M).astype(np.int32)
    valid = rng.rand(M) > 0.3
    want = np.asarray(render_heatmap(jnp.asarray(centers),
                                     jnp.asarray(radii),
                                     jnp.asarray(valid), (H, W)))
    got = np.asarray(render_heatmap_pallas(
        jnp.asarray(centers), jnp.asarray(radii), jnp.asarray(valid),
        (H, W), interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert want.max() == 1.0
